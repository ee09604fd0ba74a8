"""Golden-output regression net: a deterministic mini-pipeline through
every subcommand; output bytes (date/CMD-normalized) are hashed and
compared against committed digests. Guards the byte-level format
contract across refactors.

To regenerate after an *intentional* format change:
    python -m tests.test_golden --regen
"""

import hashlib
import json
import os
import sys

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_hashes.json")


def _normalize(data: bytes) -> bytes:
    lines = data.split(b"\n")
    out = [
        ln
        for ln in lines
        if not (
            ln.startswith(b"##date=")
            or ln.startswith(b"##CMD=")
            or ln.startswith(b"##reference=")  # embeds the tmp-dir path
            or ln.startswith(b"##source=")  # embeds __version__
            # the reference's format line embeds the TOOL version too
            # (Configs.KCF_VERSION = getVersion(); KCFHeader.java:293)
            or ln.startswith(b"##format=")
        )
    ]
    return b"\n".join(out)


def _digest(path) -> str:
    with open(path, "rb") as fh:
        return hashlib.sha256(_normalize(fh.read())).hexdigest()[:16]


def _run_pipeline(tmp):
    from kcftools_tpu.cli import main as cli_main

    from .gen import mutate, random_seq, write_fasta

    rng = np.random.default_rng(20260817)
    k = 21
    chr1 = random_seq(rng, 2600, n_prob=0.004)
    chr2 = random_seq(rng, 1900)
    ref = os.path.join(tmp, "ref.fa")
    write_fasta(ref, [("chr1", chr1), ("chr2", chr2)])

    kcfs = []
    for name, snp, dele in [("sA", 0.004, 0.001), ("sB", 0.02, 0.004), ("sC", 0.06, 0.01)]:
        fa = os.path.join(tmp, f"{name}.fa")
        write_fasta(fa, [("chr1", mutate(rng, chr1, snp, dele)),
                         ("chr2", mutate(rng, chr2, snp, dele))])
        db = os.path.join(tmp, f"db_{name}")
        assert cli_main(["count", "-i", fa, "-o", db, "-k", str(k)]) == 0
        kcf = os.path.join(tmp, f"{name}.kcf")
        assert cli_main(["getVariations", "-r", ref, "-k", db, "-o", kcf,
                         "-s", name, "-f", "window", "-w", "400"]) == 0
        kcfs.append(kcf)

    outputs = {f"single_{i}": p for i, p in enumerate(kcfs)}

    cohort = os.path.join(tmp, "cohort.kcf")
    assert cli_main(["cohort", "-o", cohort, "-i", ",".join(kcfs)]) == 0
    outputs["cohort"] = cohort

    ibs = os.path.join(tmp, "ibs.kcf")
    assert cli_main(["findIBS", "-i", cohort, "-o", ibs, "--score", "80",
                     "--min", "2", "--summary", "--bed"]) == 0
    outputs["ibs"] = ibs
    outputs["ibs_summary"] = os.path.join(tmp, "ibs.summary.tsv")
    outputs["ibs_bed_sA"] = os.path.join(tmp, "ibs.sA.bed")

    assert cli_main(["kcf2tsv", "-i", cohort, "-o", os.path.join(tmp, "t")]) == 0
    outputs["tsv_sB"] = os.path.join(tmp, "t.sB.tsv")

    gt = os.path.join(tmp, "gt.tsv")
    assert cli_main(["kcf2gt", "-i", cohort, "-o", gt,
                     "--score_a", "90", "--score_b", "55"]) == 0
    outputs["gt"] = gt
    outputs["gt_contigs"] = gt + ".contigsMap.tsv"

    plink = os.path.join(tmp, "pl")
    assert cli_main(["kcf2plink", "-i", cohort, "-o", plink,
                     "--maf", "0", "--max-missing", "1"]) == 0
    outputs["ped"] = plink + ".ped"
    outputs["map"] = plink + ".map"

    big = os.path.join(tmp, "big.kcf")
    assert cli_main(["increaseWindow", "-i", cohort, "-o", big, "-w", "900"]) == 0
    outputs["increase"] = big

    rec = os.path.join(tmp, "recalc.kcf")
    assert cli_main(["scoreRecalc", "-i", cohort, "-o", rec,
                     "--wi", "0.25", "--wt", "0.25", "--wr", "0.5"]) == 0
    outputs["recalc"] = rec

    attr = os.path.join(tmp, "attr")
    assert cli_main(["getAttributes", "-i", cohort, "-o", attr]) == 0
    for a in ("obs", "var", "kd", "score", "totalkmers", "winlen", "inDist", "tailDist"):
        outputs[f"attr_{a}"] = f"{attr}.{a}.tsv"

    split = os.path.join(tmp, "split")
    assert cli_main(["splitKCF", "-k", cohort, "-o", split]) == 0
    outputs["split_chr1"] = os.path.join(split, "chr1.kcf")
    outputs["split_chr2"] = os.path.join(split, "chr2.kcf")

    mx = os.path.join(tmp, "mx")
    assert cli_main(["kcf2matrix", "-i", cohort, "-o", mx,
                     "--maf", "0", "--max-missing", "1"]) == 0
    outputs["matrix"] = mx + ".matrix.tsv"
    outputs["matrix_map"] = mx + ".map.tsv"

    return {name: _digest(path) for name, path in sorted(outputs.items())}


def test_golden_pipeline(tmp_path):
    digests = _run_pipeline(str(tmp_path))
    if not os.path.exists(GOLDEN_PATH):
        raise AssertionError(
            "golden_hashes.json missing; run python -m tests.test_golden --regen"
        )
    with open(GOLDEN_PATH) as fh:
        expected = json.load(fh)
    assert digests == expected


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            digests = _run_pipeline(tmp)
        with open(GOLDEN_PATH, "w") as fh:
            json.dump(digests, fh, indent=1, sort_keys=True)
        print(f"wrote {GOLDEN_PATH} ({len(digests)} outputs)")
