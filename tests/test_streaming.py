"""Streaming transforms: cohort and findIBS must produce byte-identical
outputs under tiny batch sizes (bounded-memory path exercised across
many batch boundaries) and tolerate locally reordered cohort inputs."""

import os

import numpy as np
import pytest

from kcftools_tpu.cli import main as cli_main
from kcftools_tpu.io.kcf import KCFReader
from kcftools_tpu.plugins import cohort as cohort_mod
from kcftools_tpu.plugins import find_ibs as find_ibs_mod

from .gen import db_from_seqs, mutate, random_seq, write_fasta

K = 21
WIN = 200


@pytest.fixture(scope="module")
def multi_kcfs(tmp_path_factory):
    """3 chromosomes x 3 samples so chromosome hash order and batch
    boundaries both get exercised."""
    rng = np.random.default_rng(11)
    tmp = tmp_path_factory.mktemp("stream")
    chroms = [
        ("chrA", random_seq(rng, 2600, n_prob=0.004)),
        ("chrB", random_seq(rng, 1900, n_prob=0.004)),
        ("chrC", random_seq(rng, 2300, n_prob=0.004)),
    ]
    ref_path = str(tmp / "ref.fa")
    write_fasta(ref_path, chroms)
    kcfs = []
    for name, snp in [("sA", 0.004), ("sB", 0.03), ("sC", 0.06)]:
        seqs = [mutate(rng, seq, snp, 0.002) for _, seq in chroms]
        db_prefix = str(tmp / f"db_{name}")
        db_from_seqs(db_prefix, seqs, K)
        kcf = str(tmp / f"{name}.kcf")
        rc = cli_main(
            [
                "getVariations", "-r", ref_path, "-k", db_prefix,
                "-o", kcf, "-s", name, "-f", "window", "-w", str(WIN),
            ]
        )
        assert rc == 0
        kcfs.append(kcf)
    return {"tmp": tmp, "kcfs": kcfs}


def _read_noncmd(path):
    with open(path) as fh:
        return [l for l in fh if not l.startswith("##CMD")]


def test_cohort_streaming_batches_identical(multi_kcfs, tmp_path, monkeypatch):
    big = str(tmp_path / "big.kcf")
    rc = cli_main(["cohort", "-o", big, "-i", ",".join(multi_kcfs["kcfs"])])
    assert rc == 0
    monkeypatch.setattr(cohort_mod, "_BATCH_CELLS", 21)  # 7-row batches
    small = str(tmp_path / "small.kcf")
    rc = cli_main(["cohort", "-o", small, "-i", ",".join(multi_kcfs["kcfs"])])
    assert rc == 0
    assert _read_noncmd(small) == _read_noncmd(big)


def test_cohort_streaming_out_of_order_input(multi_kcfs, tmp_path, monkeypatch):
    """A file whose windows are locally shuffled relative to file 0
    still merges exactly (carry buffer), like the reference's
    hash-by-windowId match (Cohort.java:80-119)."""
    rng = np.random.default_rng(5)
    src = multi_kcfs["kcfs"][1]
    with open(src) as fh:
        lines = fh.readlines()
    head = [l for l in lines if l.startswith("#")]
    rows = [l for l in lines if not l.startswith("#")]
    # shuffle within a sliding neighborhood of ~6 rows
    idx = np.arange(len(rows), dtype=np.float64)
    idx += rng.uniform(0, 6, len(rows))
    rows = [rows[int(i)] for i in np.argsort(idx)]
    shuffled = str(tmp_path / "shuffled.kcf")
    with open(shuffled, "w") as fh:
        fh.writelines(head + rows)

    base = str(tmp_path / "base.kcf")
    rc = cli_main(
        ["cohort", "-o", base, "-i",
         ",".join([multi_kcfs["kcfs"][0], src, multi_kcfs["kcfs"][2]])]
    )
    assert rc == 0
    monkeypatch.setattr(cohort_mod, "_BATCH_CELLS", 30)
    got = str(tmp_path / "shuf.kcf")
    rc = cli_main(
        ["cohort", "-o", got, "-i",
         ",".join([multi_kcfs["kcfs"][0], shuffled, multi_kcfs["kcfs"][2]])]
    )
    assert rc == 0
    assert _read_noncmd(got) == _read_noncmd(base)


def test_cohort_unknown_window_fatal(multi_kcfs, tmp_path):
    src = multi_kcfs["kcfs"][1]
    with open(src) as fh:
        lines = fh.readlines()
    bad = str(tmp_path / "bad.kcf")
    with open(bad, "w") as fh:
        for l in lines:
            if not l.startswith("#"):
                parts = l.split("\t")
                parts[3] = "bogus_" + parts[3]
                l = "\t".join(parts)
            fh.write(l)
    rc = cli_main(
        ["cohort", "-o", str(tmp_path / "x.kcf"), "-i",
         ",".join([multi_kcfs["kcfs"][0], bad])]
    )
    assert rc != 0


@pytest.fixture(scope="module")
def cohort_kcf(multi_kcfs):
    out = str(multi_kcfs["tmp"] / "cohort.kcf")
    rc = cli_main(["cohort", "-o", out, "-i", ",".join(multi_kcfs["kcfs"])])
    assert rc == 0
    return out


@pytest.mark.parametrize("extra", [[], ["--var"], ["--min", "1"]])
def test_find_ibs_streaming_batches_identical(
    cohort_kcf, tmp_path, monkeypatch, extra
):
    tag = "_".join(extra).replace("-", "") or "plain"
    big = str(tmp_path / f"big_{tag}")
    rc = cli_main(
        ["findIBS", "-i", cohort_kcf, "-o", big, "--score", "92",
         "--summary", "--bed"] + extra
    )
    assert rc == 0
    monkeypatch.setattr(find_ibs_mod, "_BATCH_ROWS", 3)
    small = str(tmp_path / f"small_{tag}")
    rc = cli_main(
        ["findIBS", "-i", cohort_kcf, "-o", small, "--score", "92",
         "--summary", "--bed"] + extra
    )
    assert rc == 0
    assert _read_noncmd(small + ".kcf") == _read_noncmd(big + ".kcf")
    for suffix in [".summary.tsv"] + [
        f".{s}.bed" for s in KCFReader(cohort_kcf).header.samples
    ]:
        with open(big + suffix) as fh:
            want = fh.read()
        with open(small + suffix) as fh:
            got = fh.read()
        assert got == want, suffix


def test_find_ibs_bed_requires_summary(cohort_kcf, tmp_path):
    """--bed without --summary writes no BED files (reference quirk:
    writeBedFile lives inside the writeSummary branch,
    FindIBS.java:175-216)."""
    out = str(tmp_path / "nobed")
    rc = cli_main(
        ["findIBS", "-i", cohort_kcf, "-o", out, "--score", "92", "--bed"]
    )
    assert rc == 0
    assert os.path.exists(out + ".kcf")
    samples = KCFReader(cohort_kcf).header.samples
    for s in samples:
        assert not os.path.exists(out + f".{s}.bed")


@pytest.mark.parametrize("cmd", ["kcf2tsv", "kcf2gt", "increaseWindow"])
def test_exporters_streaming_batches_identical(
    cohort_kcf, tmp_path, monkeypatch, cmd
):
    """Batched exporters emit byte-identical files under tiny batches."""
    from kcftools_tpu.io.kcf import KCFReader as KR

    def go(tag):
        if cmd == "kcf2tsv":
            out = str(tmp_path / f"{tag}")
            rc = cli_main(["kcf2tsv", "-i", cohort_kcf, "-o", out])
            paths = [
                out + f".{s}.tsv" for s in KR(cohort_kcf).header.samples
            ]
        elif cmd == "kcf2gt":
            out = str(tmp_path / f"{tag}.gt")
            rc = cli_main(["kcf2gt", "-i", cohort_kcf, "-o", out])
            paths = [out, out + ".contigsMap.tsv"]
        else:
            out = str(tmp_path / f"{tag}.kcf")
            rc = cli_main(
                ["increaseWindow", "-i", cohort_kcf, "-o", out, "-w", "1000"]
            )
            paths = [out]
        assert rc == 0
        data = []
        for p in paths:
            with open(p) as fh:
                data.append(
                    [l for l in fh if not l.startswith("##CMD")]
                )
        return data

    big = go("big")
    orig = KR.batches
    monkeypatch.setattr(
        KR, "batches", lambda self, batch_rows=200_000: orig(self, 4)
    )
    small = go("small")
    assert small == big
