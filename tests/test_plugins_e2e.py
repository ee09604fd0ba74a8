"""End-to-end subcommand tests on synthetic genomes: every plugin is
driven through the real CLI and outputs are verified against the naive
oracle / independent reimplementations of the reference's sweeps."""

import os

import numpy as np
import pytest

from kcftools_tpu.cli import main as cli_main
from kcftools_tpu.io.kcf import KCFReader
from kcftools_tpu.utils import javafmt

from .gen import db_from_seqs, mutate, random_seq, write_fasta
from .oracle import compute_score, count_db, process_window

K = 21
WIN = 400


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Genome with 2 chromosomes; 3 mutated samples; KMC DBs; KCFs."""
    rng = np.random.default_rng(42)
    tmp = tmp_path_factory.mktemp("e2e")
    chr1 = random_seq(rng, 3000, n_prob=0.003)
    chr2 = random_seq(rng, 2200, n_prob=0.003)
    ref_path = str(tmp / "ref.fa")
    write_fasta(ref_path, [("chr1", chr1), ("chr2", chr2)])

    samples = {}
    for name, snp, dele in [("s1", 0.005, 0.001), ("s2", 0.02, 0.002), ("s3", 0.05, 0.01)]:
        seqs = [mutate(rng, chr1, snp, dele), mutate(rng, chr2, snp, dele)]
        db_prefix = str(tmp / f"db_{name}")
        db = db_from_seqs(db_prefix, seqs, K)
        kcf = str(tmp / f"{name}.kcf")
        rc = cli_main(
            [
                "getVariations",
                "-r", ref_path,
                "-k", db_prefix,
                "-o", kcf,
                "-s", name,
                "-f", "window",
                "-w", str(WIN),
            ]
        )
        assert rc == 0
        samples[name] = {"db": db, "kcf": kcf}

    cohort_path = str(tmp / "cohort.kcf")
    rc = cli_main(
        [
            "cohort",
            "-o", cohort_path,
            "-i", ",".join(samples[s]["kcf"] for s in ("s1", "s2", "s3")),
        ]
    )
    assert rc == 0
    return {
        "tmp": tmp,
        "ref": {"chr1": chr1, "chr2": chr2},
        "ref_path": ref_path,
        "samples": samples,
        "cohort": cohort_path,
    }


def _oracle_windows(seq, k, win):
    """Reference tiling windows [(start, end)]."""
    out = []
    last_end = 0
    while last_end < len(seq):
        start = max(0, last_end - k + 1)
        end = min(start + win, len(seq))
        if end - start >= k:
            out.append((start, end))
        if end <= last_end:
            break
        last_end = end
    return out


def test_get_variations_vs_oracle(workspace):
    for name, info in workspace["samples"].items():
        block = KCFReader(info["kcf"]).read_all()
        header = KCFReader(info["kcf"]).header
        assert header.samples == [name]
        assert header.kmer_size == K
        assert header.window_size == WIN
        i = 0
        for chrom in ("chr1", "chr2"):
            seq = workspace["ref"][chrom]
            for (start, end) in _oracle_windows(seq, K, WIN):
                assert block.seq_names[i] == chrom
                assert block.start[i] == start
                assert block.end[i] == end
                assert block.window_id[i] == f"{chrom}_{start}"
                exp = process_window(seq[start:end], K, info["db"])
                assert block.total_kmers[i] == exp["total"]
                assert block.eff_length[i] == exp["eff_length"]
                assert block.ob[0, i] == exp["observed"]
                assert block.va[0, i] == exp["variations"]
                assert block.inner[0, i] == exp["inner"]
                assert block.left[0, i] == exp["left"]
                assert block.right[0, i] == exp["right"]
                sc = compute_score(
                    exp["observed"], exp["total"], exp["eff_length"],
                    exp["inner"], exp["left"] + exp["right"], (0.3, 0.3, 0.4),
                )
                assert abs(block.score[0, i] - sc) < 1e-12
                i += 1
        assert i == len(block)
        assert header.window_count == i


def test_kcf_read_write_roundtrip(workspace, tmp_path):
    """Writing a parsed KCF must reproduce it byte-for-byte (minus date)."""
    from kcftools_tpu.io.kcf import KCFWriter

    src = workspace["samples"]["s2"]["kcf"]
    reader = KCFReader(src)
    block = reader.read_all()
    out = str(tmp_path / "rt.kcf")
    with KCFWriter(out) as w:
        w.write_header(reader.header)
        w.write_block(block)
    a = open(src).read()
    b = open(out).read()
    assert a == b


def test_cohort_columns(workspace):
    cohort = KCFReader(workspace["cohort"]).read_all()
    header = KCFReader(workspace["cohort"]).header
    assert header.samples == ["s1", "s2", "s3"]
    for j, name in enumerate(header.samples):
        single = KCFReader(workspace["samples"][name]["kcf"]).read_all()
        np.testing.assert_array_equal(cohort.ob[j], single.ob[0])
        np.testing.assert_array_equal(cohort.va[j], single.va[0])
        np.testing.assert_array_equal(cohort.score[j], single.score[0])
    assert cohort.window_id == single.window_id


def test_score_recalc(workspace, tmp_path):
    out = str(tmp_path / "recalc.kcf")
    rc = cli_main(
        ["scoreRecalc", "-i", workspace["cohort"], "-o", out,
         "--wi", "0.2", "--wt", "0.2", "--wr", "0.6"]
    )
    assert rc == 0
    reader = KCFReader(out)
    assert reader.header.weights == (0.2, 0.2, 0.6)
    block = reader.read_all()
    orig = KCFReader(workspace["cohort"]).read_all()
    for j in range(3):
        for i in range(len(block)):
            exp = compute_score(
                orig.ob[j, i], orig.total_kmers[i], orig.eff_length[i],
                orig.inner[j, i], orig.left[j, i] + orig.right[j, i],
                (0.2, 0.2, 0.6),
            )
            assert abs(block.score[j, i] - exp) < 1e-9


def test_kcf2tsv(workspace, tmp_path):
    prefix = str(tmp_path / "tsv")
    rc = cli_main(["kcf2tsv", "-i", workspace["cohort"], "-o", prefix])
    assert rc == 0
    block = KCFReader(workspace["cohort"]).read_all()
    for j, name in enumerate(["s1", "s2", "s3"]):
        lines = open(f"{prefix}.{name}.tsv").read().rstrip("\n").split("\n")
        assert lines[0].startswith("window_id\tseqname")
        assert len(lines) == 1 + len(block)
        f = lines[1].split("\t")
        assert f[0] == block.window_id[0]
        assert int(f[6]) == block.ob[j, 0]
        assert int(f[8]) == block.inner[j, 0] + block.left[j, 0] + block.right[j, 0]
        assert f[10] == javafmt.f2(block.score[j, 0])


def test_split_kcf(workspace, tmp_path):
    outdir = str(tmp_path / "split")
    rc = cli_main(["splitKCF", "-k", workspace["cohort"], "-o", outdir])
    assert rc == 0
    full = KCFReader(workspace["cohort"]).read_all()
    for chrom in ("chr1", "chr2"):
        part = KCFReader(os.path.join(outdir, f"{chrom}.kcf")).read_all()
        idx = [i for i, c in enumerate(full.seq_names) if c == chrom]
        assert part.window_id == [full.window_id[i] for i in idx]
        np.testing.assert_array_equal(part.ob, full.ob[:, idx])


def test_get_attributes(workspace, tmp_path):
    prefix = str(tmp_path / "attr")
    rc = cli_main(["getAttributes", "-i", workspace["cohort"], "-o", prefix,
                   "-a", "obs,score,totalkmers"])
    assert rc == 0
    block = KCFReader(workspace["cohort"]).read_all()
    obs_lines = open(f"{prefix}.obs.tsv").read().rstrip("\n").split("\n")
    assert obs_lines[0] == "window_id\ts1\ts2\ts3"
    f = obs_lines[3].split("\t")
    assert f[0] == block.window_id[2]
    assert [int(x) for x in f[1:]] == list(block.ob[:, 2])
    tk_lines = open(f"{prefix}.totalkmers.tsv").read().rstrip("\n").split("\n")
    assert tk_lines[1] == f"{block.window_id[0]}\t{block.total_kmers[0]}"
    assert not os.path.exists(f"{prefix}.var.tsv")


def _naive_find_ibs(block, chrom_order, cutoff, min_consec, detect_var):
    """Literal transcription of the reference sweep for verification."""
    import numpy as np

    ibs = np.full(block.ibs.shape, -1, np.int64)
    names = block.seq_names
    for j in range(block.n_samples):
        block_num = 0
        block_chrom = None
        first = False
        for chrom in chrom_order:
            num_na = 0
            for i in range(len(block)):
                if names[i] != chrom:
                    continue
                score = block.score[j, i]
                is_ibs = score < cutoff if detect_var else score >= cutoff
                if is_ibs:
                    if not first:
                        block_num = 1
                        first = True
                    elif num_na > min_consec or (
                        block_chrom is not None and block_chrom != chrom
                    ):
                        block_num += 1
                    block_chrom = chrom
                    ibs[j, i] = block_num
                    num_na = 0
                else:
                    num_na += 1
                    ibs[j, i] = -1
    return ibs


def test_find_ibs(workspace, tmp_path):
    out = str(tmp_path / "ibs.kcf")
    rc = cli_main(["findIBS", "-i", workspace["cohort"], "-o", out,
                   "--score", "80", "--min", "1", "--summary", "--bed"])
    assert rc == 0
    result = KCFReader(out).read_all()
    assert KCFReader(out).header.is_ibs

    src = KCFReader(workspace["cohort"]).read_all()
    from kcftools_tpu.utils import jhash

    chrom_order = jhash.hashmap_iteration_order(
        list(dict.fromkeys(src.seq_names))
    )
    cutoff = float(np.float32(80.0))
    expected = _naive_find_ibs(src, chrom_order, cutoff, 1, False)

    # result windows are reordered by chrom_order; map back by window id
    pos = {w: i for i, w in enumerate(result.window_id)}
    for i, wid in enumerate(src.window_id):
        np.testing.assert_array_equal(
            result.ibs[:, pos[wid]], expected[:, i], err_msg=wid
        )
    # summary + bed files exist
    assert os.path.exists(str(tmp_path / "ibs.summary.tsv"))
    assert os.path.exists(str(tmp_path / "ibs.s1.bed"))
    summary = open(str(tmp_path / "ibs.summary.tsv")).read().split("\n")
    assert summary[0].startswith("Block\tSample")
    assert len(summary) > 2


def _naive_increase(block, samples, step, weights):
    groups = []
    cur = []
    last = None
    for i in range(len(block)):
        if block.seq_names[i] != last or len(cur) == step:
            if cur:
                groups.append(cur)
            cur = []
            last = block.seq_names[i]
        cur.append(i)
    if cur:
        groups.append(cur)

    rows = []
    for g in groups:
        tot = int(block.total_kmers[g].sum())
        per_sample = []
        for j in range(len(samples)):
            va = ob = idist = ld = rd = 0
            kt = 0
            prev_rd = 0
            for t, i in enumerate(g):
                left = int(block.left[j, i])
                right = int(block.right[j, i])
                vars_ = int(block.va[j, i])
                if prev_rd > 0 and left > 0 and vars_ > 0:
                    va += vars_ - 1
                else:
                    va += vars_
                ob += int(block.ob[j, i])
                idist += int(block.inner[j, i])
                kt = int(kt + block.mean_kd[j, i] * block.ob[j, i])
                single = len(g) == 1
                if single:
                    ld += left
                    rd += right
                elif t == 0:
                    ld += left
                    idist += right
                elif t == len(g) - 1:
                    rd += right
                    idist += left
                else:
                    idist += left + right
                prev_rd = right
            per_sample.append((va, ob, idist, ld, rd, kt))
        start = int(block.start[g[0]])
        end = int(block.end[g[-1]])
        rows.append((block.seq_names[g[0]], start, end, tot, per_sample))
    return rows


def test_increase_window(workspace, tmp_path):
    out = str(tmp_path / "bigwin.kcf")
    rc = cli_main(["increaseWindow", "-i", workspace["cohort"], "-o", out,
                   "-w", "1000"])
    assert rc == 0
    res = KCFReader(out).read_all()
    src = KCFReader(workspace["cohort"]).read_all()
    step = 1000 // WIN + 1
    expected = _naive_increase(src, ["s1", "s2", "s3"], step, (0.3, 0.3, 0.4))
    assert len(res) == len(expected)
    for gi, (chrom, start, end, tot, per_sample) in enumerate(expected):
        assert res.seq_names[gi] == chrom
        assert res.start[gi] == start
        assert res.end[gi] == end
        assert res.total_kmers[gi] == tot
        assert res.eff_length[gi] == end - start
        for j, (va, ob, idist, ld, rd, kt) in enumerate(per_sample):
            assert res.va[j, gi] == va
            assert res.ob[j, gi] == ob
            assert res.inner[j, gi] == idist
            assert res.left[j, gi] == ld
            assert res.right[j, gi] == rd


def test_kcf2gt(workspace, tmp_path):
    out = str(tmp_path / "gt.tsv")
    rc = cli_main(["kcf2gt", "-i", workspace["cohort"], "-o", out])
    assert rc == 0
    lines = open(out).read().rstrip("\n").split("\n")
    assert lines[0] == (
        "# Genotype Table 0:95.0 - 100.00, 2:60.0 - 95.0, 1:30.0 - 60.0, -1: <=30.0"
    )
    assert lines[1] == "ID\tCHR\tSTART\tEND\ts1\ts2\ts3"
    block = KCFReader(workspace["cohort"]).read_all()
    assert len(lines) == 2 + len(block)  # no filters by default
    f = lines[2].split("\t")
    assert f[0] == block.window_id[0]
    assert f[1] == "1"
    for j in range(3):
        sc = block.score[j, 0]
        exp = 0 if sc >= 95 else (2 if sc >= 60 else (-1 if sc <= 30 else 1))
        assert int(f[4 + j]) == exp
    cm = open(out + ".contigsMap.tsv").read().rstrip("\n").split("\n")
    assert cm == ["contigName\tcontigID", "chr1\t1", "chr2\t2"]


def test_kcf2plink(workspace, tmp_path):
    prefix = str(tmp_path / "plink")
    rc = cli_main(["kcf2plink", "-i", workspace["cohort"], "-o", prefix,
                   "--maf", "0", "--max-missing", "1"])
    assert rc == 0
    block = KCFReader(workspace["cohort"]).read_all()
    ped = open(prefix + ".ped").read().rstrip("\n").split("\n")
    assert len(ped) == 3
    first = ped[0].split("\t")
    assert first[:6] == ["s1", "s1", "0", "0", "0", "-9"]
    mapf = open(prefix + ".map").read().rstrip("\n").split("\n")
    # maf=0: mono-allelic windows are still bad (count0==n etc.)
    assert len(mapf) <= len(block)
    assert os.path.exists(prefix + ".contigsMap")


def test_count_cli_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    seq = random_seq(rng, 4000)
    fa = str(tmp_path / "g.fa")
    write_fasta(fa, [("c1", seq)])
    prefix = str(tmp_path / "cnt")
    rc = cli_main(["count", "-i", fa, "-o", prefix, "-k", "21"])
    assert rc == 0
    from kcftools_tpu.io.kmc import KMCReader
    from kcftools_tpu.engine.encode import kmer_to_str

    r = KMCReader(prefix)
    db = count_db([seq], 21)
    assert r.total_kmers == len(db)
    got = {kmer_to_str(int(v), 21): int(c) for v, c in zip(r.kmers, r.counts)}
    assert got == db


def test_multi_sample_get_variations(workspace, tmp_path):
    """-k a,b,c -s sa,sb,sc into a directory must equal three single runs."""
    dbs = ",".join(
        str(workspace["tmp"] / f"db_{n}") for n in ("s1", "s2", "s3")
    )
    outdir = str(tmp_path / "multi")
    rc = cli_main(
        ["getVariations", "-r", workspace["ref_path"], "-k", dbs,
         "-o", outdir, "-s", "s1,s2,s3", "-f", "window", "-w", str(WIN)]
    )
    assert rc == 0
    for name in ("s1", "s2", "s3"):
        multi = KCFReader(os.path.join(outdir, f"{name}.kcf")).read_all()
        single = KCFReader(workspace["samples"][name]["kcf"]).read_all()
        assert multi.window_id == single.window_id
        np.testing.assert_array_equal(multi.ob, single.ob)
        np.testing.assert_array_equal(multi.score, single.score)


def test_get_variations_engines_identical(workspace, tmp_path):
    """dprefix (device-resident) and hybrid (fused host scan) engines
    must produce byte-identical KCFs; the numpy-fallback prefix path is
    covered by forcing the hybrid engine with the fused scan disabled
    in unit tests (test_device_prefix)."""
    ref_path = workspace["ref_path"]
    db_prefix = str(workspace["tmp"] / "db_s2")
    outs = {}
    for engine in ("hybrid", "dprefix"):
        out = str(tmp_path / f"eng_{engine}.kcf")
        rc = cli_main(
            [
                "getVariations",
                "-r", ref_path, "-k", db_prefix, "-o", out,
                "-s", "s2", "-f", "window", "-w", str(WIN),
                "--engine", engine,
            ]
        )
        assert rc == 0
        with open(out) as fh:
            # drop ##CMD / ##DATE lines which legitimately differ
            outs[engine] = [
                ln for ln in fh
                if not ln.startswith(("##CMD", "##DATE", "##SOURCE"))
            ]
    assert outs["hybrid"] == outs["dprefix"]


def test_get_variations_gzipped_reference(workspace, tmp_path):
    """A gzipped reference FASTA produces byte-identical KCF to the
    plain one (transparent decompression; the reference tool refuses
    compressed input, Data/FastaIndex.java:239-242 - deliberate
    improvement)."""
    import gzip

    gz_path = str(tmp_path / "ref.fa.gz")
    with open(workspace["ref_path"], "rb") as src, gzip.open(gz_path, "wb") as dst:
        dst.write(src.read())
    name = "s2"
    db_prefix = str(workspace["tmp"] / f"db_{name}")
    out = str(tmp_path / "gz.kcf")
    rc = cli_main(
        [
            "getVariations",
            "-r", gz_path,
            "-k", db_prefix,
            "-o", out,
            "-s", name,
            "-f", "window",
            "-w", str(WIN),
        ]
    )
    assert rc == 0
    with open(out) as fh:
        got = [l for l in fh if not l.startswith("##CMD") and
               not l.startswith("##reference") and
               not l.startswith("##DATE") and not l.startswith("##SOURCE")]
    with open(workspace["samples"][name]["kcf"]) as fh:
        want = [l for l in fh if not l.startswith("##CMD") and
                not l.startswith("##reference") and
                not l.startswith("##DATE") and not l.startswith("##SOURCE")]
    assert got == want
    # cached sidecar is reused on a second construction
    from kcftools_tpu.io.fasta import FastaIndex, ensure_decompressed

    side = ensure_decompressed(gz_path)
    assert side != gz_path and os.path.exists(side)
    idx = FastaIndex(gz_path)
    assert idx.get_sequence("chr1") == workspace["ref"]["chr1"]


def test_sorted_cache_staleness(tmp_path, rng):
    """A regenerated KMC database must invalidate its sorted-key
    sidecar: results must reflect the NEW database, not the cache."""
    import time

    from kcftools_tpu.cli import main as cli_main

    from .gen import mutate, random_seq, write_fasta

    k = 21
    genome = random_seq(rng, 3000)
    ref = str(tmp_path / "ref.fa")
    write_fasta(ref, [("chr1", genome)])
    fa1 = str(tmp_path / "a.fa")
    write_fasta(fa1, [("chr1", mutate(rng, genome, 0.01, 0.0))])
    fa2 = str(tmp_path / "b.fa")
    write_fasta(fa2, [("chr1", mutate(rng, genome, 0.08, 0.01))])
    db = str(tmp_path / "db")

    assert cli_main(["count", "-i", fa1, "-o", db, "-k", str(k)]) == 0
    out1 = str(tmp_path / "o1.kcf")
    assert cli_main(["getVariations", "-r", ref, "-k", db, "-o", out1,
                     "-s", "s", "-f", "window", "-w", "500"]) == 0
    cache = tmp_path / f"db.kcfsorted.k{k}.npz"
    assert cache.exists()

    time.sleep(1.05)  # ensure a newer mtime on the regenerated DB
    assert cli_main(["count", "-i", fa2, "-o", db, "-k", str(k)]) == 0
    out2 = str(tmp_path / "o2.kcf")
    assert cli_main(["getVariations", "-r", ref, "-k", db, "-o", out2,
                     "-s", "s", "-f", "window", "-w", "500"]) == 0

    b1 = [l for l in open(out1) if not l.startswith("#")]
    b2 = [l for l in open(out2) if not l.startswith("#")]
    assert b1 != b2  # the denser sample must change the rows

    # and a direct scoring of db2 without any cache agrees with out2
    import os
    for f in os.listdir(tmp_path):
        if ".kcfsorted." in f:
            os.unlink(tmp_path / f)
    out3 = str(tmp_path / "o3.kcf")
    assert cli_main(["getVariations", "-r", ref, "-k", db, "-o", out3,
                     "-s", "s", "-f", "window", "-w", "500"]) == 0
    b3 = [l for l in open(out3) if not l.startswith("#")]
    assert b2 == b3
