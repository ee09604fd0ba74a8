"""gene/transcript feature-mode end-to-end tests."""

import numpy as np
import pytest

from kcftools_tpu.cli import main as cli_main
from kcftools_tpu.io.gtf import GTF
from kcftools_tpu.io.kcf import KCFReader

from .gen import db_from_seqs, mutate, random_seq, write_fasta
from .oracle import process_window

K = 15


def _write_gtf(path, rows):
    with open(path, "w") as fh:
        fh.write("# test gtf\n")
        for chrom, type_, start, end, strand, attrs in rows:
            fh.write(
                f"{chrom}\ttest\t{type_}\t{start}\t{end}\t.\t{strand}\t.\t{attrs}\n"
            )


def test_gtf_hierarchy_and_splicing(tmp_path, rng):
    chrom = random_seq(rng, 2000)
    fa = str(tmp_path / "g.fa")
    write_fasta(fa, [("chr1", chrom)])

    gtf_path = str(tmp_path / "g.gtf")
    _write_gtf(
        gtf_path,
        [
            ("chr1", "gene", 101, 700, "+", 'gene_id "g1";'),
            ("chr1", "mRNA", 101, 700, "+", 'gene_id "g1"; transcript_id "t1";'),
            ("chr1", "exon", 101, 200, "+", 'gene_id "g1"; transcript_id "t1";'),
            ("chr1", "exon", 301, 400, "+", 'gene_id "g1"; transcript_id "t1";'),
            ("chr1", "mRNA", 151, 700, "+", 'gene_id "g1"; transcript_id "t2";'),
            ("chr1", "exon", 151, 250, "+", 'gene_id "g1"; transcript_id "t2";'),
            ("chr1", "exon", 601, 700, "+", 'gene_id "g1"; transcript_id "t2";'),
            ("chr1", "gene", 901, 1100, "-", 'gene_id "g2";'),
            ("chr1", "mRNA", 901, 1100, "-", 'gene_id "g2"; transcript_id "t3";'),
            ("chr1", "exon", 901, 1100, "-", 'gene_id "g2"; transcript_id "t3";'),
        ],
    )
    from kcftools_tpu.io.fasta import FastaIndex

    gtf = GTF(gtf_path)
    assert gtf.get_genes("chr1") == ["g1", "g2"]
    assert gtf.get_transcripts("g1") == ["t1", "t2"]
    assert gtf.get_exons("t1") == ["t1-e-1", "t1-e-2"]

    index = FastaIndex(fa)
    # gene g1 splice: exons (101-200),(151-250) overlap -> merge (101-250);
    # plus (301-400), (601-700)
    assert gtf.merged_loci("g1", True) == [
        ("chr1", 101, 250, "+"),
        ("chr1", 301, 400, "+"),
        ("chr1", 601, 700, "+"),
    ]
    seq = gtf.spliced_sequence("g1", index, True)
    assert seq == chrom[100:250] + chrom[300:400] + chrom[600:700]


def test_get_variations_gene_transcript(tmp_path, rng):
    chrom = random_seq(rng, 3000)
    fa = str(tmp_path / "ref.fa")
    write_fasta(fa, [("chr1", chrom)])
    gtf_path = str(tmp_path / "f.gtf")
    _write_gtf(
        gtf_path,
        [
            ("chr1", "gene", 201, 900, "+", 'gene_id "g1";'),
            ("chr1", "mRNA", 201, 900, "+", 'gene_id "g1"; transcript_id "t1";'),
            ("chr1", "exon", 201, 400, "+", 'gene_id "g1"; transcript_id "t1";'),
            ("chr1", "exon", 501, 900, "+", 'gene_id "g1"; transcript_id "t1";'),
            ("chr1", "gene", 1501, 2400, "+", 'gene_id "g2";'),
            ("chr1", "mRNA", 1501, 2400, "+", 'gene_id "g2"; transcript_id "t2";'),
            ("chr1", "exon", 1501, 2400, "+", 'gene_id "g2"; transcript_id "t2";'),
        ],
    )
    sample = mutate(rng, chrom, snp_rate=0.01)
    db_prefix = str(tmp_path / "db")
    db = db_from_seqs(db_prefix, [sample], K)

    for feature in ("gene", "transcript"):
        out = str(tmp_path / f"{feature}.kcf")
        rc = cli_main(
            ["getVariations", "-r", fa, "-k", db_prefix, "-o", out,
             "-s", "sampleX", "-f", feature, "-g", gtf_path]
        )
        assert rc == 0
        block = KCFReader(out).read_all()
        gtf = GTF(gtf_path)
        index_ids = (
            ["g1", "g2"] if feature == "gene" else ["t1", "t2"]
        )
        assert block.window_id == index_ids
        from kcftools_tpu.io.fasta import FastaIndex

        index = FastaIndex(fa)
        for i, fid in enumerate(index_ids):
            spliced = gtf.spliced_sequence(fid, index, feature == "gene")
            exp = process_window(spliced, K, db)
            assert block.total_kmers[i] == exp["total"]
            assert block.ob[0, i] == exp["observed"]
            assert block.va[0, i] == exp["variations"]
            assert block.inner[0, i] == exp["inner"]
            assert block.eff_length[i] == exp["eff_length"]
            chrom_, start, end, _ = gtf.get_loci(fid)
            assert block.start[i] == start
            assert block.end[i] == end


def test_kcf2matrix(tmp_path, rng):
    # reuse a small getVariations output
    chrom = random_seq(rng, 1500)
    fa = str(tmp_path / "r.fa")
    write_fasta(fa, [("c1", chrom)])
    prefix = str(tmp_path / "d")
    db_from_seqs(prefix, [mutate(rng, chrom, 0.02)], K)
    kcf = str(tmp_path / "w.kcf")
    assert cli_main(["getVariations", "-r", fa, "-k", prefix, "-o", kcf,
                     "-s", "sA", "-f", "window", "-w", "300"]) == 0
    out = str(tmp_path / "mx")
    assert cli_main(["kcf2matrix", "-i", kcf, "-o", out,
                     "--maf", "0", "--max-missing", "1"]) == 0
    lines = open(out + ".matrix.tsv").read().rstrip("\n").split("\n")
    assert lines[0].startswith("taxa")
    assert lines[1].startswith("sA")
    mapl = open(out + ".map.tsv").read().rstrip("\n").split("\n")
    assert mapl[0] == "name\tchromosome\tposition"


def test_compare_ibs(tmp_path, rng):
    seq = random_seq(rng, 1200)
    fa1 = str(tmp_path / "r1.fa")
    fa2 = str(tmp_path / "r2.fa")
    write_fasta(fa1, [("c1", seq)])
    write_fasta(fa2, [("c1", mutate(rng, seq, 0.01))])
    prefix = str(tmp_path / "cdb")
    db_from_seqs(prefix, [seq], K)

    # minimal findIBS-summary-like files: Block Sample Chrom Start End Length ...
    s1 = str(tmp_path / "s1.tsv")
    s2 = str(tmp_path / "s2.tsv")
    hdr = "Block\tSample\tChromosome\tStart\tEnd\tLength\tTotalBlocks\tIBSBlocks\tIBSProportion\tMeanScore\n"
    with open(s1, "w") as fh:
        fh.write(hdr)
        fh.write("1\tsX\tc1\t0\t500\t500\t2\t2\t1.00\t99.00\n")
    with open(s2, "w") as fh:
        fh.write(hdr)
        fh.write("1\tsX\tc1\t100\t700\t600\t2\t2\t1.00\t99.00\n")

    out = str(tmp_path / "cmp.tsv")
    rc = cli_main(
        ["compareIBS", "--refOne", fa1, "--refTwo", fa2,
         "--kcfOne", s1, "--kcfTwo", s2, "--kmc", prefix, "--output", out]
    )
    assert rc == 0
    rows = open(out).read().rstrip("\n").split("\n")
    assert len(rows) == 1
    f = rows[0].split("\t")
    assert f[0] == "c1" and f[3] == "c1"
    assert int(f[6]) == 500 - K + 1
    assert int(f[8]) <= int(f[6])
    assert int(f[9]) <= int(f[8])


@pytest.mark.parametrize("k", [51, 75])
def test_feature_hybrid_wide_k_and_n_runs(tmp_path, rng, k):
    """Gene/transcript via the hybrid engine with k > 32 (wide two-limb
    keys at 51, byte-record keys at 75) and N runs inside exons,
    validated against the pure-Python oracle; the DB comes from the
    built-in counter, exercising the writer/reader at that k too."""
    chrom = random_seq(rng, 4000, n_prob=0.01)
    fa = str(tmp_path / "ref.fa")
    write_fasta(fa, [("chr1", chrom)])
    gtf_path = str(tmp_path / "f.gtf")
    _write_gtf(
        gtf_path,
        [
            ("chr1", "gene", 101, 1200, "+", 'gene_id "g1";'),
            ("chr1", "mRNA", 101, 1200, "+",
             'gene_id "g1"; transcript_id "t1";'),
            ("chr1", "exon", 101, 600, "+",
             'gene_id "g1"; transcript_id "t1";'),
            ("chr1", "exon", 801, 1200, "+",
             'gene_id "g1"; transcript_id "t1";'),
            ("chr1", "gene", 2001, 3500, "-", 'gene_id "g2";'),
            ("chr1", "mRNA", 2001, 3500, "-",
             'gene_id "g2"; transcript_id "t2";'),
            ("chr1", "exon", 2001, 3500, "-",
             'gene_id "g2"; transcript_id "t2";'),
        ],
    )
    sample = mutate(rng, chrom, snp_rate=0.02)
    db_prefix = str(tmp_path / "db")
    sfa = str(tmp_path / "s.fa")
    write_fasta(sfa, [("chr1", sample)])
    assert cli_main(["count", "-i", sfa, "-o", db_prefix, "-k", str(k)]) == 0
    from .oracle import canonical

    db = {}
    for i in range(len(sample) - k + 1):
        sub = sample[i : i + k].upper()
        if all(c in "ACGT" for c in sub):
            key = canonical(sub)
            db[key] = db.get(key, 0) + 1

    for feature in ("gene", "transcript"):
        out = str(tmp_path / f"{feature}_wide.kcf")
        rc = cli_main(
            ["getVariations", "-r", fa, "-k", db_prefix, "-o", out,
             "-s", "sw", "-f", feature, "-g", gtf_path]
        )
        assert rc == 0
        block = KCFReader(out).read_all()
        gtf = GTF(gtf_path)
        from kcftools_tpu.io.fasta import FastaIndex

        index = FastaIndex(fa)
        ids = ["g1", "g2"] if feature == "gene" else ["t1", "t2"]
        assert block.window_id == ids
        for i, fid in enumerate(ids):
            spliced = gtf.spliced_sequence(fid, index, feature == "gene")
            exp = process_window(spliced, k, db)
            assert block.total_kmers[i] == exp["total"], fid
            assert block.ob[0, i] == exp["observed"], fid
            assert block.va[0, i] == exp["variations"], fid
            assert block.inner[0, i] == exp["inner"], fid
            assert block.eff_length[i] == exp["eff_length"], fid


def test_feature_hybrid_matches_device_engine(tmp_path, rng):
    """The hybrid feature path and the on-chip hash pipeline must emit
    byte-identical KCF (modulo CMD/DATE header lines)."""
    chrom = random_seq(rng, 2500)
    fa = str(tmp_path / "ref.fa")
    write_fasta(fa, [("chr1", chrom)])
    gtf_path = str(tmp_path / "f.gtf")
    _write_gtf(
        gtf_path,
        [
            ("chr1", "gene", 51, 800, "+", 'gene_id "g1";'),
            ("chr1", "mRNA", 51, 800, "+",
             'gene_id "g1"; transcript_id "t1";'),
            ("chr1", "exon", 51, 400, "+",
             'gene_id "g1"; transcript_id "t1";'),
            ("chr1", "exon", 601, 800, "+",
             'gene_id "g1"; transcript_id "t1";'),
            ("chr1", "gene", 1001, 2200, "+", 'gene_id "g2";'),
            ("chr1", "mRNA", 1001, 2200, "+",
             'gene_id "g2"; transcript_id "t2";'),
            ("chr1", "exon", 1001, 2200, "+",
             'gene_id "g2"; transcript_id "t2";'),
        ],
    )
    sample = mutate(rng, chrom, snp_rate=0.015)
    db_prefix = str(tmp_path / "db")
    db_from_seqs(db_prefix, [sample], K)

    def strip(path):
        with open(path) as fh:
            return [
                ln for ln in fh
                if not ln.startswith(("##CMD", "##DATE"))
            ]

    for feature in ("gene", "transcript"):
        a = str(tmp_path / f"{feature}_h.kcf")
        b = str(tmp_path / f"{feature}_d.kcf")
        assert cli_main(
            ["getVariations", "-r", fa, "-k", db_prefix, "-o", a,
             "-s", "sx", "-f", feature, "-g", gtf_path,
             "--engine", "hybrid"]
        ) == 0
        assert cli_main(
            ["getVariations", "-r", fa, "-k", db_prefix, "-o", b,
             "-s", "sx", "-f", feature, "-g", gtf_path,
             "--engine", "device"]
        ) == 0
        assert strip(a) == strip(b), feature


@pytest.mark.parametrize("k", [15, 51])
def test_feature_dprefix_matches_hybrid(tmp_path, rng, k):
    """Gene/transcript mode through the device positional engine must be
    byte-identical to the hybrid engine, including features shorter
    than k (zero rows)."""
    chrom = random_seq(rng, 3000, n_prob=0.005)
    fa = str(tmp_path / "ref.fa")
    write_fasta(fa, [("chr1", chrom)])
    gtf_path = str(tmp_path / "f.gtf")
    _write_gtf(
        gtf_path,
        [
            ("chr1", "gene", 101, 900, "+", 'gene_id "g1";'),
            ("chr1", "mRNA", 101, 900, "+",
             'gene_id "g1"; transcript_id "t1";'),
            ("chr1", "exon", 101, 500, "+",
             'gene_id "g1"; transcript_id "t1";'),
            ("chr1", "exon", 701, 900, "+",
             'gene_id "g1"; transcript_id "t1";'),
            # a gene shorter than k: zero totals everywhere
            ("chr1", "gene", 1001, 1000 + k - 2, "+", 'gene_id "g2";'),
            ("chr1", "mRNA", 1001, 1000 + k - 2, "+",
             'gene_id "g2"; transcript_id "t2";'),
            ("chr1", "exon", 1001, 1000 + k - 2, "+",
             'gene_id "g2"; transcript_id "t2";'),
            ("chr1", "gene", 1501, 2800, "-", 'gene_id "g3";'),
            ("chr1", "mRNA", 1501, 2800, "-",
             'gene_id "g3"; transcript_id "t3";'),
            ("chr1", "exon", 1501, 2800, "-",
             'gene_id "g3"; transcript_id "t3";'),
        ],
    )
    sfa = str(tmp_path / "s.fa")
    write_fasta(sfa, [("chr1", mutate(rng, chrom, snp_rate=0.02))])
    db_prefix = str(tmp_path / "db")
    assert cli_main(["count", "-i", sfa, "-o", db_prefix, "-k", str(k)]) == 0

    def strip(path):
        return [
            ln for ln in open(path)
            if not ln.startswith("##CMD") and not ln.startswith("##DATE")
        ]

    for feature in ("gene", "transcript"):
        outs = {}
        for eng in ("hybrid", "dprefix"):
            out = str(tmp_path / f"{feature}_{eng}.kcf")
            rc = cli_main(
                ["getVariations", "-r", fa, "-k", db_prefix, "-o", out,
                 "-s", "sx", "-f", feature, "-g", gtf_path,
                 "--engine", eng]
            )
            assert rc == 0
            outs[eng] = strip(out)
        assert outs["hybrid"] == outs["dprefix"], feature


def test_feature_scanner_multi_sample_matches_solo(tmp_path, rng):
    """12-sample gene-mode runs route through the ordinal scanner
    (WORTH_SAMPLES); outputs must be byte-identical (modulo run
    metadata) to per-sample runs that use the fused scan."""
    chrom = random_seq(rng, 4000)
    fa = str(tmp_path / "ref.fa")
    write_fasta(fa, [("chr1", chrom)])
    gtf_path = str(tmp_path / "f.gtf")
    _write_gtf(
        gtf_path,
        [
            ("chr1", "gene", 101, 800, "+", 'gene_id "g1";'),
            ("chr1", "mRNA", 101, 800, "+", 'gene_id "g1"; transcript_id "t1";'),
            ("chr1", "exon", 101, 800, "+", 'gene_id "g1"; transcript_id "t1";'),
            ("chr1", "gene", 1001, 2200, "+", 'gene_id "g2";'),
            ("chr1", "mRNA", 1001, 2200, "+", 'gene_id "g2"; transcript_id "t2";'),
            ("chr1", "exon", 1001, 1400, "+", 'gene_id "g2"; transcript_id "t2";'),
            ("chr1", "exon", 1601, 2200, "+", 'gene_id "g2"; transcript_id "t2";'),
            ("chr1", "gene", 2501, 3600, "+", 'gene_id "g3";'),
            ("chr1", "mRNA", 2501, 3600, "+", 'gene_id "g3"; transcript_id "t3";'),
            ("chr1", "exon", 2501, 3600, "+", 'gene_id "g3"; transcript_id "t3";'),
        ],
    )
    names, dbs = [], []
    for i in range(12):
        s = mutate(rng, chrom, snp_rate=0.005 + 0.004 * i)
        p = str(tmp_path / f"db{i}")
        db_from_seqs(p, [s], K)
        names.append(f"m{i}")
        dbs.append(p)
    out_dir = str(tmp_path / "multi")
    rc = cli_main(
        ["getVariations", "-r", fa, "-k", ",".join(dbs), "-o", out_dir,
         "-s", ",".join(names), "-f", "gene", "-g", gtf_path]
    )
    assert rc == 0

    def body(path):
        return [l for l in open(path) if not l.startswith("##")]

    for i in (0, 5, 11):
        solo = str(tmp_path / f"solo{i}.kcf")
        rc = cli_main(
            ["getVariations", "-r", fa, "-k", dbs[i], "-o", solo,
             "-s", names[i], "-f", "gene", "-g", gtf_path]
        )
        assert rc == 0
        assert body(f"{out_dir}/{names[i]}.kcf") == body(solo), i
