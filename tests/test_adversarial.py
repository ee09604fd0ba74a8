"""Adversarial property tests (VERDICT r1 #4): engineered inputs
hitting the semantic edges - interior gaps of exactly k-1 missing
k-mers (the abs(d+1) clamp), N runs at window boundaries, %.2f ties in
emitted fields, findIBS summary math against an independent oracle, and
>48 chromosomes (two HashMap resizes) through the order emulation."""

import numpy as np
import pytest

from kcftools_tpu.cli import main as cli_main
from kcftools_tpu.io.kcf import KCFReader
from kcftools_tpu.utils import javafmt

from .gen import db_from_seqs, mutate, random_seq, write_fasta
from .oracle import (
    compute_score,
    count_db,
    find_ibs_summary,
    process_window,
)
from .test_plugins_e2e import _oracle_windows

K = 21
WIN = 300


def _run_get_variations(tmp_path, ref_seqs, db, name="s1", win=WIN,
                        extra=()):
    """db: oracle k-mer dict; writes the DB + ref, runs the CLI."""
    from kcftools_tpu.engine.encode import str_to_kmer
    from kcftools_tpu.io.kmc import write_kmc_db

    ref_path = str(tmp_path / "ref.fa")
    write_fasta(ref_path, ref_seqs)
    kmers = np.array([str_to_kmer(s) for s in db], dtype=np.uint64)
    counts = np.array(list(db.values()), dtype=np.uint64)
    order = np.argsort(kmers)
    prefix = str(tmp_path / "db")
    write_kmc_db(prefix, kmers[order], counts[order], K)
    out = str(tmp_path / "out.kcf")
    rc = cli_main(
        ["getVariations", "-r", ref_path, "-k", prefix, "-o", out,
         "-s", name, "-f", "window", "-w", str(win), *extra]
    )
    assert rc == 0
    return out


def _assert_matches_oracle(out, ref_seqs, db, win=WIN):
    block = KCFReader(out).read_all()
    i = 0
    for chrom, seq in ref_seqs:
        for start, end in _oracle_windows(seq, K, win):
            exp = process_window(seq[start:end], K, db)
            for field, got in (
                ("observed", block.ob[0, i]),
                ("variations", block.va[0, i]),
                ("inner", block.inner[0, i]),
                ("left", block.left[0, i]),
                ("right", block.right[0, i]),
                ("total", block.total_kmers[i]),
                ("eff_length", block.eff_length[i]),
            ):
                assert got == exp[field], (chrom, start, field)
            i += 1
    assert i == len(block)


def test_gap_exactly_k_minus_1(tmp_path):
    """An interior run of exactly k-1 absent k-mers gives d = 0 and the
    reference's abs(d+1) = 1 clamp (GetVariants.java:267-273); also
    cover k-2, k, and k+1 runs in the same genome."""
    rng = np.random.default_rng(21)
    seq = random_seq(rng, 2400)
    db = count_db([seq], K)
    # delete runs of absent k-mers at spaced positions, one per length
    for j, run in enumerate((K - 2, K - 1, K, K + 1)):
        p0 = 200 + j * 500  # interior of window j or spanning edges
        for p in range(p0, p0 + run):
            kmers = count_db([seq[p : p + K]], K)
            for km in kmers:
                db.pop(km, None)
    out = _run_get_variations(tmp_path, [("c1", seq)], db)
    _assert_matches_oracle(out, [("c1", seq)], db)


def test_n_runs_at_window_edges(tmp_path):
    """N runs placed exactly at window starts/ends (and straddling
    them), including a run of exactly k-1 Ns, must match the oracle's
    effective-length and gap bookkeeping."""
    rng = np.random.default_rng(22)
    base = list(random_seq(rng, 2400))
    # window boundaries are every WIN - K + 1 = 280 bases
    stride = WIN - K + 1
    placements = [
        (stride - 1, 3),        # straddles the first boundary
        (2 * stride, K - 1),    # exactly at a window start, k-1 Ns
        (3 * stride - K, K),    # ends exactly at a boundary
        (4 * stride + 1, 1),    # single N just inside a window
    ]
    for pos, run in placements:
        for i in range(pos, min(pos + run, len(base))):
            base[i] = "N"
    seq = "".join(base)
    sample = mutate(rng, seq.replace("N", "A"), snp_rate=0.01)
    db = count_db([sample], K)
    out = _run_get_variations(tmp_path, [("c1", seq)], db)
    _assert_matches_oracle(out, [("c1", seq)], db)


def test_mean_kmer_count_half_up_tie(tmp_path):
    """A window with observed=8 and count sum 9 has meanKmerCount
    1.125 - an exact double tie at the third decimal. Java HALF_UP
    prints 1.13 where Python banker's rounding would print 1.12."""
    rng = np.random.default_rng(23)
    seq = random_seq(rng, WIN)  # single window
    db = count_db([seq], K)
    kmer_list = list(db)
    # keep only 8 k-mers observed; one of them with count 2
    keep = kmer_list[:8]
    db = {km: (2 if i == 0 else 1) for i, km in enumerate(keep)}
    out = _run_get_variations(tmp_path, [("c1", seq)], db)
    block = KCFReader(out).read_all()
    assert block.ob[0, 0] == 8
    assert format(1.125, ".2f") == "1.12"  # the trap this test guards
    assert javafmt.f2(block.mean_kd[0, 0]) == "1.13"
    # and the emitted KCF text itself carries the HALF_UP form
    body = [
        ln for ln in open(out) if not ln.startswith("#")
    ]
    assert ":1.13:" in body[0]


def test_find_ibs_summary_math(tmp_path):
    """findIBS --summary rows must match the independent oracle
    (float32 mean accumulation, NA-attach rules, drop rules)."""
    rng = np.random.default_rng(24)
    chr1 = random_seq(rng, 2600)
    chr2 = random_seq(rng, 2000)
    ref = str(tmp_path / "ref.fa")
    write_fasta(ref, [("chr1", chr1), ("chr2", chr2)])
    db_prefix = str(tmp_path / "db")
    db_from_seqs(
        db_prefix,
        [mutate(rng, chr1, 0.04, 0.01), mutate(rng, chr2, 0.04, 0.01)],
        K,
    )
    kcf = str(tmp_path / "s.kcf")
    assert cli_main(
        ["getVariations", "-r", ref, "-k", db_prefix, "-o", kcf,
         "-s", "s1", "-f", "window", "-w", str(WIN)]
    ) == 0
    out = str(tmp_path / "ibs.kcf")
    assert cli_main(
        ["findIBS", "-i", kcf, "-o", out, "--score", "80", "--min", "1",
         "--summary"]
    ) == 0

    block = KCFReader(out).read_all()
    wins = []
    for i in range(len(block)):
        wins.append(
            (
                block.seq_names[i], int(block.start[i]),
                int(block.end[i]),
                {"s1": (int(block.ibs[0, i]), float(block.score[0, i]))},
            )
        )
    exp_rows = find_ibs_summary(wins, ["s1"])
    got = open(str(tmp_path / "ibs.summary.tsv")).read().strip().split("\n")
    assert len(got) - 1 == len(exp_rows)
    for ln, exp in zip(got[1:], exp_rows):
        f = ln.split("\t")
        assert f[0] == str(exp["Block"])
        assert f[1] == exp["Sample"]
        assert f[2] == exp["Chromosome"]
        assert [int(x) for x in f[3:8]] == [
            exp["Start"], exp["End"], exp["Length"], exp["TotalBlocks"],
            exp["IBSBlocks"],
        ]
        assert f[8] == javafmt.f2(exp["IBSProportion"])
        assert f[9] == javafmt.f2(exp["MeanScore"])


def test_many_chromosomes_hashmap_order(tmp_path):
    """52 chromosomes push the emulated HashMap through two resizes;
    the findIBS output order must stay consistent with the emulation
    and the block sweep must match the naive oracle in that order."""
    from kcftools_tpu.utils.jhash import hashmap_iteration_order

    rng = np.random.default_rng(25)
    n_chr = 52
    seqs = [(f"chr{i}", random_seq(rng, 420)) for i in range(n_chr)]
    ref = str(tmp_path / "ref.fa")
    write_fasta(ref, seqs)
    db_prefix = str(tmp_path / "db")
    db_from_seqs(
        db_prefix, [mutate(rng, s, 0.03) for _n, s in seqs], K
    )
    kcf = str(tmp_path / "s.kcf")
    assert cli_main(
        ["getVariations", "-r", ref, "-k", db_prefix, "-o", kcf,
         "-s", "s1", "-f", "window", "-w", "200"]
    ) == 0
    out = str(tmp_path / "ibs.kcf")
    assert cli_main(
        ["findIBS", "-i", kcf, "-o", out, "--score", "50", "--min", "1"]
    ) == 0
    block = KCFReader(out).read_all()
    seen_order = list(dict.fromkeys(block.seq_names))
    names = [n for n, _s in seqs]
    exp_order = hashmap_iteration_order(names)
    if exp_order is not None:  # treeification -> documented fallback
        assert seen_order == list(exp_order)
    assert sorted(seen_order) == sorted(names)
    # block ids increase monotonically per the sweep over that order
    ibs = block.ibs[0]
    pos = ibs[ibs >= 0]
    assert (np.diff(pos) >= 0).all()
