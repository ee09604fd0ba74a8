"""Property tests: the global prefix decomposition must match the naive
per-window oracle on adversarial sequences."""

import numpy as np

from kcftools_tpu.engine.encode import canonicalize, pack_kmers, str_to_kmer
from kcftools_tpu.engine.prefix_scan import chromosome_stats, window_stats
from kcftools_tpu.io.fasta import codes_from_str

from .gen import mutate, random_seq
from .oracle import count_db, process_window


def _counts_pos(seq, db, k, both_strands=True):
    codes, valid = codes_from_str(seq)
    kmers, kvalid = pack_kmers(codes, valid, k)
    keys = canonicalize(kmers, k) if both_strands else kmers
    table = {str_to_kmer(s): c for s, c in db.items()}
    counts = np.array(
        [table.get(int(v), 0) if ok else 0 for v, ok in zip(keys, kvalid)],
        np.uint32,
    )
    return counts, kvalid, valid


def _check(seq, db, k, windows, min_count=1):
    counts, kvalid, bvalid = _counts_pos(seq, db, k)
    st = chromosome_stats(counts, kvalid, bvalid, min_count, k)
    starts = np.array([w[0] for w in windows])
    ends = np.array([w[1] for w in windows])
    res = window_stats(st, starts, ends)
    for i, (s, e) in enumerate(windows):
        exp = process_window(seq[s:e], k, db, min_count)
        for key in ("total", "observed", "variations", "inner", "left",
                    "right", "count_sum", "eff_length"):
            assert res[key][i] == exp[key], (key, i, s, e, res[key][i], exp[key])


def test_prefix_scan_random(rng):
    k = 21
    seq = random_seq(rng, 5000, n_prob=0.01)
    db = count_db([mutate(rng, seq, 0.02, 0.003)], k)
    windows = [(i, min(i + 400, len(seq))) for i in range(0, 4600, 380)]
    windows = [(s, e) for s, e in windows if e - s >= k]
    _check(seq, db, k, windows)


def test_prefix_scan_overlapping_windows(rng):
    k = 13
    seq = random_seq(rng, 2000)
    db = count_db([mutate(rng, seq, 0.05)], k)
    windows = [(i, i + 300) for i in range(0, 1700, 50)]  # heavy overlap
    _check(seq, db, k, windows)


def test_prefix_scan_adversarial(rng):
    k = 11
    base = random_seq(rng, 600)
    other = random_seq(rng, 600)
    seq = (
        base[:100] + "N" * 5 + base[100:150] + other[:80] + base[150:300]
        + "N" * 30 + other[100:140] + base[300:500] + "NN" + base[500:]
    )
    db = count_db([base], k)
    L = len(seq)
    windows = [
        (0, 120), (90, 250), (100, 105 + k), (140, 260), (200, 400),
        (350, L), (0, L), (430, 470 + k),
    ]
    windows = [(s, min(e, L)) for s, e in windows if min(e, L) - s >= k]
    _check(seq, db, k, windows)


def test_prefix_scan_min_count(rng):
    k = 15
    seq = random_seq(rng, 1200)
    db = count_db([seq, seq, mutate(rng, seq, 0.04)], k)
    windows = [(i, i + 250) for i in range(0, 900, 240)]
    _check(seq, db, k, windows, min_count=2)


def test_prefix_scan_nothing_present(rng):
    k = 11
    seq = random_seq(rng, 500)
    db = count_db([random_seq(rng, 500)], k)  # disjoint
    windows = [(0, 200), (100, 350), (200, 500)]
    _check(seq, db, k, windows)


def test_prefix_scan_all_n():
    k = 11
    seq = "N" * 300
    db = {}
    st_seq = "ACGT" * 10 + seq + "ACGT" * 10
    db = count_db([st_seq], k)
    windows = [(30, 250), (0, len(st_seq))]
    _check(st_seq, db, k, windows)


def test_chrom_stats_native_matches_numpy(rng):
    from kcftools_tpu.native import chrom_stats_native

    k = 19
    seq = random_seq(rng, 3000, n_prob=0.01)
    db = count_db([mutate(rng, seq, 0.02)], k)
    counts, kvalid, bvalid = _counts_pos(seq, db, k)
    r_idx = np.where(kvalid, np.arange(len(kvalid)), -1).astype(np.int32)
    st_np = chromosome_stats(counts, kvalid, bvalid, 1, k)
    st_nat = chrom_stats_native(counts, r_idx, bvalid, 1, k)
    if st_nat is None:  # no toolchain
        return
    for key in ("cs_tot", "cs_obs", "cs_cnt", "pp", "p_var", "p_dist",
                "run_start", "run_end", "f_run"):
        np.testing.assert_array_equal(
            np.asarray(st_nat[key]), np.asarray(st_np[key]), err_msg=key
        )
