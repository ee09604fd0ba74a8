"""The device prefix engine must produce exactly the host prefix
engine's sample-dependent fields (observed, variations, inner, left,
right, count_sum) on every input shape - including counts >= 255
(exception path), min_count > 1, N runs, empty windows, multiple
chromosomes, and the sliced merge+upload entry point."""

import numpy as np

from kcftools_tpu.engine.device_prefix import DevicePrefixScorer
from kcftools_tpu.engine.encode import canonicalize, pack_kmers
from kcftools_tpu.engine.prefix_scan import (
    chromosome_stats_indirect,
    window_stats,
)
from kcftools_tpu.engine.windows import tiling_windows
from kcftools_tpu.native import merge_counts, merge_counts_u8

_FIELDS = ("observed", "variations", "inner", "left", "right", "count_sum")


class _FakeRefIdx:
    def __init__(self, n):
        self.n_kmers = n


def _setup(rng, n, k, n_prob=0.01, snp=0.02, window=400):
    genome = rng.integers(0, 4, size=n).astype(np.uint8)
    valid = rng.random(n) >= n_prob
    kmers, kv = pack_kmers(genome, valid, k)
    canon = canonicalize(kmers, k)
    refk = np.unique(canon[kv]) if kv.any() else np.empty(0, np.uint64)
    r_idx = np.full(canon.shape[0], -1, np.int32)
    if refk.size:
        r_idx[kv] = np.searchsorted(refk, canon[kv]).astype(np.int32)

    sample = genome.copy()
    flip = rng.random(n) < snp
    sample[flip] = (sample[flip] + rng.integers(1, 4, flip.sum())) % 4
    sk, skv = pack_kmers(sample, valid, k)
    db, dbc = np.unique(canonicalize(sk[skv], k), return_counts=True)
    starts, ends = tiling_windows(n, window, k)
    return genome, valid, refk, r_idx, db, dbc.astype(np.uint32), starts, ends


def _host(refk, db, dbc, r_idx, valid, min_count, k, starts, ends):
    counts_r = merge_counts(refk, db, dbc)
    st = chromosome_stats_indirect(counts_r, r_idx, valid, min_count, k)
    return window_stats(st, starts, ends)


def _assert_match(dev, host, n):
    for f in _FIELDS:
        np.testing.assert_array_equal(
            np.asarray(dev[f], np.int64),
            np.asarray(host[f], np.int64)[:n],
            err_msg=f,
        )


def test_device_prefix_matches_host(rng):
    k = 21
    genome, valid, refk, r_idx, db, dbc, starts, ends = _setup(
        rng, 20000, k
    )
    host = _host(refk, db, dbc, r_idx, valid, 1, k, starts, ends)

    scorer = DevicePrefixScorer(_FakeRefIdx(refk.size), k, min_count=1)
    scorer.add_chrom("c1", r_idx, starts, ends)
    u8, ei, ev = merge_counts_u8(refk, db, dbc)
    scorer.set_sample_counts(u8, ei, ev)
    dev = scorer.score_chrom("c1")
    _assert_match(dev, host, len(starts))
    scorer.close()


def test_device_prefix_merge_and_upload(rng):
    k = 17
    genome, valid, refk, r_idx, db, dbc, starts, ends = _setup(
        rng, 30000, k, window=700
    )
    host = _host(refk, db, dbc, r_idx, valid, 1, k, starts, ends)
    scorer = DevicePrefixScorer(_FakeRefIdx(refk.size), k, min_count=1)
    scorer.add_chrom("c1", r_idx, starts, ends)
    scorer.merge_and_upload(refk, db, dbc)
    dev = scorer.score_chrom("c1")
    _assert_match(dev, host, len(starts))
    scorer.close()


def test_device_prefix_high_counts_and_min_count(rng):
    """counts >= 255 exercise the exception scatter; min_count=300 can
    only be satisfied through exact exception values."""
    k = 15
    n = 8000
    genome, valid, refk, r_idx, db, dbc, starts, ends = _setup(
        rng, n, k, window=500
    )
    # inflate a third of the db counts beyond the u8 range
    big = rng.random(dbc.shape[0]) < 0.3
    dbc = dbc.astype(np.uint32)
    dbc[big] = rng.integers(255, 100000, big.sum()).astype(np.uint32)

    for mc in (1, 2, 300):
        host = _host(refk, db, dbc, r_idx, valid, mc, k, starts, ends)
        scorer = DevicePrefixScorer(_FakeRefIdx(refk.size), k, min_count=mc)
        scorer.add_chrom("c1", r_idx, starts, ends)
        u8, ei, ev = merge_counts_u8(refk, db, dbc)
        assert (ev >= 255).all() and ei.size == 0 or ei.size > 0
        scorer.set_sample_counts(u8, ei, ev)
        dev = scorer.score_chrom("c1")
        _assert_match(dev, host, len(starts))
        scorer.close()


def test_device_prefix_multi_chrom_multi_sample(rng):
    k = 19
    chroms = {}
    all_kmers = []
    per_chrom = {}
    for name, L in (("a", 12000), ("b", 7000)):
        genome = rng.integers(0, 4, size=L).astype(np.uint8)
        valid = rng.random(L) >= 0.02
        kmers, kv = pack_kmers(genome, valid, k)
        canon = canonicalize(kmers, k)
        per_chrom[name] = (genome, valid, canon, kv)
        if kv.any():
            all_kmers.append(np.unique(canon[kv]))
    refk = np.unique(np.concatenate(all_kmers))
    for name, (genome, valid, canon, kv) in per_chrom.items():
        r_idx = np.full(canon.shape[0], -1, np.int32)
        r_idx[kv] = np.searchsorted(refk, canon[kv]).astype(np.int32)
        starts, ends = tiling_windows(len(genome), 600, k)
        chroms[name] = (r_idx, valid, starts, ends)

    scorer = DevicePrefixScorer(_FakeRefIdx(refk.size), k, min_count=1)
    for name, (r_idx, valid, starts, ends) in chroms.items():
        scorer.add_chrom(name, r_idx, starts, ends)

    for sample_seed in (1, 2):
        srng = np.random.default_rng(sample_seed)
        sk = []
        for name, (genome, valid, canon, kv) in per_chrom.items():
            sample = genome.copy()
            flip = srng.random(len(genome)) < 0.03
            sample[flip] = (sample[flip] + srng.integers(1, 4, flip.sum())) % 4
            km, kmv = pack_kmers(sample, valid, k)
            sk.append(canonicalize(km, k)[kmv])
        db, dbc = np.unique(np.concatenate(sk), return_counts=True)
        dbc = dbc.astype(np.uint32)
        scorer.merge_and_upload(refk, db, dbc)
        for name, (r_idx, valid, starts, ends) in chroms.items():
            host = _host(refk, db, dbc, r_idx, valid, 1, k, starts, ends)
            dev = scorer.score_chrom(name)
            _assert_match(dev, host, len(starts))
    scorer.close()


def test_device_prefix_nothing_present(rng):
    k = 13
    n = 5000
    genome = rng.integers(0, 4, size=n).astype(np.uint8)
    valid = np.ones(n, bool)
    kmers, kv = pack_kmers(genome, valid, k)
    canon = canonicalize(kmers, k)
    refk = np.unique(canon[kv])
    r_idx = np.searchsorted(refk, canon).astype(np.int32)
    r_idx[~kv] = -1
    # a disjoint sample: every window is one trailing gap
    other = rng.integers(0, 4, size=n).astype(np.uint8)
    ok, okv = pack_kmers(other, valid, k)
    db, dbc = np.unique(canonicalize(ok, k)[okv], return_counts=True)
    keep = ~np.isin(db, refk)  # drop chance collisions: truly disjoint
    db, dbc = db[keep], dbc[keep]
    starts, ends = tiling_windows(n, 800, k)
    host = _host(refk, db, dbc.astype(np.uint32), r_idx, valid, 1, k,
                 starts, ends)
    scorer = DevicePrefixScorer(_FakeRefIdx(refk.size), k, min_count=1)
    scorer.add_chrom("c1", r_idx, starts, ends)
    scorer.merge_and_upload(refk, db, dbc.astype(np.uint32))
    dev = scorer.score_chrom("c1")
    _assert_match(dev, host, len(starts))
    assert (np.asarray(dev["observed"]) == 0).all()
    scorer.close()


def test_merge_counts_u8_matches_u32(rng):
    n = 40000
    refk = np.unique(rng.integers(0, 1 << 60, n).astype(np.uint64))
    db = np.unique(rng.integers(0, 1 << 60, n).astype(np.uint64))
    # force heavy overlap + big counts
    db[: n // 2] = refk[: n // 2]
    db = np.unique(db)
    dbc = rng.integers(1, 2000, db.shape[0]).astype(np.uint32)
    exact = merge_counts(refk, db, dbc)
    u8, ei, ev = merge_counts_u8(refk, db, dbc)
    rebuilt = u8.astype(np.uint32)
    rebuilt[ei] = ev
    np.testing.assert_array_equal(rebuilt, exact)
    # sliced calls agree with the full call
    mid = len(refk) // 3
    u8a, eia, eva = merge_counts_u8(refk, db, dbc, 0, mid)
    u8b, eib, evb = merge_counts_u8(refk, db, dbc, mid, len(refk))
    np.testing.assert_array_equal(np.concatenate([u8a, u8b]), u8)
    np.testing.assert_array_equal(np.concatenate([eia, eib]), ei)
    np.testing.assert_array_equal(np.concatenate([eva, evb]), ev)


def test_merge_counts_u8_threaded_simd(rng):
    # large enough to cross the multi-thread threshold (1 << 19)
    n = 700_000
    refk = np.unique(rng.integers(0, 1 << 62, n).astype(np.uint64))
    db = refk.copy()
    # drop ~25% of keys, add ~25% new ones (SNP-like workload shape)
    keep = rng.random(db.shape[0]) > 0.25
    db = np.unique(np.concatenate([
        db[keep], rng.integers(0, 1 << 62, n // 4).astype(np.uint64)
    ]))
    dbc = rng.integers(1, 50, db.shape[0]).astype(np.uint32)
    # sprinkle saturating counts
    big = rng.integers(0, db.shape[0], 200)
    dbc[big] = rng.integers(255, 100_000, 200).astype(np.uint32)
    exact = merge_counts(refk, db, dbc)
    u8, ei, ev = merge_counts_u8(refk, db, dbc)
    rebuilt = u8.astype(np.uint32)
    rebuilt[ei] = ev
    np.testing.assert_array_equal(rebuilt, exact)
    assert (np.diff(ei) > 0).all()  # exception list sorted by ref index


def test_merge_counts_u8_edge_sizes(rng):
    # sizes around SIMD block/tail boundaries and tiny dbs
    for n_ref, n_db in [(1, 1), (7, 3), (8, 8), (9, 17), (4097, 5),
                        (5000, 4999), (4096 + 7, 4096 + 9)]:
        refk = np.unique(rng.integers(0, 1 << 40, n_ref).astype(np.uint64))
        db = np.unique(rng.integers(0, 1 << 40, n_db).astype(np.uint64))
        m = min(len(refk) // 2, len(db))
        db[:m] = refk[:m]
        db = np.unique(db)
        dbc = rng.integers(1, 300, db.shape[0]).astype(np.uint32)
        exact = merge_counts(refk, db, dbc)
        u8, ei, ev = merge_counts_u8(refk, db, dbc)
        rebuilt = u8.astype(np.uint32)
        rebuilt[ei] = ev
        np.testing.assert_array_equal(rebuilt, exact)


def test_window_scan_u8_simd_vs_scalar(rng):
    """Differential fuzz of the SIMD window scan against the scalar
    path (forced via KCFTOOLS_NO_SIMD) on adversarial inputs: invalid
    (non-ACGT) positions, >=255 exception counts, min_count > 1,
    sliding/tiling windows, tails at non-multiples of 64."""
    import os

    from kcftools_tpu.native import window_scan_u8

    for trial in range(8):
        n_pos = int(rng.integers(200, 20_000))
        n_ref = int(rng.integers(50, n_pos + 1))
        r_idx = rng.integers(0, n_ref, n_pos).astype(np.int32)
        # sprinkle invalid positions (some trials none)
        if trial % 3:
            inv = rng.random(n_pos) < rng.choice([0.001, 0.05, 0.3])
            r_idx[inv] = -1
        counts = rng.integers(0, 12, n_ref).astype(np.uint32)
        counts[rng.integers(0, n_ref, 5)] = rng.integers(
            255, 70_000, 5
        ).astype(np.uint32)
        u8 = np.minimum(counts, 255).astype(np.uint8)
        big = np.flatnonzero(counts >= 255).astype(np.int32)
        exc_val = counts[big].astype(np.uint32)
        min_count = int(rng.choice([1, 1, 2, 5]))
        k = int(rng.choice([5, 31]))
        # windows: tiling-ish with random lengths, some overlapping
        w_start, w_hi = [], []
        p = 0
        while p < n_pos - 1:
            ln = int(rng.integers(1, 400))
            w_start.append(p)
            w_hi.append(min(p + ln, n_pos - 1))
            p += max(1, ln - int(rng.integers(0, min(ln, 60))))
        w_start = np.asarray(w_start, np.int32)
        w_hi = np.asarray(w_hi, np.int32)

        res_simd = window_scan_u8(
            u8, big, exc_val, r_idx, min_count, k, w_start, w_hi
        )
        os.environ["KCFTOOLS_NO_SIMD"] = "1"
        try:
            res_ref = window_scan_u8(
                u8, big, exc_val, r_idx, min_count, k, w_start, w_hi
            )
        finally:
            del os.environ["KCFTOOLS_NO_SIMD"]
        for key in res_ref:
            np.testing.assert_array_equal(
                res_simd[key], res_ref[key],
                err_msg=f"trial={trial} field={key}",
            )



def test_sample_axis_spread_multi_device(rng):
    """With more devices than slabs, a group's sample rows must spread
    across the slab's device pool - and stay exact per sample."""
    import jax

    from kcftools_tpu.engine.device_prefix import DevicePrefixScorer
    from kcftools_tpu.engine.prefix_scan import (
        chromosome_stats_indirect,
        window_stats,
    )
    from kcftools_tpu.engine.windows import tiling_windows

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs a multi-device backend")
    k = 31
    seq_len = 4096
    n_ref = 3000
    starts, ends = tiling_windows(seq_len, 512, k)
    n_pos = seq_len - k + 1
    r_idx = rng.integers(0, n_ref, n_pos).astype(np.int32)
    r_idx[rng.random(n_pos) < 0.04] = -1

    sc = DevicePrefixScorer(None, k, min_count=1, batch=8,
                            devices=jax.devices())
    sc.add_chrom("c", r_idx, starts, ends)
    samples = []
    for i in range(8):
        counts_u8 = rng.integers(0, 9, n_ref).astype(np.uint8)
        samples.append(counts_u8)
        sc.submit_counts(i, counts_u8, np.empty(0, np.int32),
                         np.empty(0, np.uint32))
    assert len(sc.sample_rows_devices()) > 1
    for i, counts_u8 in enumerate(samples):
        res = sc.collect(i)["c"]
        st = chromosome_stats_indirect(
            counts_u8.astype(np.uint32), r_idx,
            np.ones(seq_len, bool), 1, k,
        )
        want = window_stats(st, starts, ends)
        for key in ("observed", "variations", "inner", "left", "right",
                    "count_sum"):
            np.testing.assert_array_equal(res[key], want[key],
                                          err_msg=f"s{i} {key}")
    sc.close()
