"""The compact absent-run uplink must be byte-equivalent to the bitmap
uplink on every input: the run encoder (native kcf_bits_to_runs and its
numpy fallback) round-trips exactly, forced runs/bitmap modes agree on
all sample-dependent fields, the sticky run budget falls back to the
bitmap payload without changing results, and mixed groups (run-encoded
and bitmap samples in one batch) stay correct."""

import numpy as np
import pytest

import kcftools_tpu.native as nat
from kcftools_tpu.engine.device_prefix import DevicePrefixScorer
from kcftools_tpu.engine.encode import canonicalize, pack_kmers
from kcftools_tpu.engine.prefix_scan import (
    chromosome_stats_indirect,
    window_stats,
)
from kcftools_tpu.engine.windows import tiling_windows
from kcftools_tpu.native import bits_to_runs, merge_counts, merge_counts_u8

_FIELDS = ("observed", "variations", "inner", "left", "right", "count_sum")


def _decode_runs(d, l, n, k_entries):
    out = np.zeros(n, bool)
    p = 0
    for i in range(k_entries):
        p += int(d[i])
        e = p + int(l[i])
        out[p:min(e, n)] = True
        p = e
    return out


def test_bits_to_runs_fuzz(rng):
    """Native and numpy encoders agree and decode to the exact
    valid-absent set, across densities, N-fractions, and caps
    (including deliberate overflows)."""
    for trial in range(120):
        n = int(rng.integers(1, 3000))
        pres = rng.random(n) < rng.random()
        valid = rng.random(n) < rng.choice([0.2, 0.9, 1.0])
        pres &= valid
        pb = np.packbits(pres, bitorder="little")
        vb = np.packbits(valid, bitorder="little")
        cap = int(rng.integers(1, 4000))
        d1, l1, k1 = bits_to_runs(pb, vb, n, cap)
        lib, tried = nat._lib, nat._tried
        nat._lib, nat._tried = None, True
        try:
            d2, l2, k2 = bits_to_runs(pb, vb, n, cap)
        finally:
            nat._lib, nat._tried = lib, tried
        assert k1 == k2
        if k1 < 0:
            continue
        np.testing.assert_array_equal(d1, d2)
        np.testing.assert_array_equal(l1, l2)
        dec = _decode_runs(d1, l1, n, k1)
        av = valid & ~pres
        np.testing.assert_array_equal(dec & valid, av)


def test_bits_to_runs_saturation(rng):
    """Gaps > 255 positions and runs > 255 long force the (255, 0)
    filler and (0, 255) continuation encodings."""
    n = 2000
    pres = np.ones(n, bool)
    valid = np.ones(n, bool)
    pres[700:1400] = False  # 700-long run (continuations)
    pres[20] = False  # isolated absent, then a >255 gap to the next
    pb = np.packbits(pres, bitorder="little")
    vb = np.packbits(valid, bitorder="little")
    d, l, k = bits_to_runs(pb, vb, n, 64)
    assert k > 0
    dec = _decode_runs(d, l, n, k)
    np.testing.assert_array_equal(dec, ~pres)
    assert (np.asarray(l[:k]) == 255).sum() >= 2  # continuations used
    assert (np.asarray(d[:k]) == 255).sum() >= 2  # fillers used


def test_pack_runs_fused_matches_composed(rng):
    """The fused single-pass kernel must produce exactly the composed
    pack_posbits + bits_to_runs payload and count sums, across
    min-count filters, >=255-count exceptions, invalid (N) positions,
    inter-window gaps, empty windows, and cap overflows."""
    from kcftools_tpu.native import (
        pack_posbits,
        pack_runs_fused,
        runs_to_bits,
    )

    for trial in range(80):
        n_pos = int(rng.integers(50, 4000))
        n_ref = int(rng.integers(10, 2000))
        r_idx = rng.integers(0, n_ref, n_pos).astype(np.int32)
        r_idx[rng.random(n_pos) < 0.05] = -1
        counts = rng.integers(0, 300, n_ref).astype(np.uint32)
        u8 = np.minimum(counts, 255).astype(np.uint8)
        ei = np.flatnonzero(counts >= 255).astype(np.int32)
        ev = counts[ei].astype(np.uint32)
        min_count = int(rng.choice([1, 2, 5, 300]))
        # sorted non-overlapping windows with random gaps + an empty one
        cuts = np.sort(
            rng.choice(n_pos, size=min(n_pos, 8), replace=False)
        )
        ws, wh = [], []
        prev = 0
        for c in cuts:
            if c <= prev:
                continue
            a = prev + int(rng.integers(0, min(3, c - prev)))
            ws.append(a)
            wh.append(int(rng.integers(a, c)) if rng.random() < 0.9 else a - 1)
            prev = c + 1
        ws = np.asarray(ws, np.int32)
        wh = np.asarray(wh, np.int32)
        cap = int(rng.choice([8, 64, 4096]))
        d1, l1, n1, cs1 = pack_runs_fused(
            u8, ei, ev, r_idx, min_count, ws, wh, cap
        )
        bits, cs2 = pack_posbits(u8, ei, ev, r_idx, min_count, ws, wh)
        vb = np.packbits(r_idx >= 0, bitorder="little")
        d2, l2, n2 = bits_to_runs(bits, vb, n_pos, cap)
        assert n1 == n2, trial
        np.testing.assert_array_equal(cs1, cs2, err_msg=f"csum {trial}")
        if n1 >= 0:
            np.testing.assert_array_equal(d1, d2, err_msg=str(trial))
            np.testing.assert_array_equal(l1, l2, err_msg=str(trial))
            np.testing.assert_array_equal(
                runs_to_bits(d1, l1, vb, n_pos), bits,
                err_msg=f"roundtrip {trial}",
            )


def test_pack_runs_fused_threaded_stitch(rng):
    """At >= 2^18 positions the fused kernel splits across threads at
    window boundaries; runs straddling a split must stitch exactly."""
    from kcftools_tpu.native import (
        bits_to_runs,
        pack_posbits,
        pack_runs_fused,
    )

    n_pos = 600_000
    n_ref = 200_000
    r_idx = rng.integers(0, n_ref, n_pos).astype(np.int32)
    r_idx[rng.random(n_pos) < 0.02] = -1
    counts = rng.integers(0, 4, n_ref).astype(np.uint32)  # ~25% absent
    u8 = counts.astype(np.uint8)
    ei = np.empty(0, np.int32)
    ev = np.empty(0, np.uint32)
    step = 480
    ws = np.arange(0, n_pos - step, step, dtype=np.int32)
    wh = (ws + step - 1).astype(np.int32)
    cap = 1 << 20
    d1, l1, n1, cs1 = pack_runs_fused(u8, ei, ev, r_idx, 1, ws, wh, cap)
    bits, cs2 = pack_posbits(u8, ei, ev, r_idx, 1, ws, wh)
    vb = np.packbits(r_idx >= 0, bitorder="little")
    d2, l2, n2 = bits_to_runs(bits, vb, n_pos, cap)
    assert n1 == n2 and n1 > 0
    np.testing.assert_array_equal(cs1, cs2)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(l1, l2)


def test_pack_runs_fused_empty_trailing_chunks(rng):
    """n_win just above 2*T with a forced high thread budget makes
    ceil(n_win/T) leave trailing chunks EMPTY (wa >= n_win); those
    threads must not spawn at all — reading w_start[wa] out of bounds
    rescanned from position 0 and duplicated every run group."""
    from kcftools_tpu.native import bits_to_runs, pack_posbits, pack_runs_fused

    n_pos = 16 << 18  # >= 2^18 positions PER requested thread
    n_ref = 100_000
    r_idx = rng.integers(0, n_ref, n_pos).astype(np.int32)
    r_idx[rng.random(n_pos) < 0.02] = -1
    u8 = rng.integers(0, 4, n_ref).astype(np.uint8)
    ei = np.empty(0, np.int32)
    ev = np.empty(0, np.uint32)
    cap = 1 << 20
    old = nat._thread_budget
    try:
        for n_win, T in ((33, 16), (9, 4), (35, 16)):
            nat.set_threads(T)
            step = n_pos // n_win
            # Zero-padded backing buffers (matching the scorer's padded
            # window layout) make the out-of-bounds w_start[wa] read
            # deterministically see 0, i.e. a rescan from position 0.
            ws_buf = np.zeros(n_win + 64, np.int32)
            wh_buf = np.zeros(n_win + 64, np.int32)
            ws_buf[:n_win] = np.arange(n_win) * step
            wh_buf[:n_win] = ws_buf[:n_win] + step - 1
            ws = ws_buf[:n_win]
            wh = wh_buf[:n_win]
            d1, l1, n1, cs1 = pack_runs_fused(
                u8, ei, ev, r_idx, 1, ws, wh, cap
            )
            bits, cs2 = pack_posbits(u8, ei, ev, r_idx, 1, ws, wh)
            vb = np.packbits(r_idx >= 0, bitorder="little")
            d2, l2, n2 = bits_to_runs(bits, vb, n_pos, cap)
            assert n1 == n2 and n1 > 0, (n_win, T)
            np.testing.assert_array_equal(cs1, cs2, err_msg=f"{n_win}/{T}")
            np.testing.assert_array_equal(d1, d2, err_msg=f"{n_win}/{T}")
            np.testing.assert_array_equal(l1, l2, err_msg=f"{n_win}/{T}")
    finally:
        nat.set_threads(old)


class _FakeRefIdx:
    def __init__(self, n):
        self.n_kmers = n


def _setup(rng, n, k, snp=0.02, window=400, n_prob=0.01):
    genome = rng.integers(0, 4, size=n).astype(np.uint8)
    valid = rng.random(n) >= n_prob
    kmers, kv = pack_kmers(genome, valid, k)
    canon = canonicalize(kmers, k)
    refk = np.unique(canon[kv])
    r_idx = np.full(canon.shape[0], -1, np.int32)
    r_idx[kv] = np.searchsorted(refk, canon[kv]).astype(np.int32)
    starts, ends = tiling_windows(n, window, k)
    return genome, valid, refk, r_idx, starts, ends


def _sample(rng, genome, valid, k, snp):
    s = genome.copy()
    flip = rng.random(genome.shape[0]) < snp
    s[flip] = (s[flip] + rng.integers(1, 4, flip.sum())) % 4
    sk, skv = pack_kmers(s, valid, k)
    db, dbc = np.unique(canonicalize(sk[skv], k), return_counts=True)
    return db, dbc.astype(np.uint32)


def _host(refk, db, dbc, r_idx, valid, min_count, k, starts, ends):
    counts_r = merge_counts(refk, db, dbc)
    st = chromosome_stats_indirect(counts_r, r_idx, valid, min_count, k)
    return window_stats(st, starts, ends)


def _run_scorer(monkeypatch, uplink, refk, r_idx, starts, ends, k, dbs,
                runs_cap=None):
    monkeypatch.setenv("KCFTOOLS_DPREFIX_UPLINK", uplink)
    if runs_cap is not None:
        monkeypatch.setenv("KCFTOOLS_RUNS_CAP", str(runs_cap))
    scorer = DevicePrefixScorer(_FakeRefIdx(refk.size), k, min_count=1)
    scorer.add_chrom("c1", r_idx, starts, ends)
    try:
        for i, (db, dbc) in enumerate(dbs):
            u8, ei, ev = merge_counts_u8(refk, db, dbc)
            scorer.submit_counts(i, u8, ei, ev)
        out = [scorer.collect(i)["c1"] for i in range(len(dbs))]
        kinds = set(scorer._score_fns)
    finally:
        scorer.close()
    return out, kinds


@pytest.mark.parametrize("k", [21, 31])
def test_runs_uplink_matches_bitmap_and_host(rng, monkeypatch, k):
    genome, valid, refk, r_idx, starts, ends = _setup(rng, 40000, k)
    dbs = [_sample(rng, genome, valid, k, 0.02) for _ in range(3)]

    runs_out, runs_kinds = _run_scorer(
        monkeypatch, "runs", refk, r_idx, starts, ends, k, dbs
    )
    assert runs_kinds == {"runs"}  # the compact payload actually ran
    bm_out, bm_kinds = _run_scorer(
        monkeypatch, "bitmap", refk, r_idx, starts, ends, k, dbs
    )
    assert bm_kinds == {"bits"}
    for i, (db, dbc) in enumerate(dbs):
        host = _host(refk, db, dbc, r_idx, valid, 1, k, starts, ends)
        for f in _FIELDS:
            np.testing.assert_array_equal(
                np.asarray(runs_out[i][f], np.int64),
                np.asarray(host[f], np.int64)[: len(starts)],
                err_msg=f"runs {f}",
            )
            np.testing.assert_array_equal(
                np.asarray(runs_out[i][f], np.int64),
                np.asarray(bm_out[i][f], np.int64),
                err_msg=f"bitmap {f}",
            )


def test_runs_cap_overflow_falls_back(rng, monkeypatch):
    """A run budget too small for the data must fall back to the
    bitmap program with identical results."""
    k = 21
    genome, valid, refk, r_idx, starts, ends = _setup(rng, 30000, k)
    # dense enough that every slab of the (virtual) multi-device
    # layout overflows the floor-clamped 16-entry budget
    dbs = [_sample(rng, genome, valid, k, 0.05) for _ in range(2)]
    out, kinds = _run_scorer(
        monkeypatch, "auto", refk, r_idx, starts, ends, k, dbs, runs_cap=8
    )
    assert kinds == {"bits"}
    for i, (db, dbc) in enumerate(dbs):
        host = _host(refk, db, dbc, r_idx, valid, 1, k, starts, ends)
        for f in _FIELDS:
            np.testing.assert_array_equal(
                np.asarray(out[i][f], np.int64),
                np.asarray(host[f], np.int64)[: len(starts)],
                err_msg=f,
            )


def test_mixed_keyed_and_single_sample_flows(rng, monkeypatch):
    """A keyed sample grouped with a key=None sample must stay
    collectable after a later key=None submit invalidates the old
    single-sample slot (the group's handles are shared)."""
    k = 21
    genome, valid, refk, r_idx, starts, ends = _setup(rng, 20000, k)
    dbs = [_sample(rng, genome, valid, k, 0.02) for _ in range(3)]
    monkeypatch.setenv("KCFTOOLS_DPREFIX_UPLINK", "auto")
    scorer = DevicePrefixScorer(_FakeRefIdx(refk.size), k, min_count=1)
    scorer.add_chrom("c1", r_idx, starts, ends)
    try:
        u8, ei, ev = merge_counts_u8(refk, *dbs[0])
        scorer.submit_counts("a", u8, ei, ev)
        u8, ei, ev = merge_counts_u8(refk, *dbs[1])
        scorer.submit_counts(None, u8, ei, ev)  # flushes {a, None}
        u8, ei, ev = merge_counts_u8(refk, *dbs[2])
        scorer.submit_counts(None, u8, ei, ev)  # invalidates old None
        got = scorer.collect("a")["c1"]
    finally:
        scorer.close()
    host = _host(refk, *dbs[0], r_idx, valid, 1, k, starts, ends)
    for f in _FIELDS:
        np.testing.assert_array_equal(
            np.asarray(got[f], np.int64),
            np.asarray(host[f], np.int64)[: len(starts)],
            err_msg=f,
        )


def test_run_cap_grows_for_denser_samples(rng, monkeypatch):
    """A bootstrapped (non-explicit) run budget must grow when a later
    sample is denser, keeping the compact payload in play - and every
    sample's results stay exact across the growth."""
    k = 21
    genome, valid, refk, r_idx, starts, ends = _setup(rng, 30000, k)
    sparse = _sample(rng, genome, valid, k, 0.001)
    dense = _sample(rng, genome, valid, k, 0.05)
    dbs = [sparse, dense, dense]
    monkeypatch.setenv("KCFTOOLS_DPREFIX_UPLINK", "auto")
    scorer = DevicePrefixScorer(_FakeRefIdx(refk.size), k, min_count=1)
    scorer.add_chrom("c1", r_idx, starts, ends)
    try:
        for i, (db, dbc) in enumerate(dbs):
            u8, ei, ev = merge_counts_u8(refk, db, dbc)
            scorer.submit_counts(i, u8, ei, ev)
            if i == 0:
                # simulate a very sparse bootstrap: shrink the sticky
                # budget below the dense samples' run counts
                assert scorer._run_cap is not None
                scorer._run_cap = 16
        out = [scorer.collect(i)["c1"] for i in range(len(dbs))]
        assert scorer._run_cap > 16  # the budget grew
        assert set(scorer._score_fns) == {"runs"}  # no bitmap fallback
    finally:
        scorer.close()
    for i, (db, dbc) in enumerate(dbs):
        host = _host(refk, db, dbc, r_idx, valid, 1, k, starts, ends)
        for f in _FIELDS:
            np.testing.assert_array_equal(
                np.asarray(out[i][f], np.int64),
                np.asarray(host[f], np.int64)[: len(starts)],
                err_msg=f"sample {i} {f}",
            )


def test_mixed_group_falls_back(rng, monkeypatch):
    """First sample fits the sticky run budget, a later much denser one
    overflows it: the whole group must drop to the bitmap program and
    every sample must still match the host engine."""
    k = 21
    genome, valid, refk, r_idx, starts, ends = _setup(rng, 30000, k)
    sparse = _sample(rng, genome, valid, k, 0.0005)
    dense = _sample(rng, genome, valid, k, 0.05)
    dbs = [sparse, dense, sparse]
    out, kinds = _run_scorer(
        monkeypatch, "auto", refk, r_idx, starts, ends, k, dbs, runs_cap=16
    )
    assert "bits" in kinds
    for i, (db, dbc) in enumerate(dbs):
        host = _host(refk, db, dbc, r_idx, valid, 1, k, starts, ends)
        for f in _FIELDS:
            np.testing.assert_array_equal(
                np.asarray(out[i][f], np.int64),
                np.asarray(host[f], np.int64)[: len(starts)],
                err_msg=f"sample {i} {f}",
            )
