"""The ordinal-space pack (kcf_ordpack) and the bitmap window-stats
walk (kcf_window_stats_bits) must reproduce the positional-gather
kernels exactly: present bits == pack_posbits bits, observed + corr ==
pack_posbits count sums, and the 5 stats fields == window_scan_u8 -
across min-count filters, >=255-count exceptions, invalid (N)
positions, uniform and irregular window layouts, and multi-occurrence
ordinals."""

import numpy as np
import pytest

import kcftools_tpu.native as nat
from kcftools_tpu.native import (
    build_ordmap,
    ordpack,
    pack_posbits,
    window_scan_u8,
    window_stats_bits,
    _uniform_window_map,
)


def _mk(rng, n_pos, n_ref, invalid_frac=0.05, dup_frac=0.1):
    r_idx = rng.integers(0, n_ref, n_pos).astype(np.int32)
    # force multi-occurrence ordinals: a slice reuses a small range
    ndup = int(n_pos * dup_frac)
    if ndup:
        r_idx[:ndup] = rng.integers(0, max(n_ref // 50, 1), ndup)
    r_idx[rng.random(n_pos) < invalid_frac] = -1
    counts = rng.integers(0, 300, n_ref).astype(np.uint32)
    u8 = np.minimum(counts, 255).astype(np.uint8)
    ei = np.flatnonzero(counts >= 255).astype(np.int32)
    ev = counts[ei].astype(np.uint32)
    return r_idx, u8, ei, ev


def _windows(rng, n_pos, kind):
    if kind == "uniform":
        stride = int(rng.integers(40, 200))
        ws = np.arange(0, n_pos - stride, stride, dtype=np.int32)
        wh = (ws + stride - 1).astype(np.int32)
    else:
        cuts = np.sort(rng.choice(n_pos, size=min(n_pos // 30, 40),
                                  replace=False))
        ws, wh = [], []
        prev = 0
        for c in cuts:
            if c <= prev + 1:
                continue
            a = prev + int(rng.integers(0, min(4, c - prev)))
            ws.append(a)
            wh.append(int(rng.integers(a, c)))
            prev = c + 1
        ws = np.asarray(ws, np.int32)
        wh = np.asarray(wh, np.int32)
    return ws, wh


@pytest.mark.parametrize("kind", ["uniform", "ragged"])
@pytest.mark.parametrize("min_count", [1, 2, 5, 300])
def test_ordpack_matches_posbits(rng, kind, min_count):
    for trial in range(6):
        n_pos = int(rng.integers(500, 6000))
        n_ref = int(rng.integers(100, 4000))
        r_idx, u8, ei, ev = _mk(rng, n_pos, n_ref)
        ws, wh = _windows(rng, n_pos, kind)
        if len(ws) == 0:
            continue
        nb = (n_pos + 7) // 8
        valid_bits = np.packbits(r_idx >= 0, bitorder="little")
        vb = np.zeros(nb, np.uint8)
        vb[: valid_bits.shape[0]] = valid_bits

        occ_ord, occ_pos, seg_off, seg_ord = build_ordmap(r_idx)
        pres, corr = ordpack(
            u8, ei, ev, occ_ord, occ_pos, min_count, ws, wh, vb, nb,
            seg_off=seg_off, seg_ord=seg_ord,
        )
        # gather path (no segments) must agree with the segment path
        pres_g, corr_g = ordpack(
            u8, ei, ev, occ_ord, occ_pos, min_count, ws, wh, vb, nb
        )
        np.testing.assert_array_equal(pres, pres_g)
        np.testing.assert_array_equal(corr, corr_g)
        bits, csum = pack_posbits(
            u8, ei, ev, r_idx, min_count, ws, wh, n_bits_bytes=nb
        )
        np.testing.assert_array_equal(pres, bits, err_msg=f"bits {trial}")

        res = window_scan_u8(u8, ei, ev, r_idx, min_count, 21, ws, wh)
        np.testing.assert_array_equal(
            res["observed"] + corr, csum, err_msg=f"csum {trial}"
        )

        st = window_stats_bits(pres, vb, n_pos, 21, ws, wh)
        if st is None:
            continue
        for f in ("observed", "variations", "inner", "left", "right"):
            np.testing.assert_array_equal(
                st[f], res[f], err_msg=f"{f} {trial}"
            )


def test_ordpack_numpy_fallback_agrees(rng):
    n_pos, n_ref = 3000, 1500
    r_idx, u8, ei, ev = _mk(rng, n_pos, n_ref)
    ws, wh = _windows(rng, n_pos, "uniform")
    nb = (n_pos + 7) // 8
    valid_bits = np.packbits(r_idx >= 0, bitorder="little")
    vb = np.zeros(nb, np.uint8)
    vb[: valid_bits.shape[0]] = valid_bits
    occ_ord, occ_pos, seg_off, seg_ord = build_ordmap(r_idx)
    p1, c1 = ordpack(u8, ei, ev, occ_ord, occ_pos, 2, ws, wh, vb, nb,
                     seg_off=seg_off, seg_ord=seg_ord)
    lib, tried = nat._lib, nat._tried
    nat._lib, nat._tried = None, True
    try:
        p2, c2 = ordpack(u8, ei, ev, occ_ord, occ_pos, 2, ws, wh, vb, nb)
    finally:
        nat._lib, nat._tried = lib, tried
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(c1, c2)


def test_uniform_window_map_detection():
    ws = np.arange(0, 1000, 97, dtype=np.int32)
    wh = (ws + 96).astype(np.int32)
    assert _uniform_window_map(ws, wh) == (0, 97)
    wh2 = wh.copy()
    wh2[2] = ws[3]  # overlap
    assert _uniform_window_map(ws, wh2) == (0, 0)
    ws2 = ws.copy()
    ws2[4] += 1  # unequal spacing
    assert _uniform_window_map(ws2, wh) == (0, 0)
    # shorter-than-stride windows still map correctly (hi < next start)
    wh3 = (ws + 50).astype(np.int32)
    assert _uniform_window_map(ws, wh3) == (0, 97)


@pytest.mark.parametrize("min_count", [1, 2])
def test_ordpack_segment_path(rng, min_count):
    """Permutation-style r_idx (every ordinal occurs, searchsorted over
    unique keys - the real reference-index shape) produces long
    identity runs; the contiguous-load segment path must activate and
    agree with pack_posbits, including duplicates and exceptions."""
    n_pos = 50_000
    # genuine searchsorted construction with ~0.2% duplicate k-mers
    vals = rng.integers(0, n_pos * 50, n_pos).astype(np.int64)
    dup = rng.random(n_pos) < 0.002
    vals[dup] = vals[np.roll(dup, 1)][: dup.sum()]
    valid = rng.random(n_pos) >= 0.01
    uniq = np.unique(vals[valid])  # like refk: valid k-mers only
    r_idx = np.searchsorted(uniq, vals).astype(np.int32)
    r_idx = np.minimum(r_idx, uniq.shape[0] - 1).astype(np.int32)
    r_idx[~valid] = -1
    n_ref = uniq.shape[0]
    counts = np.ones(n_ref, np.uint32)
    hot = rng.random(n_ref) < 0.01
    counts[hot] = rng.integers(2, 400, hot.sum())
    counts[rng.random(n_ref) < 0.2] = 0  # absent
    u8 = np.minimum(counts, 255).astype(np.uint8)
    ei = np.flatnonzero(counts >= 255).astype(np.int32)
    ev = counts[ei].astype(np.uint32)
    stride = 497
    ws = np.arange(0, n_pos - stride, stride, dtype=np.int32)
    wh = (ws + stride - 1).astype(np.int32)
    nb = (n_pos + 7) // 8
    vb = np.zeros(nb, np.uint8)
    pb = np.packbits(r_idx >= 0, bitorder="little")
    vb[: pb.shape[0]] = pb
    occ_ord, occ_pos, seg_off, seg_ord = build_ordmap(r_idx)
    n_seg = seg_off.shape[0] - 1
    assert occ_ord.shape[0] >= 48 * n_seg  # the segment path is live
    pres, corr = ordpack(u8, ei, ev, occ_ord, occ_pos, min_count, ws, wh,
                         vb, nb, seg_off=seg_off, seg_ord=seg_ord)
    bits, csum = pack_posbits(u8, ei, ev, r_idx, min_count, ws, wh,
                              n_bits_bytes=nb)
    np.testing.assert_array_equal(pres, bits)
    res = window_scan_u8(u8, ei, ev, r_idx, min_count, 21, ws, wh)
    np.testing.assert_array_equal(res["observed"] + corr, csum)


def test_ordpack_threaded_matches_single(rng):
    """A large slab crosses the threading threshold; private-bitmap
    OR-merge and correction sums must match the single-thread result."""
    n_pos = 1 << 20
    n_ref = 400_000
    r_idx, u8, ei, ev = _mk(rng, n_pos, n_ref, invalid_frac=0.02)
    stride = 4970
    ws = np.arange(0, n_pos - stride, stride, dtype=np.int32)
    wh = (ws + stride - 1).astype(np.int32)
    nb = (n_pos + 7) // 8
    vb = np.zeros(nb, np.uint8)
    pb = np.packbits(r_idx >= 0, bitorder="little")
    vb[: pb.shape[0]] = pb
    occ_ord, occ_pos, seg_off, seg_ord = build_ordmap(r_idx)
    old = nat._thread_budget
    try:
        nat.set_threads(1)
        p1, c1 = ordpack(u8, ei, ev, occ_ord, occ_pos, 2, ws, wh, vb, nb,
                         seg_off=seg_off, seg_ord=seg_ord)
        nat.set_threads(8)
        p8, c8 = ordpack(u8, ei, ev, occ_ord, occ_pos, 2, ws, wh, vb, nb,
                         seg_off=seg_off, seg_ord=seg_ord)
    finally:
        nat.set_threads(old)
    np.testing.assert_array_equal(p1, p8)
    np.testing.assert_array_equal(c1, c8)


def test_route_shard_matches_numpy(rng):
    """Native one-pass shard router == the numpy hash/selection model,
    preserving file order, across shard windows and thread splits."""
    from kcftools_tpu.engine.encode import split_hi_lo
    from kcftools_tpu.engine.hashtable import bucket_hashes_np
    from kcftools_tpu.native import route_shard

    k = 31
    for n in (1000, 1 << 20):
        kmers = rng.integers(0, 1 << 62, n).astype(np.uint64)
        counts = rng.integers(1, 100, n).astype(np.uint32)
        nb_total, t_axis = 1 << 14, 8
        nb_local = nb_total // t_axis
        hi, lo = split_hi_lo(kmers, k)
        h1, _h2 = bucket_hashes_np(hi, lo, nb_total)
        shard = (h1 // np.uint32(nb_local)).astype(np.int32)
        for s_lo, s_hi in ((0, 8), (3, 4), (2, 6)):
            gh, gl, gc, gs = route_shard(
                kmers, counts, k, nb_total, nb_local, s_lo, s_hi,
                want_ids=True,
            )
            sel = (shard >= s_lo) & (shard < s_hi)
            np.testing.assert_array_equal(gh, hi[sel])
            np.testing.assert_array_equal(gl, lo[sel])
            np.testing.assert_array_equal(gc, counts[sel])
            np.testing.assert_array_equal(gs, shard[sel])


def test_ordinal_window_scanner_matches_scan(rng):
    """The host scanner (ordpack + bit walk + corr fold) must equal
    window_scan_u8 on every field including count_sum."""
    from kcftools_tpu.engine.hostscan import OrdinalWindowScanner

    n_pos, n_ref = 40_000, 20_000
    r_idx, u8, ei, ev = _mk(rng, n_pos, n_ref, invalid_frac=0.03)
    stride = 470
    ws = np.arange(0, n_pos - stride, stride, dtype=np.int32)
    wh = (ws + stride - 1).astype(np.int32)
    assert OrdinalWindowScanner.usable(ws, wh)
    for mc in (1, 3):
        sc = OrdinalWindowScanner(r_idx, ws, wh, 21, mc)
        got = sc.score(u8, ei, ev)
        if got is None:
            pytest.skip("native library unavailable")
        exp = window_scan_u8(u8, ei, ev, r_idx, mc, 21, ws, wh)
        for f in ("observed", "variations", "inner", "left", "right",
                  "count_sum"):
            np.testing.assert_array_equal(got[f], exp[f], err_msg=f)
    # overlapping windows are not usable (sliding mode)
    wh2 = (ws + stride + 5).astype(np.int32)
    assert not OrdinalWindowScanner.usable(ws, wh2)
