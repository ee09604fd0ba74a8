#!/usr/bin/env python
"""Benchmark: windows scored per second per chip on the hot path
(getVariations) on real hardware.

Workload: E. coli-scale synthetic genome (5 Mbp), k=31, 5 kb fixed
windows (the driver's first ladder config), query DB = mutated sample's
canonical k-mer counts. Measures the per-sample work of the default
(hybrid) engine exactly as the plugin runs it:

  host: sorted-merge join of the reference k-mer index against the
        sample table + per-position count gather + exact prefix-sum
        totals  (native C++ tier)
  TPU:  chunked gap-run / effective-length scans (one uint8 upload + one
        packed int64 readback per 8 Mbp chunk)

One-time per-reference work (k-mer index construction, file ingest) is
excluded, as it amortizes over samples; the merge join is per-sample and
included. Result is the best of several full sweeps.

Baseline: the reference (pure Java, per-kmer signature scan + binary
search; Plugins/GetVariants.java:202-261) publishes no numbers and no
JVM exists in this image, so BASELINE_WINDOWS_PER_SEC is an estimate of
the Java tool on a 24-thread host: ~1.5 us/kmer/thread lookup cost
=> ~16M kmer/s => ~3200 windows/s at 5000 kmers/window. The >=10x
target from BASELINE.md is measured against this estimate.
"""

import json
import sys
import time

import numpy as np

import kcftools_tpu  # noqa: F401  (enables x64 + compile cache)
import jax

from kcftools_tpu.engine.encode import canonicalize, pack_kmers
from kcftools_tpu.engine.pipeline import ScanScorer
from kcftools_tpu.engine.windows import tiling_windows
from kcftools_tpu.native import gather_counts, merge_counts
from kcftools_tpu.plugins.get_variations import _chunk_geometry

GENOME_MBP = 5
K = 31
WINDOW = 5000
SNP_RATE = 0.01
BASELINE_WINDOWS_PER_SEC = 3200.0


def sweep(scan_scorer, refk, r_idx, valid_u8, db_sorted, db_counts, starts,
          ends, seq_len):
    """One full per-sample scoring pass (join + totals + device scans)."""
    counts_r = merge_counts(refk, db_sorted, db_counts)
    counts_pos = gather_counts(counts_r, r_idx)
    present_pos = counts_pos >= 1
    kmer_valid_pos = r_idx >= 0

    cs_cnt = np.zeros(len(counts_pos) + 1, np.int64)
    np.cumsum(np.where(present_pos, counts_pos, 0).astype(np.int64), out=cs_cnt[1:])
    cs_obs = np.zeros(len(counts_pos) + 1, np.int64)
    np.cumsum(present_pos.astype(np.int64), out=cs_obs[1:])
    cs_tot = np.zeros(len(counts_pos) + 1, np.int64)
    np.cumsum(kmer_valid_pos.astype(np.int64), out=cs_tot[1:])
    lo, hi = starts, ends - K + 1
    observed = cs_obs[hi] - cs_obs[lo]
    _ = cs_cnt[hi] - cs_cnt[lo]
    _ = cs_tot[hi] - cs_tot[lo]

    state = valid_u8.copy()
    state[: len(present_pos)] |= present_pos.astype(np.uint8) << 1

    C, c_step, Lp, B = _chunk_geometry(WINDOW, 0, K)
    win_len = (ends - starts).astype(np.int32)
    chunk_of = starts // c_step
    handles = []
    for c in range(0, (seq_len // c_step) + 1):
        sel = np.flatnonzero(chunk_of == c)
        if sel.size == 0:
            continue
        base = c * c_step
        chunk = state[base : base + C]
        if chunk.shape[0] < C:
            chunk = np.concatenate([chunk, np.zeros(C - chunk.shape[0], np.uint8)])
        cstarts = np.zeros(B, np.int32)
        cwl = np.zeros(B, np.int32)
        cstarts[: sel.size] = starts[sel] - base
        cwl[: sel.size] = win_len[sel]
        handles.append((scan_scorer.score_chunk_async(chunk, cstarts, cwl, Lp), sel))
    acc = 0
    for handle, sel in handles:
        out = scan_scorer.collect(handle)
        acc += int(out["variations"][: sel.size].sum())
    return acc, int(observed.sum())


def main():
    rng = np.random.default_rng(0)
    n = GENOME_MBP * 1_000_000
    genome = rng.integers(0, 4, size=n).astype(np.uint8)

    # reference index (one-time, excluded from timing)
    kmers, kv = pack_kmers(genome, np.ones(n, bool), K)
    canon = canonicalize(kmers, K)
    refk = np.unique(canon[kv])
    r_idx = np.searchsorted(refk, canon).astype(np.int32)
    r_idx[~kv] = -1
    valid_u8 = np.ones(n, np.uint8)

    # sample table (per-sample input, sorted as from the KMC reader)
    sample = genome.copy()
    snp = rng.random(n) < SNP_RATE
    sample[snp] = (sample[snp] + rng.integers(1, 4, snp.sum())) % 4
    skmers, skv = pack_kmers(sample, np.ones(n, bool), K)
    db_sorted, db_counts = np.unique(canonicalize(skmers[skv], K), return_counts=True)
    db_counts = db_counts.astype(np.uint32)

    starts, ends = tiling_windows(n, WINDOW, K)
    scan_scorer = ScanScorer(K)

    sweep(scan_scorer, refk, r_idx, valid_u8, db_sorted, db_counts, starts, ends, n)
    n_windows = len(starts)
    best = 0.0
    for _ in range(4):
        t0 = time.time()
        sweep(
            scan_scorer, refk, r_idx, valid_u8, db_sorted, db_counts, starts,
            ends, n,
        )
        dt = time.time() - t0
        best = max(best, n_windows / dt)

    kmers_per_window = WINDOW - K + 1
    result = {
        "metric": "windows_scored_per_sec_per_chip",
        "value": round(best, 1),
        "unit": "windows/s (5kb windows, k=31)",
        "vs_baseline": round(best / BASELINE_WINDOWS_PER_SEC, 2),
        "kmer_lookups_per_sec": round(best * kmers_per_window),
        "n_windows": n_windows,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
