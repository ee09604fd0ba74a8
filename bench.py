#!/usr/bin/env python
"""Benchmark: windows scored per second per chip on the hot path
(getVariations inner pipeline) on real hardware.

Workload: E. coli-scale synthetic genome (5 Mbp), k=31, 5 kb fixed
windows (the driver's first ladder config), query DB = mutated sample's
canonical k-mer set. The measured loop is exactly the plugin's chunked
dispatch (one uint8 chunk upload + one packed readback per ~4 Mbp,
windows gathered and scored on device), excluding one-time table build /
file ingest; result is the best of several full-genome sweeps.

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
from kcftools_tpu.engine.hashtable import build_table
from kcftools_tpu.engine.pipeline import WindowScorer
from kcftools_tpu.engine.windows import tiling_windows
from kcftools_tpu.plugins.get_variations import _chunk_geometry

GENOME_MBP = 5
K = 31
WINDOW = 5000
SNP_RATE = 0.01
BASELINE_WINDOWS_PER_SEC = 3200.0


def sweep(scorer, u8, starts, win_len, seq_len):
    C, c_step, Lp, B = _chunk_geometry(WINDOW, 0, K)
    chunk_of = starts // c_step
    handles = []
    for c in range(0, (seq_len // c_step) + 1):
        sel = np.flatnonzero(chunk_of == c)
        if sel.size == 0:
            continue
        base = c * c_step
        chunk = u8[base : base + C]
        if chunk.shape[0] < C:
            chunk = np.concatenate([chunk, np.full(C - chunk.shape[0], 4, np.uint8)])
        cstarts = np.zeros(B, np.int32)
        cwl = np.zeros(B, np.int32)
        cstarts[: sel.size] = starts[sel] - base
        cwl[: sel.size] = win_len[sel]
        handles.append((scorer.score_chunk_async(chunk, cstarts, cwl, Lp), sel.size))
    total_obs = 0
    for handle, nsel in handles:
        out = scorer.collect(handle)
        total_obs += int(out["observed"][:nsel].sum())
    return total_obs


def main():
    rng = np.random.default_rng(0)
    n = GENOME_MBP * 1_000_000
    genome = rng.integers(0, 4, size=n).astype(np.uint8)
    valid = np.ones(n, bool)

    sample = genome.copy()
    snp = rng.random(n) < SNP_RATE
    sample[snp] = (sample[snp] + rng.integers(1, 4, snp.sum())) % 4
    kmers, kv = pack_kmers(sample, valid, K)
    canon, counts = np.unique(canonicalize(kmers[kv], K), return_counts=True)
    table = build_table(canon, counts.astype(np.uint32), K)

    starts, ends = tiling_windows(n, WINDOW, K)
    win_len = (ends - starts).astype(np.int32)
    u8 = genome  # all valid; codes already 0..3
    scorer = WindowScorer(table, min_count=1)

    sweep(scorer, u8, starts, win_len, n)  # warmup/compile
    n_windows = len(starts)
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        sweep(scorer, u8, starts, win_len, n)
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
