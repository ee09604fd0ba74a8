#!/usr/bin/env python
"""Benchmark: windows scored per second per chip on the getVariations hot
path.

Workload: E. coli-scale synthetic genome (5 Mbp), k=31, 5 kb fixed
windows (the driver's first ladder config), query DB = a mutated
sample's canonical k-mer counts. Measures the per-sample work of the
default engine exactly as the plugin runs it:

  - branchless sorted-merge join of the reference k-mer index against
    the sample table, emitting u8-compressed counts + an exception list
    (native C++ tier, threaded)
  - fused per-window gap-run scan over the cached per-position index
    (native; replay of GetVariants.java:219-251 semantics, no
    intermediate arrays materialized)

One-time per-reference work (k-mer index construction, window plan,
file ingest) is excluded - it amortizes across samples; everything
per-sample is included. Result is the best of several full sweeps.

Set BENCH_ENGINE=dprefix to instead measure the device-resident engine
(reference index on the TPU, per-sample compressed-count upload +
on-chip positional pipeline) - the deployment shape for TPU pods; its
number is dominated by host<->device tunnel latency in this
environment. The device hash-lookup pipeline is exercised by the test
suite and __graft_entry__.

Baseline: the reference (pure Java, per-k-mer signature scan + binary
search, thread pool over windows; Plugins/GetVariants.java:202-261)
publishes no numbers and no JVM exists in this image, so
BASELINE_WINDOWS_PER_SEC is an estimate of the Java tool on a 24-thread
host: ~1.5us/kmer/thread => ~16M kmer/s => ~3200 windows/s at 5000
kmers/window. The >=10x target from BASELINE.md is measured against
this estimate.
"""

import json
import os
import sys
import time

import numpy as np

import kcftools_tpu  # noqa: F401  (enables x64 + compile cache)
import jax

from kcftools_tpu.engine.encode import canonicalize, pack_kmers
from kcftools_tpu.engine.prefix_scan import static_window_stats
from kcftools_tpu.engine.windows import tiling_windows
from kcftools_tpu.native import merge_counts_u8, window_scan_u8

GENOME_MBP = 5
K = 31
WINDOW = 5000
SNP_RATE = 0.01
BASELINE_WINDOWS_PER_SEC = 3200.0


def main():
    rng = np.random.default_rng(0)
    n = GENOME_MBP * 1_000_000
    genome = rng.integers(0, 4, size=n).astype(np.uint8)
    base_valid = np.ones(n, bool)

    # reference k-mer index + window plan (one-time, excluded from timing)
    kmers, kv = pack_kmers(genome, base_valid, K)
    canon = canonicalize(kmers, K)
    refk = np.unique(canon[kv])
    r_idx = np.searchsorted(refk, canon).astype(np.int32)
    r_idx[~kv] = -1
    starts, ends = tiling_windows(n, WINDOW, K)
    w_hi = (ends - K).astype(np.int32)
    static_window_stats(r_idx, base_valid, K, starts, ends)
    n_windows = len(starts)

    # per-sample table, sorted as the KMC reader provides
    sample = genome.copy()
    snp = rng.random(n) < SNP_RATE
    sample[snp] = (sample[snp] + rng.integers(1, 4, snp.sum())) % 4
    skmers, skv = pack_kmers(sample, base_valid, K)
    db_sorted, db_counts = np.unique(
        canonicalize(skmers[skv], K), return_counts=True
    )
    db_counts = db_counts.astype(np.uint32)

    engine = os.environ.get("BENCH_ENGINE", "hybrid")
    if engine == "dprefix":
        from kcftools_tpu.engine.device_prefix import DevicePrefixScorer

        class _Ref:
            n_kmers = refk.size

        scorer = DevicePrefixScorer(_Ref(), K, min_count=1)
        scorer.add_chrom("c", r_idx, starts, ends)

        def sweep():
            scorer.merge_and_upload(refk, db_sorted, db_counts)
            res = scorer.score_chrom("c")
            return int(res["observed"].sum())

    else:

        def sweep():
            u8, ei, ev = merge_counts_u8(refk, db_sorted, db_counts)
            res = window_scan_u8(u8, ei, ev, r_idx, 1, K, starts, w_hi)
            return int(res["observed"].sum())

    sweep()  # warm (compiles on the device path; page faults on host)
    best = 0.0
    for _ in range(12):  # the shared host is noisy; best-of-many
        t0 = time.time()
        sweep()
        best = max(best, n_windows / (time.time() - t0))

    kmers_per_window = WINDOW - K + 1
    result = {
        "metric": "windows_scored_per_sec_per_chip",
        "value": round(best, 1),
        "unit": "windows/s (5kb windows, k=31)",
        "vs_baseline": round(best / BASELINE_WINDOWS_PER_SEC, 2),
        "kmer_lookups_per_sec": round(best * kmers_per_window),
        "n_windows": n_windows,
        "engine": engine,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
