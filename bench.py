#!/usr/bin/env python
"""Benchmark: windows scored per second per chip on the getVariations hot
path.

Workload: E. coli-scale synthetic genome (5 Mbp), k=31, 5 kb fixed
windows (the driver's first ladder config), query DBs = several mutated
samples' canonical k-mer counts - the multi-sample shape the plugin
actually runs (one reference, many KMC databases). Measures the
per-sample work of the engine exactly as the plugin runs it.

Default: measure BOTH engines and report the champion, with the other
engine's number carried in the same JSON line (``BENCH_ENGINE=hybrid``
or ``=dprefix`` restricts to one):

  - ``dprefix`` - the device-resident scorer. Per sample the host
    performs the AVX-512 merge join and packs a positional presence
    bitmap (1 bit per k-mer start) + exact per-window count sums
    (native kcf_pack_posbits); the device executes the entire
    per-window gap-run state machine (GetVariants.java:202-261
    semantics) as batched int32 prefix scans, several samples per
    dispatch so the tunnel round trip amortizes.
  - ``hybrid`` - the pure-host path (AVX-512 merge join + fused native
    window scan).

Measured environment characteristics that decide the duel here: this
image reaches its single TPU chip through a tunnel costing ~29 ms per
dispatch+fetch round trip, 0.15-0.6 GB/s host->device, and ~4 ms of
host CPU per sample payload on a 2-core host - while the two engines
share their dominant per-sample host costs (merge join + positional
gather; the host-side scan the device replaces is only ~9 ms). On
hardware where the chip is local (PCIe DMA, no serialize tax) the
device engine's transfer cost is ~0.1 ms/sample and it wins; here the
champion is usually the host path. Both numbers are reported so the
trade is visible.

One-time per-reference work (k-mer index construction, window plan,
file ingest) is excluded - it amortizes across samples; everything
per-sample is included. Result is the best of several full sweeps.

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

from kcftools_tpu.engine.encode import canonicalize, pack_kmers
from kcftools_tpu.engine.prefix_scan import static_window_stats
from kcftools_tpu.engine.windows import tiling_windows
from kcftools_tpu.native import merge_counts_u8, window_scan_u8

GENOME_MBP = 5
K = 31
WINDOW = 5000
SNP_RATE = 0.01
N_SAMPLES = 8
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

    # per-sample tables, sorted as the KMC reader provides them
    dbs = []
    for si in range(N_SAMPLES):
        sample = genome.copy()
        snp = rng.random(n) < SNP_RATE
        sample[snp] = (sample[snp] + rng.integers(1, 4, snp.sum())) % 4
        skmers, skv = pack_kmers(sample, base_valid, K)
        db_sorted, db_counts = np.unique(
            canonicalize(skmers[skv], K), return_counts=True
        )
        dbs.append((db_sorted, db_counts.astype(np.uint32)))

    def make_dprefix_sweep():
        from kcftools_tpu.engine.device_prefix import DevicePrefixScorer

        batch = int(os.environ.get("KCFTOOLS_DEVICE_BATCH", "8"))
        scorer = DevicePrefixScorer(None, K, min_count=1, batch=batch)
        scorer.add_chrom("c", r_idx, starts, ends)

        def sweep():
            for si, (db_sorted, db_counts) in enumerate(dbs):
                scorer.submit(si, refk, db_sorted, db_counts)
            tot = 0
            for si in range(N_SAMPLES):
                res = scorer.collect(si)
                tot += int(res["c"]["observed"].sum())
                scorer.discard(si)
            return tot

        return sweep

    def hybrid_sweep():
        tot = 0
        out = hybrid_sweep.out
        for db_sorted, db_counts in dbs:
            u8, ei, ev = merge_counts_u8(refk, db_sorted, db_counts, out=out)
            res = window_scan_u8(u8, ei, ev, r_idx, 1, K, starts, w_hi)
            tot += int(res["observed"].sum())
        return tot

    hybrid_sweep.out = np.empty(refk.size, np.uint8)

    def measure(sweep, rounds=8):
        sweep()  # warm (compiles on the device path; page faults on host)
        best = 0.0
        for _ in range(rounds):  # the shared host is noisy; best-of-many
            t0 = time.time()
            sweep()
            best = max(best, N_SAMPLES * n_windows / (time.time() - t0))
        return best

    which = os.environ.get("BENCH_ENGINE", "both")
    rates = {}
    if which in ("both", "hybrid"):
        rates["hybrid"] = measure(hybrid_sweep)
    if which in ("both", "dprefix"):
        rates["dprefix"] = measure(make_dprefix_sweep())
    engine = max(rates, key=rates.get)
    best = rates[engine]

    kmers_per_window = WINDOW - K + 1
    result = {
        "metric": "windows_scored_per_sec_per_chip",
        "value": round(best, 1),
        "unit": "windows/s (5kb windows, k=31, 8 samples)",
        "vs_baseline": round(best / BASELINE_WINDOWS_PER_SEC, 2),
        "kmer_lookups_per_sec": round(best * kmers_per_window),
        "n_windows": n_windows,
        "engine": engine,
    }
    for name, rate in rates.items():
        result[f"{name}_windows_per_sec"] = round(rate, 1)
    if "dprefix" in rates:
        import jax

        result["device"] = str(jax.devices()[0])
    else:
        result["device"] = "host"
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
