#!/usr/bin/env python
"""Multi-Gbp ladder rung: a 3 Gbp, 10-contig genome screened end-to-end.

SURVEY.md section 6's ladder tops out at wheat-scale (15 Gbp); the
largest previously MEASURED run was lettuce chr3 (325 Mbp, single
contig). This harness closes the gap with a measured multi-Gbp,
multi-chromosome, multi-sample screening:

  10 contigs x 300 Mbp  ->  3.0 Gbp reference, ~2.9G distinct 31-mers
  --samples mutated samples (0.5% SNP), each a REAL KMC3 database on
  disk (~26 GB each), built with the production writer
  (io/kmc.py::write_kmc_db - chunked signatures, bounded-memory bin
  sort, streamed record emission)

Pipeline per sample (disk bounds force build -> score -> delete; only
the last sample's database is kept for device-engine reruns):

  getVariations -f window -w 50000  (streamed ingest: the ~2.9G-key
  table exceeds KCFTOOLS_SORT_CACHE_BUDGET, so the bounded-RAM slab
  merge path runs - the wheat-scale code path), per-stage timings via
  KCFTOOLS_STAGE_JSON; then cohort over all samples + findIBS
  --summary.

Peak host RAM ~85 GB during database generation (the 3G-key sort),
~55 GB during scoring (lean reference index + slab merges). Disk peak
~65 GB. Results land in <workdir>/multigbp_results.json.

    python benchmarks/multigbp_scale.py --workdir /tmp/multigbp
"""

import argparse
import json
import os
import resource
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

K = 31
WINDOW = int(os.environ.get("MULTIGBP_WINDOW", 50_000))
N_CONTIGS = int(os.environ.get("MULTIGBP_CONTIGS", 10))
CONTIG_LEN = int(os.environ.get("MULTIGBP_CONTIG_LEN", 300_000_000))
SNP = 0.005


def log(msg):
    print(f"[multigbp +{time.time() - T0:7.0f}s] {msg}", flush=True)


T0 = time.time()


def contig_codes(j):
    """Reference contig j as 2-bit codes (regenerated on demand so no
    3 GB genome array is ever held)."""
    rng = np.random.default_rng(7000 + j)
    return rng.integers(0, 4, CONTIG_LEN).astype(np.uint8)


def sample_contig_codes(i, j):
    codes = contig_codes(j)
    rng = np.random.default_rng(910_000 + 1000 * i + j)
    flip = rng.random(CONTIG_LEN) < SNP
    codes[flip] = (codes[flip] + rng.integers(1, 4, int(flip.sum()))) % 4
    return codes


def write_ref(path):
    log(f"writing reference FASTA ({N_CONTIGS} x {CONTIG_LEN:,} bp)")
    with open(path, "wb") as fh:
        for j in range(N_CONTIGS):
            bases = np.frombuffer(b"ACGT", np.uint8)[contig_codes(j)]
            fh.write(f">chr{j + 1}\n".encode())
            width = 60
            n = bases.shape[0]
            pad = (-n) % width
            rows = np.concatenate(
                [bases, np.full(pad, ord("\n"), np.uint8)]
            ).reshape(-1, width)
            out = np.full((rows.shape[0], width + 1), ord("\n"), np.uint8)
            out[:, :width] = rows
            buf = out.tobytes()
            if pad:
                buf = buf[: -(pad + 1)] + b"\n"
            fh.write(buf)
            log(f"  chr{j + 1} written")


def build_sample_db(prefix, i):
    """One sample's KMC database: canonical 31-mer multiset of the
    mutated genome, built contig-by-contig into a single preallocated
    buffer, one native radix sort (scratch released after), duplicate
    fold, then the streaming KMC writer."""
    from kcftools_tpu.engine.encode import canonicalize, pack_kmers
    from kcftools_tpu.io.kmc import write_kmc_db
    from kcftools_tpu.native import release_sort_scratch, sort_u64

    total_pos = N_CONTIGS * (CONTIG_LEN - K + 1)
    buf = np.empty(total_pos, np.uint64)
    fill = 0
    for j in range(N_CONTIGS):
        codes = sample_contig_codes(i, j)
        kmers, kv = pack_kmers(codes, np.ones(codes.shape[0], bool), K)
        del codes
        kk = canonicalize(kmers[kv], K)
        del kmers, kv
        buf[fill : fill + kk.size] = kk
        fill += kk.size
        del kk
        log(f"  s{i} chr{j + 1} packed ({fill:,} k-mers so far)")
    # keys-only native radix (no 12 GB value lane, no value scratch);
    # peak here = buf 24 + out 24 + key scratch 24 GB
    ks = sort_u64(buf[:fill])
    del buf
    release_sort_scratch()
    log(f"  s{i} sorted")
    keep = np.empty(ks.shape[0], bool)
    keep[:1] = True
    keep[1:] = ks[1:] != ks[:-1]
    uniq = ks[keep]
    # counts via the SPARSE duplicate positions (~3% at this scale):
    # each duplicate key equals its owner, so the owner's index in
    # ``uniq`` is a binary search - no 24 GB cumsum/flatnonzero lanes
    dup_keys = ks[~keep]
    del ks
    counts = np.ones(uniq.shape[0], np.uint32)
    if dup_keys.size:
        owner = np.searchsorted(uniq, dup_keys)
        del dup_keys
        np.add.at(counts, owner, 1)
        del owner
    del keep
    log(f"  s{i}: {uniq.size:,} distinct {K}-mers; writing database")
    write_kmc_db(prefix, uniq, counts, K, counter_size=2)
    n = uniq.size
    del uniq, counts
    return n


def run_cli(argv, stage_json=None, timeout=14400):
    env = dict(os.environ)
    env.setdefault("PYTHONPATH", os.pathsep.join(
        [os.path.join(os.path.dirname(__file__), "..")]
        + env.get("PYTHONPATH", "").split(os.pathsep)))
    if stage_json:
        env["KCFTOOLS_STAGE_JSON"] = stage_json
    t0 = time.time()
    subprocess.run(
        [sys.executable, "-m", "kcftools_tpu.cli"] + argv,
        check=True, env=env, stdout=subprocess.DEVNULL, timeout=timeout,
    )
    dt = time.time() - t0
    stages = None
    if stage_json and os.path.exists(stage_json):
        with open(stage_json) as fh:
            stages = json.load(fh)
        os.unlink(stage_json)
    return dt, stages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/multigbp")
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--dprefix-last", action="store_true", default=True)
    ap.add_argument("--no-dprefix", dest="dprefix_last",
                    action="store_false")
    ap.add_argument("--gen-only", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    ref = os.path.join(args.workdir, "ref.fa")
    results = {"genome_bp": N_CONTIGS * CONTIG_LEN, "k": K,
               "window": WINDOW, "n_contigs": N_CONTIGS,
               "samples": args.samples, "per_sample": []}
    rpath = os.path.join(args.workdir, "multigbp_results.json")

    def save():
        results["peak_rss_gb"] = round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 1
        )
        with open(rpath, "w") as fh:
            json.dump(results, fh, indent=1)

    if not os.path.exists(ref):
        write_ref(ref)
    kcf_dir = os.path.join(args.workdir, "kcf")
    os.makedirs(kcf_dir, exist_ok=True)

    for i in range(args.samples):
        db = os.path.join(args.workdir, f"s{i}")
        row = {"sample": f"s{i}"}
        kcf_out = os.path.join(kcf_dir, f"s{i}.kcf")
        dprefix_wanted = args.dprefix_last and i == args.samples - 1
        db_needed = not os.path.exists(kcf_out) or dprefix_wanted
        if db_needed and not os.path.exists(db + ".kmc_suf"):
            log(f"building database s{i}")
            t0 = time.time()
            row["n_keys"] = build_sample_db(db, i)
            row["gen_seconds"] = round(time.time() - t0, 1)
            log(f"s{i} database built in {row['gen_seconds']}s")
        save()
        if args.gen_only:
            results["per_sample"].append(row)
            save()
            continue
        if not os.path.exists(kcf_out):
            log(f"scoring s{i} (hybrid, streamed ingest)")
            dt, stages = run_cli(
                ["getVariations", "-r", ref, "-k", db, "-o", kcf_out,
                 "-s", f"s{i}", "-f", "window", "-w", str(WINDOW),
                 "-t", "2", "--engine", "hybrid"],
                stage_json=os.path.join(args.workdir, "stages.json"),
            )
            row["hybrid_seconds"] = round(dt, 1)
            row["hybrid_stages"] = stages
            log(f"s{i} hybrid: {dt:.0f}s ({stages})")
        if args.dprefix_last and i == args.samples - 1:
            log(f"scoring s{i} (dprefix)")
            try:
                dt, stages = run_cli(
                    ["getVariations", "-r", ref, "-k", db, "-o",
                     os.path.join(kcf_dir, f"s{i}.dprefix.kcf"),
                     "-s", f"s{i}", "-f", "window", "-w", str(WINDOW),
                     "-t", "2", "--engine", "dprefix"],
                    stage_json=os.path.join(args.workdir, "stages.json"),
                )
                row["dprefix_seconds"] = round(dt, 1)
                row["dprefix_stages"] = stages
                log(f"s{i} dprefix: {dt:.0f}s")
            except Exception as e:  # keep the rung alive
                row["dprefix_error"] = str(e)[:200]
                log(f"s{i} dprefix FAILED: {e}")
        if i < args.samples - 1:
            # disk bound: only the last database is kept
            for suf in (".kmc_pre", ".kmc_suf"):
                if os.path.exists(db + suf):
                    os.unlink(db + suf)
            log(f"s{i} database deleted (disk bound)")
        results["per_sample"].append(row)
        save()

    if not args.gen_only:
        coh = os.path.join(args.workdir, "cohort.kcf")
        t0 = time.time()
        run_cli(["cohort", "-o", coh, "-i", ",".join(
            os.path.join(kcf_dir, f"s{i}.kcf")
            for i in range(args.samples))])
        results["cohort_seconds"] = round(time.time() - t0, 1)
        t0 = time.time()
        run_cli(["findIBS", "-i", coh, "-o",
                 os.path.join(args.workdir, "ibs"), "--summary"])
        results["findibs_seconds"] = round(time.time() - t0, 1)
        log(f"cohort {results['cohort_seconds']}s, "
            f"findIBS {results['findibs_seconds']}s")
    save()
    log("DONE")
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
