#!/usr/bin/env python
"""Bounded-RAM streaming-ingest demonstration (the wheat-scale path).

Generates a synthetic KMC3 database of --records unique k-mers on disk,
then streams it through the sharded table loader
(kcftools_tpu.parallel.loader) into an N-device mesh under a fixed host
staging budget, reporting the pass count and the peak RSS delta. Host
memory stays bounded by

    slab bytes + shards-staged-per-pass * keys-per-shard bytes

so the same code path ingests a wheat-scale table (~10^10 k-mers,
120+ GB across a pod) without any host ever holding more than its
budget: each jax.distributed process stages only the shards its own
devices hold.

Example (defaults: 50M records ~ 600 MB table, 512 MiB budget, 8
virtual devices):

    python benchmarks/ingest_scale.py
    python benchmarks/ingest_scale.py --records 200000000 --budget-mb 1024
"""

import argparse
import os
import resource
import sys
import tempfile
import time

# must precede jax import: virtual device mesh
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=50_000_000)
    ap.add_argument("--budget-mb", type=int, default=512)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--keep", action="store_true",
                    help="Keep the generated DB files")
    ap.add_argument("--_generate", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args._generate:
        from kcftools_tpu.io.kmc import write_kmc_db

        rng = np.random.default_rng(0)
        kmers = np.unique(np.sort(
            rng.integers(0, 1 << (2 * args.k), args.records,
                         dtype=np.uint64)
        ))
        counts = rng.integers(1, 60, kmers.size).astype(np.uint64)
        write_kmc_db(args._generate, kmers, counts, args.k)
        return 0

    from kcftools_tpu.parallel.loader import ShardedTableLoader
    from kcftools_tpu.parallel.mesh import make_mesh

    tmp = tempfile.mkdtemp(prefix="kcf_ingest_")
    prefix = os.path.join(tmp, "db")
    print(f"generating {args.records:,} unique {args.k}-mers ...")
    # generate in a child process so its RSS high-water mark does not
    # mask the ingest measurement
    import subprocess

    subprocess.run(
        [sys.executable, __file__, "--_generate", prefix,
         "--records", str(args.records), "--k", str(args.k)],
        check=True,
    )
    db_bytes = os.path.getsize(prefix + ".kmc_suf")
    print(f"db on disk: {db_bytes / 1e6:.0f} MB")

    import jax

    mesh = make_mesh(data=1, table=len(jax.devices()))
    base = rss_mb()
    t0 = time.time()
    loader = ShardedTableLoader(
        prefix, mesh, ram_budget_bytes=args.budget_mb << 20
    )
    scorer = loader.load_scorer(min_count=1)
    dt = time.time() - t0
    peak = rss_mb()
    tbl_mb = scorer.nb_total * 48 / 1e6
    print(
        f"streamed {loader.reader.total_kmers:,} k-mers into "
        f"{mesh.shape['table']} shards in {dt:.1f}s "
        f"({db_bytes / dt / 1e6:.0f} MB/s) under a "
        f"{args.budget_mb} MiB staging budget"
    )
    print(
        f"peak RSS delta during ingest: {peak - base:.0f} MB; the "
        f"~{tbl_mb:.0f} MB table lives in device memory (on this "
        f"virtual CPU mesh that is also host RAM; on a real pod it is "
        f"HBM, and each jax.distributed process stages only its own "
        f"shards)"
    )
    assert scorer.nb_total % mesh.shape["table"] == 0
    if not args.keep:
        for s in (".kmc_pre", ".kmc_suf"):
            os.unlink(prefix + s)
        os.rmdir(tmp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
