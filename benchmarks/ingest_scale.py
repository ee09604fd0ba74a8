#!/usr/bin/env python
"""Bounded-RAM streaming-ingest harness (the wheat-scale path).

Generates a synthetic KMC3 database of --records unique k-mers on disk,
then streams it through the sharded table loader
(kcftools_tpu.parallel.loader) into an N-device mesh under a fixed host
staging budget, reporting pass count, keys/sec, and the peak RSS delta.
Host memory stays bounded by

    slab bytes + shards-staged-per-pass * keys-per-shard bytes

so the same code path ingests a wheat-scale table (~10^10 k-mers,
120+ GB across a pod) without any host ever holding more than its
budget: each jax.distributed process stages only the shards its own
devices hold.

--check additionally verifies, against an independent streaming pass
over the database:
  * the multi-pass plan math (passes == ceil(local shards / per-pass)),
  * per-shard checksums - every shard's key count, count sum, and
    key-limb sums match the routed expectation exactly, so no key was
    dropped, duplicated, or mis-routed across passes.

Examples:

    python benchmarks/ingest_scale.py                         # 50M smoke
    python benchmarks/ingest_scale.py --records 500000000 \\
        --budget-mb 2048 --check                              # scale run
"""

import argparse
import os
import resource
import sys
import tempfile
import time

# must precede first backend use: virtual device mesh (overriding any
# sitecustomize-pinned platform via the config API, as conftest does)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def _gen_keys(records, k, rng):
    """Sorted unique keys by construction (cumulative random gaps) -
    no global sort, so generation scales linearly in RAM and time."""
    span = (np.uint64(1) << np.uint64(2 * k)) - np.uint64(1)
    avg_gap = max(2, int(span // np.uint64(2 * records)))
    gaps = rng.integers(1, 2 * avg_gap, records, dtype=np.uint64)
    return np.cumsum(gaps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=50_000_000)
    ap.add_argument("--budget-mb", type=int, default=512)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--check", action="store_true",
                    help="Verify pass-count math and per-shard checksums")
    ap.add_argument("--keep", action="store_true",
                    help="Keep the generated DB files")
    ap.add_argument("--db", default=None,
                    help="Reuse an existing KMC DB prefix instead of "
                    "generating one (implies --keep)")
    ap.add_argument("--_generate", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args._generate:
        from kcftools_tpu.io.kmc import write_kmc_db

        rng = np.random.default_rng(0)
        kmers = _gen_keys(args.records, args.k, rng)
        counts = rng.integers(1, 60, kmers.size).astype(np.uint64)
        write_kmc_db(args._generate, kmers, counts, args.k, counter_size=1)
        return 0

    from kcftools_tpu.parallel.loader import ShardedTableLoader
    from kcftools_tpu.parallel.mesh import make_mesh

    if args.db:
        tmp = None
        prefix = args.db
        args.keep = True
    else:
        tmp = tempfile.mkdtemp(prefix="kcf_ingest_")
        prefix = os.path.join(tmp, "db")
        print(f"generating {args.records:,} unique {args.k}-mers ...")
        # generate in a child process so its RSS high-water mark does
        # not mask the ingest measurement
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
    tbl, nb_total = loader.load()
    dt = time.time() - t0
    peak = rss_mb()
    n_keys = loader.reader.total_kmers
    stats = loader.last_stats
    tbl_mb = nb_total * tbl.shape[1] * 4 / 1e6
    print(
        f"streamed {n_keys:,} k-mers into {mesh.shape['table']} shards "
        f"in {dt:.1f}s ({n_keys / dt / 1e6:.1f}M keys/s, "
        f"{db_bytes / dt / 1e6:.0f} MB/s) under a {args.budget_mb} MiB "
        f"staging budget, {stats['n_passes']} pass(es)"
    )
    print(
        f"peak RSS delta during ingest: {peak - base:.0f} MB; the "
        f"~{tbl_mb:.0f} MB table lives in device memory (on this "
        f"virtual CPU mesh that is also host RAM; on a real pod it is "
        f"HBM, and each jax.distributed process stages only its own "
        f"shards)"
    )
    assert nb_total % mesh.shape["table"] == 0
    import math

    assert stats["n_passes"] == math.ceil(
        stats["local_shards"] / stats["shards_per_pass"]
    ), stats

    if args.check:
        _check_shards(loader, tbl, nb_total, mesh)
        print("per-shard checksums: OK")

    if not args.keep and tmp is not None:
        for s in (".kmc_pre", ".kmc_suf"):
            os.unlink(prefix + s)
        os.rmdir(tmp)
    return 0


def _check_shards(loader, tbl, nb_total, mesh):
    """Independent streaming pass -> expected per-shard (key count,
    count sum, hi/lo key sums); compare against the built device table."""
    from kcftools_tpu.engine.encode import split_hi_lo
    from kcftools_tpu.engine.hashtable import BUCKET_SLOTS, bucket_hashes_np

    t_axis = mesh.shape["table"]
    nb_local = nb_total // t_axis
    k = loader.reader.kmer_length
    exp = np.zeros((t_axis, 4), np.uint64)  # keys, cnt_sum, hi_sum, lo_sum
    for kmers, counts in loader.reader.iter_slabs():
        hi, lo = split_hi_lo(np.asarray(kmers, np.uint64), k)
        h1, _ = bucket_hashes_np(hi, lo, nb_total)
        shard = (h1 // np.uint32(nb_local)).astype(np.int64)
        np.add.at(exp[:, 0], shard, 1)
        np.add.at(exp[:, 1], shard, counts.astype(np.uint64))
        np.add.at(exp[:, 2], shard, hi.astype(np.uint64))
        np.add.at(exp[:, 3], shard, lo.astype(np.uint64))

    got = np.zeros_like(exp)
    seen = set()
    for sh in tbl.addressable_shards:
        ti = (sh.index[0].start or 0) // nb_local
        if ti in seen:
            continue  # table is replicated along the data axis
        seen.add(ti)
        part = np.asarray(sh.data)  # (nb_local, 3*S): hi | lo | cnt
        S = part.shape[1] // 3
        t_hi = part[:, :S].astype(np.uint64)
        t_lo = part[:, S : 2 * S].astype(np.uint64)
        t_cnt = part[:, 2 * S :].astype(np.uint64)
        live = t_cnt != 0
        got[ti, 0] = live.sum()
        got[ti, 1] = t_cnt[live].sum()
        got[ti, 2] = t_hi[live].sum()
        got[ti, 3] = t_lo[live].sum()
    assert len(seen) == t_axis, (len(seen), t_axis)
    np.testing.assert_array_equal(got, exp)


if __name__ == "__main__":
    sys.exit(main())
