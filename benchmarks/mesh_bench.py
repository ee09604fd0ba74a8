#!/usr/bin/env python
"""Mesh benchmarks: sharded-lookup throughput + data-axis scaling.

Two modes, both printing one JSON line:

  --mode sharded   ShardedWindowScorer throughput (the wheat-scale
                   lookup path: on-device two-choice table, shard-local
                   placement, psum over the table axis) on whatever
                   devices the backend exposes.
  --mode scaling   Fixed TOTAL window batch pushed through meshes with
                   data axis 1,2,4,..,N. On real multi-chip hardware
                   wall-clock would drop ~1/N; on a VIRTUAL CPU mesh
                   every "device" shares the same host cores, so the
                   honest quantity is the sharding OVERHEAD: how much
                   slower the mesh program runs than the single-device
                   program on identical total work. The modeled
                   efficiency 1/(T_N/T_1) is what perfectly-scaling
                   compute would retain given that overhead - an upper
                   bound on what the emulation can certify, and the
                   right quantity to compare against the >=0.8 target
                   (ICI collectives on real chips are faster than the
                   host-memory emulation used here).

Run on the virtual mesh with:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/mesh_bench.py --mode scaling
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Some environments pin JAX_PLATFORMS from sitecustomize (running
# before this script), so a command-line env prefix is overwritten;
# KCFTOOLS_MESH_PLATFORM=cpu re-pins it here, before jax imports, the
# way tests/conftest.py does (with the 8-device virtual CPU mesh).
_plat = os.environ.get("KCFTOOLS_MESH_PLATFORM")
if _plat:
    os.environ["JAX_PLATFORMS"] = _plat
    if _plat == "cpu":
        _flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in _flags:
            os.environ["XLA_FLAGS"] = (
                _flags + " --xla_force_host_platform_device_count="
                + os.environ.get("KCFTOOLS_MESH_DEVICES", "8")
            )
    # sitecustomize may have imported jax already (freezing the
    # platform config at its env values); re-pin via the config API
    import jax

    jax.config.update("jax_platforms", _plat)


def _mk_workload(rng, k, n_keys, n_windows, win_len):
    from kcftools_tpu.engine.encode import canonicalize, pack_kmers

    n = n_windows * win_len
    genome = rng.integers(0, 4, size=n).astype(np.uint8)
    valid = np.ones(n, bool)
    kmers, kv = pack_kmers(genome, valid, k)
    canon = canonicalize(kmers, k)
    keys = np.unique(canon[kv])
    if keys.shape[0] > n_keys:
        keys = keys[:n_keys]
    counts = rng.integers(1, 4, keys.shape[0]).astype(np.uint32)
    # window batch in padded-code form
    from kcftools_tpu.engine.pipeline import PAD_MARGIN

    Lp = win_len + PAD_MARGIN
    codes = np.zeros((n_windows, Lp), np.uint32)
    vmask = np.zeros((n_windows, Lp), bool)
    for i in range(n_windows):
        seg = genome[i * win_len : (i + 1) * win_len]
        codes[i, : seg.shape[0]] = seg
        vmask[i, : seg.shape[0]] = True
    wl = np.full(n_windows, win_len, np.int32)
    return keys, counts, codes, vmask, wl


def _time_scorer(scorer, codes, vmask, wl, rounds):
    # warm (compile), then per-round times: the scaling sweeps need the
    # MEDIAN with dispersion (a best-of on a noisy 2-core host recorded
    # efficiencies above 1.0, which can't support a pass/fail call)
    scorer.score_batch(codes, vmask, wl)
    times = []
    for _ in range(rounds):
        t0 = time.time()
        res = scorer.score_batch(codes, vmask, wl)
        times.append(time.time() - t0)
    times.sort()
    med = times[len(times) // 2] if len(times) % 2 else (
        times[len(times) // 2 - 1] + times[len(times) // 2]) / 2
    return {"median": med, "min": times[0], "max": times[-1]}, res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode",
                    choices=["sharded", "scaling", "dprefix_samples"],
                    default="sharded")
    ap.add_argument("--windows", type=int, default=256)
    ap.add_argument("--win-len", type=int, default=5000)
    ap.add_argument("--keys", type=int, default=1 << 20)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--table-axis", type=int, default=0,
                    help="0 = all devices on the table axis (sharded "
                    "mode); else the table-axis size")
    args = ap.parse_args()

    import kcftools_tpu  # noqa: F401
    import jax

    from kcftools_tpu.engine.hashtable import build_table
    from kcftools_tpu.parallel.mesh import make_mesh
    from kcftools_tpu.parallel.sharded import ShardedWindowScorer

    k = 31
    rng = np.random.default_rng(7)
    n_dev = jax.device_count()
    keys, counts, codes, vmask, wl = _mk_workload(
        rng, k, args.keys, args.windows, args.win_len
    )
    n_windows = args.windows
    lookups = int(vmask[:, : args.win_len].sum())  # k-mer starts probed

    out = {"device_kind": str(jax.devices()[0]), "n_devices": n_dev,
           "n_windows": n_windows, "win_len": args.win_len,
           "table_keys": int(keys.shape[0])}

    if args.mode == "dprefix_samples":
        # sample-axis parallelism of the dprefix engine: one slab
        # (small genome), an 8-sample group, devices 1 vs N - the
        # spread splits the group's sample rows across the pool.
        # Same virtual-mesh caveat as the data-axis sweep: medians,
        # efficiency bounded at 1 by construction.
        from kcftools_tpu.engine.device_prefix import DevicePrefixScorer
        from kcftools_tpu.engine.windows import tiling_windows

        rng2 = np.random.default_rng(3)
        seq_len = 1 << 20
        n_ref = 800_000
        kk = 31
        s2, e2 = tiling_windows(seq_len, 5000, kk)
        n_pos = seq_len - kk + 1
        r_idx = rng2.integers(0, n_ref, n_pos).astype(np.int32)
        samples = [
            rng2.integers(0, 9, n_ref).astype(np.uint8) for _ in range(8)
        ]
        empty_i = np.empty(0, np.int32)
        empty_v = np.empty(0, np.uint32)

        def run_group(n_devs):
            sc = DevicePrefixScorer(
                None, kk, min_count=1, batch=8,
                devices=jax.devices()[:n_devs],
            )
            sc.add_chrom("c", r_idx, s2, e2)

            def one_round():
                for i, cu in enumerate(samples):
                    sc.submit_counts(i, cu, empty_i, empty_v)
                tot = 0
                for i in range(8):
                    tot += int(sc.collect(i)["c"]["observed"].sum())
                    sc.discard(i)
                return tot

            one_round()  # compile
            times = []
            for _ in range(args.rounds):
                t0 = time.time()
                one_round()
                times.append(time.time() - t0)
            n_spread = len(sc.sample_rows_devices())
            sc.close()
            times.sort()
            med = times[len(times) // 2] if len(times) % 2 else (
                times[len(times) // 2 - 1] + times[len(times) // 2]) / 2
            return med, times, n_spread

        t1, t1_all, _ = run_group(1)
        tn, tn_all, n_spread = run_group(n_dev)
        out.update(
            mode="dprefix_samples",
            sample_rows_devices=n_spread,
            one_device_seconds_median=round(t1, 4),
            n_device_seconds_median=round(tn, 4),
            n_device_seconds_min=round(min(tn_all), 4),
            n_device_seconds_max=round(max(tn_all), 4),
            sample_axis_efficiency=round(t1 / max(tn, t1), 4),
        )
        print(json.dumps(out))
        return 0

    if args.mode == "sharded":
        t_axis = args.table_axis or n_dev
        while n_dev % t_axis:
            t_axis -= 1
        table = build_table(keys, counts, k, both_strands=True)
        mesh = make_mesh(data=n_dev // t_axis, table=t_axis)
        scorer = ShardedWindowScorer(table, mesh, min_count=1)
        st, res = _time_scorer(scorer, codes, vmask, wl, args.rounds)
        assert int(res["observed"].sum()) > 0
        dt = st["min"]  # throughput rung: best-of (tunnel-stall robust)
        out.update(
            mode="sharded", table_axis=t_axis,
            data_axis=n_dev // t_axis,
            seconds=round(dt, 4),
            sharded_windows_per_sec=round(n_windows / dt, 1),
            sharded_lookups_per_sec=round(lookups / dt),
        )
    else:
        table = build_table(keys, counts, k, both_strands=True)

        def sweep(axis_name):
            curve = []
            t1 = None
            n = 1
            while n <= n_dev:
                if axis_name == "data":
                    mesh = make_mesh(data=n, table=1,
                                     devices=jax.devices()[:n])
                else:
                    mesh = make_mesh(data=1, table=n,
                                     devices=jax.devices()[:n])
                scorer = ShardedWindowScorer(table, mesh, min_count=1)
                st, res = _time_scorer(scorer, codes, vmask, wl,
                                       args.rounds)
                assert int(res["observed"].sum()) > 0
                if t1 is None:
                    t1 = st["median"]
                # efficiency bounded at 1 BY CONSTRUCTION: the virtual
                # mesh shares one host's cores, so a mesh program can
                # only certify the overhead it ADDS; medians keep run
                # noise from reading as >100% scaling
                eff = t1 / max(st["median"], t1)
                curve.append(
                    {
                        axis_name + "_axis": n,
                        "seconds_median": round(st["median"], 4),
                        "seconds_min": round(st["min"], 4),
                        "seconds_max": round(st["max"], 4),
                        "overhead_vs_1dev": round(
                            max(st["median"] / t1 - 1, 0.0), 4
                        ),
                        "modeled_efficiency": round(eff, 4),
                    }
                )
                n *= 2
            return curve

        out.update(
            mode="scaling",
            data_curve=sweep("data"),
            table_curve=sweep("table"),
        )

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
