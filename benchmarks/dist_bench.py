#!/usr/bin/env python
"""Cross-process scaling: the SAME 8-device (data=2, table=4) mesh run
by one process vs by two jax.distributed processes (4 devices each).

Total devices, mesh shape, table content, and window batch are
identical; the only difference is that the two-process run's table-axis
psum and output gather cross an OS-process boundary (the DCN analog on
this single host - gRPC instead of shared memory). The reported
cross-process efficiency T_1proc / T_2proc therefore isolates exactly
the cost the >=0.8 scaling target is about: what the collective fabric
adds when the mesh spans hosts.

Prints one JSON line. Also usable as its own worker (--worker).
"""

import json
import os
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

K = 31
ROUNDS = 5


def _median(ts):
    ts = sorted(ts)
    m = len(ts) // 2
    return ts[m] if len(ts) % 2 else (ts[m - 1] + ts[m]) / 2


def _pin_cpu(n_devices):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def _workload(tmp):
    from kcftools_tpu.engine.encode import canonicalize, pack_kmers
    from kcftools_tpu.engine.pipeline import PAD_MARGIN
    from kcftools_tpu.io.kmc import write_kmc_db

    rng = np.random.default_rng(11)
    win_len = 5000
    n_windows = int(os.environ.get("KCFTOOLS_DIST_WINDOWS", "256"))
    n = win_len * n_windows
    genome = rng.integers(0, 4, size=n).astype(np.uint8)
    kmers, kv = pack_kmers(genome, np.ones(n, bool), K)
    keys, counts = np.unique(canonicalize(kmers[kv], K),
                             return_counts=True)
    prefix = os.path.join(tmp, "db")
    write_kmc_db(prefix, keys, counts.astype(np.uint32), K,
                 counter_size=1)
    Lp = win_len + PAD_MARGIN
    codes = np.zeros((n_windows, Lp), np.uint32)
    valid = np.zeros((n_windows, Lp), bool)
    for i in range(n_windows):
        codes[i, :win_len] = genome[i * win_len : (i + 1) * win_len]
        valid[i, :win_len] = True
    wl = np.full(n_windows, win_len, np.int32)
    batch = os.path.join(tmp, "batch.npz")
    np.savez(batch, codes=codes, valid=valid, win_len=wl)
    return prefix, batch, n_windows


def _timed_rounds(scorer, z):
    scorer.collect(
        scorer.score_batch_async(z["codes"], z["valid"], z["win_len"])
    )
    times = []
    for _ in range(ROUNDS):
        t0 = time.time()
        res = scorer.collect(
            scorer.score_batch_async(z["codes"], z["valid"], z["win_len"])
        )
        times.append(time.time() - t0)
    return times, res


def worker(coord, pid, db_prefix, batch_npz, out_path):
    jax = _pin_cpu(4)
    from kcftools_tpu.parallel.loader import ShardedTableLoader
    from kcftools_tpu.parallel.mesh import init_distributed, make_mesh

    init_distributed(coord, 2, int(pid))
    assert jax.device_count() == 8
    mesh = make_mesh(data=2, table=4)
    loader = ShardedTableLoader(db_prefix, mesh, slab_records=200_000)
    scorer = loader.load_scorer(min_count=1)
    z = np.load(batch_npz)
    # warm + timed rounds; block via a global gather so the timing
    # includes the cross-process collective cost
    from jax.experimental import multihost_utils

    def run():
        h, B = scorer.score_batch_async(
            z["codes"], z["valid"], z["win_len"]
        )
        full = multihost_utils.process_allgather(h, tiled=True)
        return np.asarray(full)

    run()
    times = []
    for _ in range(ROUNDS):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    with open(out_path, "w") as fh:
        fh.write(json.dumps({"times": times}))
    print("WORKER_OK", pid, flush=True)
    return 0


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        return worker(*sys.argv[2:7])

    import tempfile

    tmp = tempfile.mkdtemp(prefix="kcfdist_")
    jax = _pin_cpu(8)
    prefix, batch, n_windows = _workload(tmp)

    from kcftools_tpu.parallel.loader import ShardedTableLoader
    from kcftools_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=2, table=4)
    loader = ShardedTableLoader(prefix, mesh, slab_records=200_000)
    scorer = loader.load_scorer(min_count=1)
    z = np.load(batch)
    t1_times, res = _timed_rounds(scorer, z)
    assert int(res["observed"].sum()) > 0
    t1 = _median(t1_times)

    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    procs, outs = [], []
    for pid in range(2):
        out_path = os.path.join(tmp, f"w{pid}.json")
        outs.append(out_path)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             addr, str(pid), prefix, batch, out_path],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=500)
        if p.returncode != 0:
            sys.stderr.write(out.decode(errors="replace")[-2000:])
            raise SystemExit(f"worker {pid} failed")
    worker_times = [json.load(open(o))["times"] for o in outs]
    # the system is gated by the slower process; median over rounds,
    # and the efficiency is bounded at 1 by construction (two
    # processes on one host cannot genuinely beat one - readings
    # above 1 are run noise, which medians + the bound keep from
    # deciding the >=0.8 target either way)
    t2 = max(_median(ts) for ts in worker_times)

    print(json.dumps({
        "mode": "two_process",
        "mesh": "data=2 x table=4 (8 virtual CPU devices)",
        "n_windows": n_windows,
        "rounds": ROUNDS,
        "one_process_seconds_median": round(t1, 4),
        "one_process_seconds_min": round(min(t1_times), 4),
        "one_process_seconds_max": round(max(t1_times), 4),
        "two_process_seconds_median": round(t2, 4),
        "two_process_seconds_min": round(
            max(min(ts) for ts in worker_times), 4),
        "two_process_seconds_max": round(
            max(max(ts) for ts in worker_times), 4),
        "cross_process_efficiency": round(t1 / max(t2, t1), 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
