"""Worker for the two-process jax.distributed test: each process owns 4
virtual CPU devices (8 global), streams ONLY its own table shards from
the shared KMC database, and scores the same window batch through the
shard_map scorer. Run by tests/test_distributed.py.

argv: coordinator_address process_id db_prefix batch_npz out_path
"""

import os
import sys


def main():
    coord, pid, db_prefix, batch_npz, out_path = sys.argv[1:6]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from kcftools_tpu.parallel.mesh import init_distributed

    init_distributed(coord, 2, int(pid))
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    import numpy as np

    from kcftools_tpu.parallel.loader import ShardedTableLoader
    from kcftools_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=2, table=4)
    loader = ShardedTableLoader(db_prefix, mesh, slab_records=701)
    # each process must stage only the shards its devices hold
    my = loader._my_shards(4)
    n_local_cols = len(my)
    scorer = loader.load_scorer(min_count=1)

    z = np.load(batch_npz)
    handle, B = scorer.score_batch_async(
        z["codes"], z["valid"], z["win_len"]
    )
    # the output is data-sharded across processes; gather it globally
    from jax.experimental import multihost_utils

    from kcftools_tpu.engine.pipeline import _unstack

    full = multihost_utils.process_allgather(handle, tiled=True)
    out = {k: v[:B] for k, v in _unstack(np.asarray(full)).items()}
    with open(out_path, "w") as fh:
        fh.write(f"local_table_columns={n_local_cols}\n")
        for key in sorted(out):
            fh.write(f"{key}={','.join(map(str, out[key].tolist()))}\n")
    print("WORKER_OK", pid, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
