"""kcftools-tpu: a TPU-native k-mer variation screening framework.

A from-scratch rebuild of the capabilities of kcftools
(https://github.com/sivasubramanics/kcftools, reference mounted at
/root/reference) designed TPU-first: the hot path (canonical k-mer
extraction, hash-table membership lookups, per-window gap-run scoring) runs
as a jitted JAX/XLA pipeline with optional multi-chip sharding via
``jax.sharding``; the host tier (KMC3 database ingest, FASTA/GTF/KCF I/O)
is vectorized NumPy.

Layout:
  io/        host I/O: FASTA(+faidx), KMC3 DB read/write, GTF, KCF
  engine/    device compute: 2-bit encode, hash table, window scoring
  ops/       low-level XLA/Pallas kernels
  parallel/  device-mesh sharding of the k-mer table and window batches
  plugins/   the user-facing subcommands (getVariations, cohort, findIBS...)
  utils/     logging + Java-compatible text formatting
"""

# 64-bit support: k-mer count sums and score math use float64/int64 on
# host; device code is told explicitly which dtypes to use. Enabling x64
# here keeps host<->device dtype handling consistent.
import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: pipeline shapes are stable across runs
# and first-compile latency can be large (remote-compile TPU setups).
_cache_dir = _os.environ.get(
    "KCFTOOLS_JAX_CACHE", _os.path.expanduser("~/.cache/kcftools_tpu/jax")
)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

__version__ = "0.4.0"

KCF_SOURCE = "kcftools"
