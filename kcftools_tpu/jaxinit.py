"""JAX runtime configuration, applied on first import of any
device-tier module (the host tier never imports JAX - keeping the
stream subcommands and the hybrid engine free of the multi-second JAX
startup cost).

64-bit support: k-mer count sums and score math use float64/int64 on
host; device code is told explicitly which dtypes to use. Enabling x64
keeps host<->device dtype handling consistent.
"""

import os as _os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: pipeline shapes are stable across runs
# and first-compile latency can be large (remote-compile TPU setups).
_cache_dir = _os.environ.get(
    "KCFTOOLS_JAX_CACHE", _os.path.expanduser("~/.cache/kcftools_tpu/jax")
)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
