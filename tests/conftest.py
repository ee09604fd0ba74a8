import os

# Must run before jax import: tests run on a virtual 8-device CPU mesh so
# sharding paths are exercised without TPU hardware. Force CPU even when
# the ambient environment points JAX at a (remote) TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# keep --engine auto on the host path by default so the e2e net stays
# fast; dedicated multichip tests opt back in by clearing this
os.environ.setdefault("KCFTOOLS_NO_DEVICE_PROBE", "1")

import jax  # noqa: E402

# sitecustomize may have imported jax already (freezing env-derived
# config), so set the config knobs directly too.
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from kcftools_tpu.utils.logger import Logger  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
