"""Test configuration: force an 8-device virtual CPU platform so sharding
and data-parallel tests run anywhere (the real TPU pod is not available in
CI). Must run before jax is imported anywhere."""

import os
import sys

# the session env pre-sets JAX_PLATFORMS=axon (single real TPU); tests must
# run on the virtual 8-device CPU platform, so force-override
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# jax may already be imported by a pytest plugin (its config snapshots the
# env at import time), so set the config values directly as well
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: the XLA_FLAGS path above covers it

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
