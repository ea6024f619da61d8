"""Test config: force CPU backend with 8 virtual devices so multi-chip
sharding tests run anywhere (the standard JAX fake-backend trick).

Note: env-var platform selection (JAX_PLATFORMS=cpu) is overridden by
the axon TPU plugin in some environments, so we force it through
jax.config as well.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
