"""Test config: force JAX onto a virtual 8-device CPU mesh.

Real-TPU runs happen via bench.py; tests must be hermetic and exercise
multi-chip sharding without hardware (driver dry-runs the real
multichip path via __graft_entry__.dryrun_multichip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon site config pins JAX_PLATFORMS=axon (the real-TPU tunnel);
# the config API wins over the env var, so force CPU here for hermetic,
# fast tests
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

import gstpu  # noqa: E402

gstpu.init()


@pytest.fixture
def pipeline():
    from gstpu.core.bin import Pipeline
    p = Pipeline()
    yield p
    from gstpu.core.element import State
    p.set_state(State.NULL)
