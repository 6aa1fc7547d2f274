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

# persistent XLA compile cache (same dir bench.py uses; entries are
# keyed by platform so CPU test entries coexist with TPU bench ones).
# The heavy f64 loudnorm chain compiles once per machine, not per run.
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
try:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass

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
