"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Mirrors the multi-host test strategy in SURVEY.md §4 — the reference has no
test suite; we build the pyramid it lacks. Sharding tests use a virtual CPU
mesh (xla_force_host_platform_device_count) so they run anywhere.
"""
import os

# Must be set before jax is imported anywhere. Force-override: the host env
# pins JAX_PLATFORMS to the TPU plugin; tests run on a virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The TPU-plugin sitecustomize force-selects its platform via jax.config,
# overriding the env var — override it back. Tests always run on CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled XLA:CPU executables between modules.

    The suite compiles hundreds of distinct programs; without this the
    accumulated executables eventually segfault the CPU client late in the
    run (observed at ~157 tests). Modules rarely share compiled shapes, so
    clearing per-module costs little.
    """
    yield
    jax.clear_caches()
