"""Test configuration: CPU backend with 8 virtual devices + float64.

Mirrors the reference's kernel-equivalence strategy (SURVEY.md §4): the
same computation must agree across engines (numpy brute force vs XLA scan
vs Pallas-interpret) and across shardings (1 vs 8 virtual devices).

NOTE: in this environment a sitecustomize hook imports jax and registers a
remote TPU platform before conftest runs, so the platform must be forced
via jax.config (env vars are too late), and XLA_FLAGS must be extended
before the first backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_compiler_state():
    """Clear JAX's compilation caches after every test module.

    The XLA CPU compiler intermittently segfaults/aborts inside
    backend_compile after ~200+ accumulated jit compilations in one
    process (observed twice at the same downstream test while the suite
    grew); bounding the cached-executable population keeps the full
    suite stable. Costs cross-module recompiles only (modules rarely
    share shapes).
    """
    yield
    jax.clear_caches()
