"""Test configuration: CPU backend with 8 virtual devices, float64 on.

The driver provides one real TPU chip only; multi-chip sharding is validated
on a virtual 8-device CPU mesh per the project conventions.  Float64 is
required for GSL double-precision parity targets (1e-10 triangulated eval,
1e-8 RBF weights — BASELINE.md).
"""

import os

# GSI_TEST_TPU=1 keeps the real TPU backend (for the opt-in on-hardware
# tests, e.g. tests/test_pallas_tpu.py); the default suite runs CPU f64.
_ON_TPU = os.environ.get("GSI_TEST_TPU") == "1"

# Must run before jax import / backend init.
if not _ON_TPU:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    # Keep CPU-backend test compiles out of the repo's TPU compile cache
    # (.jax_cache ships TPU executables; mixing in CPU AOT entries triggers
    # machine-feature mismatch warnings on other hosts).
    os.environ.setdefault(
        "GSI_TPU_CACHE_DIR", os.path.expanduser("~/.cache/gsi_cpu_xla")
    )

import jax  # noqa: E402

if not _ON_TPU:
    # The env var alone is not honored under the axon TPU plugin; force it.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    import numpy as np
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8])
    assert devs.size == 8, "expected 8 virtual CPU devices"
    return Mesh(devs, ("dp",))
