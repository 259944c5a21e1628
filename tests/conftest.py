"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count); real-TPU benchmarking happens in
bench.py, not in the test suite.  float64 makes finite-difference gradient
checks meaningful (note: this JAX build evaluates transcendentals with
float32-level accuracy even under x64, so transcendental-path tolerances
are ~1e-6).

The environment may pre-register a remote TPU PJRT plugin whose
initialization costs minutes; tests force the CPU backend and drop that
plugin registration before the first computation.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from jax._src import xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def fd_grad(f, x, eps=1e-5):
    """Central-difference gradient of scalar f at x (same spirit as the
    reference's central_difference_deriviative checker,
    src/deriv_engine.cpp:291-342)."""
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    flat = x.ravel()
    gflat = g.ravel()
    for i in range(flat.size):
        xp = flat.copy(); xp[i] += eps
        xm = flat.copy(); xm[i] -= eps
        gflat[i] = (f(xp.reshape(x.shape)) - f(xm.reshape(x.shape))) / (2 * eps)
    return g


@pytest.fixture
def fd():
    return fd_grad
