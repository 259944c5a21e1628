"""Upside-TPU: a TPU-native coarse-grained protein molecular dynamics framework.

A from-scratch JAX/XLA re-design of the capabilities of Upside-MD
(github.com/John-Jumper/Upside-MD).  The reference's hand-written C++
computation graph with reverse-mode sensitivities becomes a traced, jitted
JAX energy function differentiated with ``jax.grad``; its SSE pairlist
kernels become masked dense pair computations that map onto the TPU
MXU/VPU; its OpenMP replica parallelism becomes ``vmap`` within a chip and
``shard_map`` over a device mesh.

Package layout
  ops/       math kernels: uniform B-splines, dihedral geometry, sigmoids
  nodes/     the node library (energy terms + derived coordinates)
  config/    HDF5 ``.up`` system reader and programmatic builder
  md/        integrator, thermostat, Monte Carlo, replica exchange, sim loop
  parallel/  device-mesh sharding of replica ensembles
  io/        trajectory/output logging
  engine.py  Upside-compatible Python API (energy/deriv/get_output/get_sens)
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    # Honor an explicit CPU request even when the environment's
    # sitecustomize pre-registered a remote accelerator PJRT plugin that
    # force-overrides jax_platforms: a CPU-only subprocess (tests, config
    # tools) must never block on a remote-device handshake.
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge as _xb

        _xb._backend_factories.pop("axon", None)
    except Exception:  # pragma: no cover - jax internals moved
        pass

from . import nodes  # noqa: F401  (populates the node registry)
from .system import System, build_system  # noqa: F401
