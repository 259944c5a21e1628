"""Mosaic TPU lowering guard for the Pallas kernel variants.

CPU interpret-mode tests execute kernel *semantics* but never run the
Mosaic TPU lowering, so a kernel using a primitive Mosaic cannot lower
(e.g. reduce_prod, caught on-device 2026-08-19 in the prodlog variant)
passes CI and then fails on the first real-TPU run.  jax.export with
platforms=['tpu'] runs the full Mosaic lowering on a CPU host, so every
flag-selectable kernel variant gets its lowering checked here without
TPU hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from upside_md_tpu.ops.pallas_bp import LANE, _bp_pairs_impl, _scatter_onehots


def _small_problem():
    R, nb = 24, 60
    rng = np.random.default_rng(0)
    res = np.repeat(np.arange(R), 3)[:nb]
    rot = np.concatenate([np.arange(3) for _ in range(R)])[:nb]
    nbp = -(-nb // LANE) * LANE
    S6 = jnp.asarray(_scatter_onehots(res, rot, nbp))
    S6T = jnp.asarray(np.ascontiguousarray(
        _scatter_onehots(res, rot, nbp).T))
    valid = jnp.ones((R, 6), jnp.float32)
    E1 = jnp.asarray(rng.normal(size=(2, R, 6)), jnp.float32)
    Ep = jnp.asarray(rng.normal(size=(2, nb, nb)), jnp.float32)
    Ep = Ep + jnp.swapaxes(Ep, 1, 2)
    return R, S6, S6T, valid, E1, Ep


@pytest.mark.parametrize("stacked,rb,prodlog,lockstep", [
    (0, 1, 0, 0),         # per-plane reference kernel
    (1, 1, 0, 0),         # stacked, concat tiling
    (2, 1, 0, 0),         # stacked, broadcast tiling (package default)
    (3, 1, 0, 0),         # stacked, whole-array transpose
    (2, 1, 1, 0),         # prodlog on the default variant
    (3, 1, 1, 0),
    (2, 2, 0, 0),         # replica-blocked
    (2, 2, 0, 1),         # replica-blocked, lockstep solve
])
def test_bp_kernel_variants_lower_for_tpu(stacked, rb, prodlog, lockstep):
    def f(e1, ep):
        return _bp_pairs_impl(R, 0.4, 100, 1e-4, 2, False, False,
                              stacked, rb, prodlog, lockstep, e1, ep, S6,
                              S6T, valid, None)

    # the suite runs under x64 (conftest); the kernels are f32-only on
    # real TPUs, and Mosaic cannot lower f64 casts — lower what the TPU
    # actually runs
    with jax.enable_x64(False):
        R, S6, S6T, valid, E1, Ep = _small_problem()
        jax.export.export(jax.jit(f), platforms=["tpu"])(E1, Ep)
