"""Non-finite-cotangent robustness of the residual fused backward.

The resid backward (ops/pallas_quadspline.py `_fused_bwd_resid_kernel`)
relies on two select-based guards rather than multiplies:

* the upstream grid cotangent is masked with `jnp.where(m, ..., 0.0)`
  before any arithmetic, because the derivative planes carry the live
  mask but a NON-FINITE upstream cotangent in a padded/cut-off slot
  would otherwise propagate (NaN * 0 = NaN) — the round-4 ADVICE
  finding;
* the coverage weight cotangents select `where(is_pair, 0, sum)` so the
  vcov SCRAP block (overwritten by pair tiles under the clamped block
  index) can hold arbitrary garbage without poisoning pair-tile rows.

These tests pin both: gradients through the fused env block must be
finite and equal to the clean-cotangent case even when the caller's
cotangent carries NaN/Inf in dead (masked or padded) grid slots.
Reference semantics: dead pairs contribute nothing to forces
(/root/reference/src/bead_interaction.h:30-84 cutoff masking).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tests.test_fused_pairs import env_args, make_env_problem, make_problem


def _grads_with_cotangent(statics, dyn, fams, poison):
    """VJP of the fused env block with a hand-built grid cotangent whose
    DEAD slots (padded rows/cols beyond the live bead count) are poisoned
    with non-finite values when `poison` is set."""
    from upside_md_tpu.ops.pallas_quadspline import fused_pair_block_env

    out, vjp = jax.vjp(
        lambda *d: fused_pair_block_env(fams, True, *statics, *d), *dyn)
    c1, c2, grid, ev = out
    n2 = dyn[4].shape[0]                       # live beads (xb rows)
    gbar = np.ones(np.asarray(grid).shape, np.asarray(grid).dtype)
    if poison:
        # padded grid band: rows/cols at and beyond the live bead count
        gbar[n2:, :] = np.nan
        gbar[:, n2:] = np.inf
        # live but masked (same-residue / lower-triangle) slots are also
        # dead in the kernel; poisoning the strict lower triangle tests
        # the mask guard, not just the padding guard
        tril = np.tril_indices(n2, k=-1)
        gbar[:n2, :n2][tril] = np.nan
        # cutoff-dead slots: mask-alive pairs beyond the distance cutoff
        # evaluate to exactly 0 in the forward; a loss with an infinite
        # gradient at grid==0 (e.g. sqrt) poisons exactly these — the
        # backward must guard by live = mask AND inside-cutoff, not the
        # mask alone (live in-cutoff slots are almost surely nonzero for
        # random tables, so grid==0 identifies the cutoff-dead set)
        dead = np.asarray(grid)[:n2, :n2] == 0.0
        blk = gbar[:n2, :n2]
        blk[dead] = np.inf
        gbar[:n2, :n2] = blk
    cots = (jnp.ones_like(c1), jnp.ones_like(c2), jnp.asarray(gbar),
            jnp.ones_like(ev))
    return vjp(cots)


@pytest.mark.parametrize("resid", ["0", "1"])
def test_nonfinite_dead_cotangents_do_not_poison_gradients(
        rng, monkeypatch, resid):
    """NaN/Inf in dead grid-cotangent slots must not reach any gradient,
    on both the recomputing and the residual backward."""
    prob = make_problem(rng, n_a=6, n_b=7, n2=11)
    envp = make_env_problem(rng, prob, n_e=5)
    fams = prob[0]
    statics, dyn = env_args(prob, envp)

    monkeypatch.setenv("UPSIDE_FUSED_RESID", resid)
    clean = _grads_with_cotangent(statics, dyn, fams, poison=False)
    poisoned = _grads_with_cotangent(statics, dyn, fams, poison=True)
    for i, (a, b) in enumerate(zip(poisoned, clean)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), f"non-finite grad argnum {i}"
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7,
                                   err_msg=f"grad argnum {i}")
