"""Hidden-Markov-model nodes (reference: src/hmm.cpp).

* fixed_hmm — forward algorithm over per-residue state energies with a
  fixed transition-energy matrix; potential = -log Z.  The reference
  hand-codes the backward pass (sens = posterior marginals, param deriv =
  expected transition counts); here both fall out of jax.grad through the
  forward scan.
* torus_dbn — von-Mises-like emission energies from (phi, psi).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import register_node


def _fixed_hmm(consts, params, inputs, extra):
    e1b = inputs[0][consts["index"]]           # (n_res, n_state)
    te = params["transition_energy"]            # (n_state, n_state)

    # Offset by the softmin-expected transition energy for numerical
    # stability (hmm.cpp:63-69).  The total potential is offset-invariant.
    e_min = jnp.min(te)
    w = jnp.exp(e_min - te)
    offset = jnp.sum(te * w) / jnp.sum(w)
    T = jnp.exp(offset - te)

    n_res = e1b.shape[0]
    pot = offset * (n_res - 1.0)

    e_min_res = jnp.min(e1b, axis=1)            # (n_res,)
    emission = jnp.exp(e_min_res[:, None] - e1b)
    pot = pot + jnp.sum(e_min_res)

    def step(carry, em):
        forward, i = carry
        forward = jnp.where(i > 0, forward @ T, forward)
        forward = forward * em
        norm = jnp.sum(forward)
        return (forward / norm, i + 1), jnp.log(norm)

    init = (jnp.ones((e1b.shape[1],), e1b.dtype), jnp.asarray(0))
    _, lognorms = jax.lax.scan(step, init, emission)
    return pot - jnp.sum(lognorms)


def hmm_energy_decomposition(consts, params, inputs):
    """(total, per-residue) potential decomposition: the reference's
    'hmm_energy' / 'hmm_energy_1body' logging streams (hmm.cpp:94-103).
    Per-residue terms sum to the potential ('missing the mutual
    information correction' in the reference's words): residue r
    contributes its emission offset minus its forward normalization, plus
    the transition offset for r > 0."""
    e1b = inputs[0][consts["index"]]
    te = params["transition_energy"]
    e_min = jnp.min(te)
    w = jnp.exp(e_min - te)
    offset = jnp.sum(te * w) / jnp.sum(w)
    T = jnp.exp(offset - te)

    e_min_res = jnp.min(e1b, axis=1)
    emission = jnp.exp(e_min_res[:, None] - e1b)

    def step(carry, em):
        forward, i = carry
        forward = jnp.where(i > 0, forward @ T, forward)
        forward = forward * em
        norm = jnp.sum(forward)
        return (forward / norm, i + 1), jnp.log(norm)

    init = (jnp.ones((e1b.shape[1],), e1b.dtype), jnp.asarray(0))
    _, lognorms = jax.lax.scan(step, init, emission)
    n_res = e1b.shape[0]
    per_res = (e_min_res - lognorms +
               offset * (jnp.arange(n_res) > 0).astype(e1b.dtype))
    return jnp.sum(per_res), per_res


def _hmm_get_param(c, p):
    return np.asarray(p["transition_energy"]).ravel().astype(np.float32)


def _hmm_set_param(c, p, flat):
    n = np.asarray(p["transition_energy"]).shape[0]
    return c, {"transition_energy":
               jnp.asarray(np.asarray(flat, np.float32).reshape(n, n))}


fixed_hmm = register_node("fixed_hmm", True, _fixed_hmm,
                          get_param=_hmm_get_param, set_param=_hmm_set_param)


def _torus_dbn(consts, params, inputs, extra):
    rama = inputs[0][consts["id"]]              # (n_res, 2)
    bp = consts["basin_param"]                   # (n_state, 6) rows:
    # [log_norm, kappa_phi, angle_phi, kappa_psi, angle_psi, kappa_cor]
    prior = params["prior_offset_energies"]      # (n_restype, n_state)

    phi, psi = rama[:, 0], rama[:, 1]
    k_phi, a_phi = bp[:, 1], bp[:, 2]
    k_psi, a_psi = bp[:, 3], bp[:, 4]
    k_cor = bp[:, 5]
    a_cor = a_phi - a_psi

    # emission energy per (residue, state): see hmm.cpp:275-314
    em = (-k_phi[None, :] * jnp.cos(phi[:, None] - a_phi[None, :])
          - k_psi[None, :] * jnp.cos(psi[:, None] - a_psi[None, :])
          + k_cor[None, :] * jnp.cos((phi - psi)[:, None] - a_cor[None, :]))
    return prior[consts["restypes"]] + bp[None, :, 0] + em


def _tdbn_get_param(c, p):
    return np.asarray(p["prior_offset_energies"]).ravel().astype(np.float32)


def _tdbn_set_param(c, p, flat):
    shape = np.asarray(p["prior_offset_energies"]).shape
    return c, {"prior_offset_energies":
               jnp.asarray(np.asarray(flat, np.float32).reshape(shape))}


torus_dbn = register_node("torus_dbn", False, _torus_dbn,
                          get_param=_tdbn_get_param,
                          set_param=_tdbn_set_param)
