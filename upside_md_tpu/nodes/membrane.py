"""Membrane potential (reference: src/membrane_potential.cpp).

Per-restype z-profile spline on the CB position, gated by a compact sigmoid
of burial (environment coverage), plus a z-profile penalty for unpaired
HBond donors/acceptors weighted by (1-hb)^2.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.sigmoid import compact_sigmoid
from ..ops.spline import eval_clamped_interp, fit_clamped_interp_bspline
from .base import register_node


def _membrane_potential(consts, params, inputs, extra):
    cb_pos, env_cov, hbond = inputs
    restype = consts["residue_type"]

    cb_z = cb_pos[consts["cb_index"], 2]
    cb_coord = (cb_z + consts["cb_z_shift"]) * consts["cb_z_scale"]
    cb_en, _ = eval_clamped_interp(params["cb_coeff"][restype], cb_coord)

    cov = env_cov[consts["env_index"], 0]
    cover_sig, _ = compact_sigmoid(
        cov - consts["cov_midpoint"][restype],
        consts["cov_sharpness"][restype])
    pot = jnp.sum(cb_en * cover_sig)

    # unpaired-HBond z penalty: layer 0 for donors, 1 for acceptors
    hb_z = hbond[:, 2]
    hb_prob = hbond[:, 6]
    n_donor = consts["n_donor"]
    layer = (jnp.arange(hbond.shape[0]) >= n_donor).astype(jnp.int32)
    uhb_coord = (hb_z + consts["uhb_z_shift"]) * consts["uhb_z_scale"]
    uhb_en, _ = eval_clamped_interp(params["uhb_coeff"][layer], uhb_coord)
    pot = pot + jnp.sum(uhb_en * (1.0 - hb_prob) ** 2)
    return pot


def make_membrane_params(cb_energy, uhb_energy):
    """Fit the z-profile interpolating splines (host side, float64)."""
    return {
        "cb_coeff": jnp.asarray(
            fit_clamped_interp_bspline(np.asarray(cb_energy, np.float64)),
            jnp.float32),
        "uhb_coeff": jnp.asarray(
            fit_clamped_interp_bspline(np.asarray(uhb_energy, np.float64)),
            jnp.float32),
    }


membrane_potential = register_node(
    "membrane_potential", True, _membrane_potential)
