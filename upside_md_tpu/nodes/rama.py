"""Ramachandran map potential (reference: src/rama_map_pot.cpp).

Per-residue 2D periodic spline potential on (phi, psi), layered by map id.
The parameter is the periodic B-spline coefficient table fitted (float64,
host side) from the raw map values at load; evaluation is a 4x4 gather plus
bicubic blend, vectorized across residues.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.spline import eval_periodic_bspline_2d, fit_periodic_bspline_2d
from .base import register_node


def rama_to_grid(rama, n_grid):
    """Map an angle in (-pi, pi] to spline grid coordinates [0, n_grid).

    Matches the reference scaling with its rounding paranoia
    (rama_map_pot.cpp:66-76): (angle+pi) * n * (0.5/pi - 1e-7).
    """
    scale = n_grid * (0.5 / np.pi - 1e-7)
    return (rama + np.pi) * scale


def rama_map_pot_per_residue(consts, params, inputs):
    """Per-residue map potential, the reference's 'rama_map_potential'
    logging stream (rama_map_pot.cpp:50-54)."""
    rama = inputs[0][consts["residue_id"]]
    coeffs = params["coeffs"]
    layer = consts["rama_map_id"]
    x = rama_to_grid(rama[:, 0], coeffs.shape[-2])
    y = rama_to_grid(rama[:, 1], coeffs.shape[-1])
    val, _, _ = eval_periodic_bspline_2d(coeffs[layer], x, y)
    return val


def _rama_map_pot(consts, params, inputs, extra):
    rama = inputs[0][consts["residue_id"]]   # (n_res, 2)
    coeffs = params["coeffs"]                 # (n_layer, nx, ny)
    layer = consts["rama_map_id"]             # (n_res,)
    nx = coeffs.shape[-2]
    x = rama_to_grid(rama[:, 0], nx)
    y = rama_to_grid(rama[:, 1], coeffs.shape[-1])
    val, _, _ = eval_periodic_bspline_2d(coeffs[layer], x, y)
    return jnp.sum(val)


def make_rama_map_params(rama_pot):
    """rama_pot: raw (n_layer, nx, ny) map values -> fitted coeff params."""
    coeffs = fit_periodic_bspline_2d(np.asarray(rama_pot, np.float64))
    return {"coeffs": jnp.asarray(coeffs, jnp.float32)}


def _set_param(consts, params, flat):
    raw = np.asarray(flat, np.float64).reshape(np.asarray(params["coeffs"]).shape)
    consts = dict(consts)
    consts["raw_map"] = raw
    return consts, make_rama_map_params(raw)


rama_map_pot = register_node(
    "rama_map_pot", True, _rama_map_pot,
    get_param=lambda c, p: np.asarray(c["raw_map"]).ravel(),
    set_param=_set_param,
)
