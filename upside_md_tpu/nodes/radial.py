"""Distance-spline pair potentials (reference: src/sidechain_radial.cpp).

* radial          — symmetric CB–CB clamped-spline potential with per-type-
                    pair tables; param row = [inv_dx, 16 spline knots]
* hbond_sc_radial — asymmetric variant between two coordinate sets
* contact         — explicit Go-style contact list with compact sigmoids
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.pairs import (gather_pair_params, safe_inv_dist,
                         sequence_exclusion_mask, upper_triangle_mask)
from ..ops.sigmoid import compact_sigmoid
from .base import register_node

N_KNOT_RADIAL = 16  # sidechain_radial.cpp:30


def _radial_energy(p, x1, x2, mask):
    """p: (n1,n2,1+n_knot); distance-spline energies on the pair grid.

    dist_coord = |d| * inv_dx with the reference's 1e-7 divergence guard
    (sidechain_radial.cpp:47-61); pairs beyond the spline cutoff are masked.
    """
    inv_dx = p[..., 0]
    disp = x1[:, None, :] - x2[None, :, :]
    dist2 = jnp.sum(disp * disp, -1)
    inv_dist = safe_inv_dist(dist2, eps=1e-7, mask=mask)
    dist_coord = dist2 * inv_dist * inv_dx
    n_knot = p.shape[-1] - 1
    cutoff = (n_knot - 2 - 1e-6) / inv_dx
    m = mask & (dist2 < cutoff * cutoff)
    from ..ops.spline import bspline_window_weights
    W = bspline_window_weights(dist_coord, n_knot, clamped=True)
    en = jnp.sum(W * p[..., 1:], -1)
    return jnp.where(m, en, 0.0)


def _radial(consts, params, inputs, extra):
    x = inputs[0][consts["index"], 0:3]
    p = gather_pair_params(params["interaction_param"],
                           consts["type"], consts["type"])
    mask = sequence_exclusion_mask(consts["id"], consts["id"], 2) & \
        upper_triangle_mask(x.shape[0])
    return jnp.sum(_radial_energy(p, x, x, mask))


def _ig_get_param(c, p):
    import numpy as np
    return np.asarray(p["interaction_param"]).ravel()


def _ig_set_param(c, p, flat):
    import numpy as np
    shape = np.asarray(p["interaction_param"]).shape
    q = dict(p)
    q["interaction_param"] = jnp.asarray(
        np.asarray(flat, np.float32).reshape(shape))
    return c, q


radial = register_node("radial", True, _radial,
                       get_param=_ig_get_param, set_param=_ig_set_param)


def _hbond_sc_radial(consts, params, inputs, extra):
    x1 = inputs[0][consts["index1"], 0:3]
    x2 = inputs[1][consts["index2"], 0:3]
    p = gather_pair_params(params["interaction_param"],
                           consts["type1"], consts["type2"])
    mask = sequence_exclusion_mask(consts["id1"], consts["id2"], 2)
    return jnp.sum(_radial_energy(p, x1, x2, mask))


hbond_sc_radial = register_node("hbond_sc_radial", True, _hbond_sc_radial,
                                get_param=_ig_get_param,
                                set_param=_ig_set_param)


def _contact(consts, params, inputs, extra):
    # E = sum energy_c * compact_sigmoid(|x_i-x_j| - dist_c, 1/width_c)
    # (sidechain_radial.cpp:186-203)
    x = inputs[0]
    ids = consts["id"]
    disp = x[ids[:, 0], 0:3] - x[ids[:, 1], 0:3]
    dist = jnp.sqrt(jnp.sum(disp * disp, -1))
    v, _ = compact_sigmoid(dist - params["distance"], 1.0 / params["width"])
    return jnp.sum(params["energy"] * v)


contact = register_node("contact", True, _contact)


def contact_energy_per_bead(consts, params, inputs):
    """Per-bead contact energy (half of each pair's energy on both beads):
    the reference's 'contact_energy' stream (sidechain_radial.cpp:171-183)."""
    x = inputs[0]
    ids = consts["id"]
    disp = x[ids[:, 0], 0:3] - x[ids[:, 1], 0:3]
    dist = jnp.sqrt(jnp.sum(disp * disp, -1))
    v, _ = compact_sigmoid(dist - params["distance"], 1.0 / params["width"])
    en = params["energy"] * v
    out = jnp.zeros((x.shape[0],), en.dtype)
    out = out.at[ids[:, 0]].add(0.5 * en)
    out = out.at[ids[:, 1]].add(0.5 * en)
    return out
