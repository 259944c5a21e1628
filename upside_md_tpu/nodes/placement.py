"""Placement nodes (reference: src/placement.cpp).

Place per-residue data (points / vectors / scalars) into the global frame
using the rigid frames from `affine_alignment`.  The local-frame data comes
either from a fixed per-layer table or from a Rama-dependent periodic 2D
spline.  Seven registered variants cover the signatures the reference uses
(CB placement, rotamer beads, rotamer 1-body energies, hydrophobe probes).

Points transform as R v + t, vectors as R v, scalars pass through
(placement.cpp:183-201).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.geometry import quat_to_rot, rotate_vec
from ..ops.spline import eval_periodic_bspline_2d, fit_periodic_bspline_2d
from .base import register_node
from .rama import rama_to_grid

SIG_WIDTH = {"scalar": 1, "point": 3, "vector": 3}


def _transform(signature, affine, val):
    """Apply the rigid transform componentwise according to the signature."""
    t = affine[:, 0:3]
    R = quat_to_rot(affine[:, 3:7])
    out = []
    off = 0
    for s in signature:
        w = SIG_WIDTH[s]
        v = val[:, off:off + w]
        if s == "point":
            out.append(rotate_vec(R, v) + t)
        elif s == "vector":
            out.append(rotate_vec(R, v))
        else:  # scalar
            out.append(v)
        off += w
    return jnp.concatenate(out, axis=-1)


def _fixed_placement(signature):
    def compute(consts, params, inputs, extra):
        affine = inputs[0][consts["affine_residue"]]
        val = params["placement_data"][consts["layer_index"]]
        return _transform(signature, affine, val)
    return compute


def _rama_placement(signature):
    width = sum(SIG_WIDTH[s] for s in signature)

    def compute(consts, params, inputs, extra):
        affine = inputs[0][consts["affine_residue"]]
        rama = inputs[1][consts["rama_residue"]]          # (n, 2)
        coeffs = params["coeffs"]                          # (n_layer,nx,ny,width)
        nx, ny = coeffs.shape[1], coeffs.shape[2]
        c = coeffs[consts["layer_index"]]                  # (n, nx, ny, width)
        c = jnp.moveaxis(c, -1, 1)                         # (n, width, nx, ny)
        x = rama_to_grid(rama[:, 0:1], nx)                 # (n, 1) -> broadcast
        y = rama_to_grid(rama[:, 1:2], ny)
        val, _, _ = eval_periodic_bspline_2d(
            c, jnp.broadcast_to(x, (x.shape[0], width)),
            jnp.broadcast_to(y, (y.shape[0], width)))      # (n, width)
        return _transform(signature, affine, val)
    return compute


def make_rama_placement_params(placement_data):
    """placement_data: (n_layer, nx, ny, width) raw values -> fitted coeffs."""
    data = np.asarray(placement_data, np.float64)
    coeffs = np.stack([fit_periodic_bspline_2d(data[..., d])
                       for d in range(data.shape[-1])], axis=-1)
    return {"coeffs": jnp.asarray(coeffs, jnp.float32)}


def _fixed_get_param(c, p):
    return np.asarray(p["placement_data"]).ravel()


def _fixed_set_param(c, p, flat):
    shape = np.asarray(p["placement_data"]).shape
    return c, {"placement_data": jnp.asarray(
        np.asarray(flat, np.float32).reshape(shape))}


# registration order matters: longer names first would shadow by prefix,
# so names must be prefix-free — reference guarantees this too.
placement_scalar = register_node(
    "placement_scalar", False, _rama_placement(("scalar",)))
placement_fixed_scalar = register_node(
    "placement_fixed_scalar", False, _fixed_placement(("scalar",)),
    get_param=_fixed_get_param, set_param=_fixed_set_param)
placement_point_only = register_node(
    "placement_point_only", False, _rama_placement(("point",)))
placement_fixed_point_only = register_node(
    "placement_fixed_point_only", False, _fixed_placement(("point",)),
    get_param=_fixed_get_param, set_param=_fixed_set_param)
placement_point_vector_only = register_node(
    "placement_point_vector_only", False, _rama_placement(("point", "vector")))
placement_fixed_point_vector_only = register_node(
    "placement_fixed_point_vector_only", False,
    _fixed_placement(("point", "vector")),
    get_param=_fixed_get_param, set_param=_fixed_set_param)
placement_fixed_point_vector_scalar = register_node(
    "placement_fixed_point_vector_scalar", False,
    _fixed_placement(("point", "vector", "scalar")),
    get_param=_fixed_get_param, set_param=_fixed_set_param)
