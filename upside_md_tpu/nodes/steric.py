"""Backbone steric repulsion (reference: src/backbone_steric.cpp).

Per residue, up to 4 reference atoms (N, CA, C, CB) are placed by the rigid
affine frame; residue pairs with |i-j| > 1 interact through a compact
sigmoid of squared distance that is exactly zero beyond r^2 = 9.3, so the
kernel itself truncates the interaction — no neighbor list is needed on a
dense-masked TPU layout.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.geometry import quat_to_rot
from ..ops.sigmoid import compact_sigmoid
from ..ops.pairs import sequence_exclusion_mask, upper_triangle_mask
from .base import register_node

ENERGY_SCALE = 4.0
WALL2 = 3.0 * 3.0
SHARPNESS = 1.0 / (3.0 * 0.10)  # 1/(wall*width), backbone_steric.cpp:22-27


def _backbone_pairs(consts, params, inputs, extra):
    affine = inputs[0][consts["id"]]       # (n_res, 7)
    ref_pos = consts["ref_pos"]            # (n_res, 4, 3)
    atom_mask = consts["atom_mask"]        # (n_res, 4) bool: na < n_atom

    t = affine[:, 0:3]
    R = quat_to_rot(affine[:, 3:7])
    atoms = jnp.einsum('nij,naj->nai', R, jnp.asarray(ref_pos, affine.dtype)) \
        + t[:, None, :]                    # (n_res, 4, 3)

    pair_ok = sequence_exclusion_mask(consts["id"], consts["id"], 1) & \
        upper_triangle_mask(affine.shape[0])

    disp = atoms[:, None, :, None, :] - atoms[None, :, None, :, :]
    r2 = jnp.sum(disp * disp, -1)          # (n_res, n_res, 4, 4)
    v, _ = compact_sigmoid(r2 - WALL2, SHARPNESS)
    am = atom_mask[:, None, :, None] & atom_mask[None, :, None, :]
    mask = pair_ok[:, :, None, None] & am
    return ENERGY_SCALE * jnp.sum(jnp.where(mask, v, 0.0))


backbone_pairs = register_node("backbone_pairs", True, _backbone_pairs)
