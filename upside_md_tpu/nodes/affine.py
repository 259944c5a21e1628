"""Rigid-body alignment node (reference: src/eig.cpp `affine_alignment`).

Per residue, computes the rigid frame (translation + quaternion) that best
aligns a reference N/CA/C geometry to the current positions, via the
largest eigenvector of the Coutsias 4x4 quaternion matrix.  The reference
solves this with a hand-SIMD Householder+QR and differentiates with
eigenvector perturbation theory; here a batched `jnp.linalg.eigh` gives
both, and XLA batches the tiny factorizations across residues.
Output width 7: (tx, ty, tz, qa, qb, qc, qd).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.geometry import rigid_alignment
from .base import register_node


def _affine_alignment(consts, params, inputs, extra):
    pos = inputs[0]
    atoms = pos[consts["atoms"]]      # (n_res, 3, 3)
    ref = consts["ref_geom"]           # (n_res, 3, 3), centered
    center, quat = rigid_alignment(atoms, jnp.asarray(ref, pos.dtype))
    return jnp.concatenate([center, quat], axis=-1)


affine_alignment = register_node("affine_alignment", False, _affine_alignment)
