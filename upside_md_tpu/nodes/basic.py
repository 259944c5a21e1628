"""Basic coordinate and spring nodes.

Reference: src/bonds.cpp (atom_pos_spring, tension, AFM, rama_coord,
dist_spring, cavity_radial, z_flat_bottom, angle_spring, dihedral_spring,
constant, slice, concat).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.geometry import dihedral, mag, mag2, wrap_angle
from .base import register_node

DUMMY_RAMA_ANGLE = -1.3963  # -80 degrees, reference bonds.cpp:220


# -- pure coordinate plumbing ------------------------------------------------

def _constant(consts, params, inputs, extra):
    return params["value"]


constant = register_node(
    "constant", False, _constant,
    get_param=lambda c, p: np.asarray(p["value"]).ravel(),
    set_param=lambda c, p, flat: (c, {"value": jnp.asarray(
        np.asarray(flat, np.float32).reshape(np.asarray(p["value"]).shape))}),
)


def _slice(consts, params, inputs, extra):
    return inputs[0][consts["id"]]


slice_node = register_node("slice", False, _slice)


def _concat(consts, params, inputs, extra):
    return jnp.concatenate(inputs, axis=0)


concat = register_node("concat", False, _concat)


# -- springs on raw positions -------------------------------------------------

def _atom_pos_spring(consts, params, inputs, extra):
    # E = sum 0.5*k*|x - x0|^2  (bonds.cpp:35-48)
    x = inputs[0][consts["id"]]
    disp = x - params["x0"]
    return 0.5 * jnp.sum(params["spring_const"] * jnp.sum(disp * disp, -1))


atom_pos_spring = register_node("atom_pos_spring", True, _atom_pos_spring)


def _tension(consts, params, inputs, extra):
    # E = -sum dot(x, tension_coeff)  (bonds.cpp:75-88)
    x = inputs[0][consts["atom"]]
    return -jnp.sum(x * params["tension_coeff"])


tension = register_node("tension", True, _tension)


def _afm(consts, params, inputs, extra):
    # constant-velocity pulling: tip moves with the force-evaluation counter
    # (bonds.cpp:148-166; the reference increments per DerivMode compute)
    n_evals = extra.get("n_deriv_evals", 0)
    t = consts.get("time_initial", 0.0) + consts.get("time_step", 0.009) * n_evals
    x = inputs[0][consts["atom"]]
    tip = params["starting_tip_pos"] + params["pulling_vel"] * t
    disp = x - tip
    return 0.5 * jnp.sum(params["spring_const"] * jnp.sum(disp * disp, -1))


afm = register_node("AFM", True, _afm)


def _dist_spring(consts, params, inputs, extra):
    # E = sum 0.5*k*(|x1-x2| - d0)^2  (bonds.cpp:297-318)
    x = inputs[0]
    x1 = x[consts["id"][:, 0]]
    x2 = x[consts["id"][:, 1]]
    d = mag(x1 - x2)
    return 0.5 * jnp.sum(params["spring_const"] * (d - params["equil_dist"]) ** 2)


dist_spring = register_node("dist_spring", True, _dist_spring)


def _cavity_radial(consts, params, inputs, extra):
    # flat inside radius, harmonic outside (bonds.cpp:350-372)
    x = inputs[0][consts["id"]]
    r2 = mag2(x)
    rad = params["radius"]
    out = r2 > rad * rad
    r = jnp.sqrt(jnp.where(out, r2, 1.0))
    excess = jnp.where(out, r - rad, 0.0)
    return 0.5 * jnp.sum(params["spring_const"] * excess * excess)


cavity_radial = register_node("cavity_radial", True, _cavity_radial)


def _z_flat_bottom(consts, params, inputs, extra):
    # flat within |z-z0|<radius, harmonic outside (bonds.cpp:407-425)
    z = inputs[0][consts["atom"], 2]
    dz = z - params["z0"]
    rad = params["radius"]
    excess = jnp.where(dz > rad, dz - rad, jnp.where(dz < -rad, dz + rad, 0.0))
    return 0.5 * jnp.sum(params["spring_const"] * excess * excess)


z_flat_bottom = register_node("z_flat_bottom", True, _z_flat_bottom)


def _angle_spring(consts, params, inputs, extra):
    # spring on the *cosine* of the angle at atom3 between atom1 and atom2
    # (bonds.cpp:457-487): E = 0.5*k*(dot(x1h,x2h) - equil)^2
    x = inputs[0]
    a1 = x[consts["id"][:, 0]]
    a2 = x[consts["id"][:, 1]]
    a3 = x[consts["id"][:, 2]]
    x1 = a1 - a3
    x2 = a2 - a3
    dp = jnp.sum(x1 * x2, -1) / (mag(x1) * mag(x2))
    return 0.5 * jnp.sum(params["spring_const"] * (dp - params["equil_dp"]) ** 2)


angle_spring = register_node("angle_spring", True, _angle_spring)


def _dihedral_spring(consts, params, inputs, extra):
    # E = 0.5*k*wrap(dihedral - equil)^2 with minimum-image wrap
    # (bonds.cpp:519-545)
    x = inputs[0]
    ids = consts["id"]
    dih = dihedral(x[ids[:, 0]], x[ids[:, 1]], x[ids[:, 2]], x[ids[:, 3]])
    disp = wrap_angle(dih - params["equil_dihedral"])
    return 0.5 * jnp.sum(params["spring_const"] * disp * disp)


dihedral_spring = register_node("dihedral_spring", True, _dihedral_spring)


# -- Ramachandran coordinates --------------------------------------------------

def _rama_coord(consts, params, inputs, extra):
    """(phi, psi) per residue from 5 atoms [prevC, N, CA, C, nextN].

    Chain-terminal dummy angles take the constant -80 degrees with zero
    derivative (bonds.cpp:190-226).  Dummy atom slots were replaced with a
    safe non-collinear fake position at read time so the unselected branch
    of the `where` cannot produce NaN gradients.
    """
    x = inputs[0]
    ids = consts["id"]          # (n_res, 5), dummies already remapped to 0
    dummy = consts["dummy"]     # (n_res, 2) bool: [phi_dummy, psi_dummy]
    a = x[ids]                  # (n_res, 5, 3)

    # Fake, non-collinear stand-ins for dummy terminal atoms so the dihedral
    # gradient stays finite in the branch that `where` discards.
    safe0 = a[:, 1] + jnp.asarray([1.3, 0.7, 0.9], dtype=x.dtype)
    safe4 = a[:, 3] + jnp.asarray([0.9, 1.3, 0.7], dtype=x.dtype)
    a0 = jnp.where(dummy[:, 0:1], safe0, a[:, 0])
    a4 = jnp.where(dummy[:, 1:2], safe4, a[:, 4])

    phi = dihedral(a0, a[:, 1], a[:, 2], a[:, 3])
    psi = dihedral(a[:, 1], a[:, 2], a[:, 3], a4)
    phi = jnp.where(dummy[:, 0], DUMMY_RAMA_ANGLE, phi)
    psi = jnp.where(dummy[:, 1], DUMMY_RAMA_ANGLE, psi)
    return jnp.stack([phi, psi], axis=-1)


rama_coord = register_node("rama_coord", False, _rama_coord)
