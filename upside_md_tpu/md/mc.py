"""Monte Carlo move samplers (reference: src/monte_carlo_sampler.cpp).

* PivotSampler — draw a (phi, psi) bin from a per-restype Rama proposal
  distribution and rigidly rotate the downstream chain about the
  phi (CA-N) and psi (C-CA) axes.
* JumpSampler — rigid translation or rotation of whole chains.

Each Metropolis step performs two full (jitted) energy evaluations and a
masked accept/revert; under vmap every replica proposes independently.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import axis_angle_to_rot, dihedral, normalized


@dataclass
class PivotSampler:
    rama_atom: np.ndarray      # (n_pivot, 5) prevC,N,CA,C,nextN
    pivot_range: np.ndarray    # (n_pivot, 2) rotated atom range
    restype: np.ndarray        # (n_pivot,)
    proposal_pot: np.ndarray   # (n_layer, n_bin, n_bin) -log prob (normalized)
    proposal_cdf: np.ndarray   # (n_layer, n_bin*n_bin)

    @classmethod
    def from_tables(cls, rama_atom, pivot_range, restype, proposal_pot):
        """Normalize the proposal table like the reference constructor
        (monte_carlo_sampler.cpp:61-77)."""
        pot = np.asarray(proposal_pot, np.float64)
        n_layer, n_bin, _ = pot.shape
        flat = pot.reshape(n_layer, -1)
        prob = np.exp(-flat)
        cdf = np.cumsum(prob, axis=1)
        total = cdf[:, -1:]
        cdf = cdf / total
        cdf[:, -1] = 1.0
        flat = flat + np.log(total)
        return cls(np.asarray(rama_atom, np.int32),
                   np.asarray(pivot_range, np.int32),
                   np.asarray(restype, np.int32),
                   flat.reshape(n_layer, n_bin, n_bin).astype(np.float32),
                   cdf.astype(np.float32))

    def propose(self, key, pos):
        n_pivot = self.rama_atom.shape[0]
        n_bin = self.proposal_pot.shape[1]
        u = jax.random.uniform(key, (4,), dtype=pos.dtype)

        loc = jnp.minimum((n_pivot * u[2]).astype(jnp.int32), n_pivot - 1)
        atom = jnp.asarray(self.rama_atom)[loc]
        rng_lo = jnp.asarray(self.pivot_range)[loc, 0]
        rng_hi = jnp.asarray(self.pivot_range)[loc, 1]
        layer = jnp.asarray(self.restype)[loc]

        cdf = jnp.asarray(self.proposal_cdf)[layer]
        pivot_bin = jnp.searchsorted(cdf, u[3])
        pivot_bin = jnp.minimum(pivot_bin, n_bin * n_bin - 1)
        pot = jnp.asarray(self.proposal_pot)[layer].reshape(-1)
        new_lprob = pot[pivot_bin]

        phi_bin = pivot_bin // n_bin
        psi_bin = pivot_bin % n_bin
        # half-bin shift: left-most bin center at -pi (mc_sampler.cpp:102-104)
        new_rama = (2.0 * jnp.pi / n_bin) * jnp.stack(
            [phi_bin + u[0] - 0.5, psi_bin + u[1] - 0.5]) - jnp.pi

        prevC, N, CA, C, nextN = [pos[atom[i]] for i in range(5)]
        old_phi = dihedral(prevC, N, CA, C)
        old_psi = dihedral(N, CA, C, nextN)

        def old_bin(angle):
            b = ((angle + jnp.pi) * (0.5 / jnp.pi) * n_bin + 0.5).astype(jnp.int32)
            return jnp.where(b >= n_bin, 0, b)

        old_lprob = jnp.asarray(self.proposal_pot)[
            layer, old_bin(old_phi), old_bin(old_psi)]

        d_phi = new_rama[0] - old_phi
        d_psi = new_rama[1] - old_psi
        phi_U = axis_angle_to_rot(d_phi, normalized(CA - N))
        psi_U = axis_angle_to_rot(d_psi, normalized(C - CA))

        idx = jnp.arange(pos.shape[0])
        move = ((idx >= rng_lo) & (idx < rng_hi)) | (idx == atom[3]) | \
            (idx == atom[4])

        after_psi = C + (pos - C) @ psi_U.T
        after_phi = CA + (after_psi - CA) @ phi_U.T
        new_pos = jnp.where(move[:, None], after_phi, pos)
        return new_pos, new_lprob - old_lprob


@dataclass
class JumpSampler:
    atom_range: np.ndarray    # (n_chain, 2)
    sigma_trans: np.ndarray   # (n_chain,)
    sigma_rot: np.ndarray     # (n_chain,)

    def propose(self, key, pos):
        n_chain = self.atom_range.shape[0]
        k1, k2, k3 = jax.random.split(key, 3)
        u = jax.random.uniform(k1, (2,), dtype=pos.dtype)
        move_type = (2.0 * u[0]).astype(jnp.int32)       # 0 trans, 1 rot
        chain = jnp.minimum((n_chain * u[1]).astype(jnp.int32), n_chain - 1)
        lo = jnp.asarray(self.atom_range)[chain, 0]
        hi = jnp.asarray(self.atom_range)[chain, 1]
        idx = jnp.arange(pos.shape[0])
        in_chain = (idx >= lo) & (idx < hi)
        nsel = jnp.sum(in_chain).astype(pos.dtype)

        st = jnp.asarray(self.sigma_trans, pos.dtype)[chain]
        sr = jnp.asarray(self.sigma_rot, pos.dtype)[chain]

        disp = st / jnp.sqrt(3.0) * jax.random.normal(k2, (3,), pos.dtype)
        trans_pos = jnp.where(in_chain[:, None], pos + disp, pos)

        r = jax.random.normal(k3, (4,), pos.dtype)
        angle = sr * r[0]
        axis = r[1:4] / (jnp.linalg.norm(r[1:4]) + 1e-16)
        U = axis_angle_to_rot(angle, axis)
        com = jnp.sum(jnp.where(in_chain[:, None], pos, 0.0), 0) / nsel
        rot_pos = jnp.where(in_chain[:, None],
                            com + (pos - com) @ U.T, pos)

        return jnp.where(move_type == 0, trans_pos, rot_pos), jnp.asarray(
            0.0, pos.dtype)


def metropolis_step(key, pos, temperature, energy_fn, sampler):
    """One propose/accept cycle (monte_carlo_sampler.cpp:255-284).
    Returns (pos', accepted)."""
    k_prop, k_acc = jax.random.split(key)
    e_old = energy_fn(pos)
    new_pos, delta_lprob = sampler.propose(k_prop, pos)
    e_new = energy_fn(new_pos)
    lboltz = delta_lprob - (e_new - e_old) / temperature
    u = jax.random.uniform(k_acc, dtype=pos.dtype)
    accept = (lboltz >= 0.0) | (jnp.exp(jnp.minimum(lboltz, 0.0)) >= u)
    return jnp.where(accept, new_pos, pos), accept
