"""Replica exchange (reference: src/main.cpp:140-276).

The reference swaps position arrays between OpenMP-thread systems; here the
replica ensemble is one batched array and a swap set becomes a gather plus
a masked select.  Energies are evaluated once per exchange round and
carried exactly through the swap sets (the post-swap energy of every slot
is one of the two values the Metropolis test already computed); pure
temperature exchange needs no evaluation at all when the caller passes the
energies it already has, since swapping configurations only permutes them.
Hamiltonian exchange (per-slot parameters) evaluates the swapped
configurations once per set.  On a multi-chip mesh the same code runs
under shard_map and the gathers lower to ICI collective permutes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def parse_swap_sets(strings: List[str], n_replica: int):
    """Parse '0-1,2-3' style swap-set strings with the reference's
    non-overlap validation (main.cpp:153-192)."""
    swap_sets = []
    for s in strings:
        pairs = []
        seen = set()
        for pair_str in s.split(','):
            a, b = pair_str.split('-')
            a, b = int(a), int(b)
            if a >= n_replica or b >= n_replica:
                raise ValueError(f"invalid system index in swap pair {a}-{b}")
            if a in seen or b in seen or a == b:
                raise ValueError(
                    "Overlapping indices in swap set; no replica index can "
                    "appear more than once in a swap set")
            seen.update((a, b))
            pairs.append((a, b))
        swap_sets.append(pairs)
    return swap_sets


@dataclass
class ReplicaExchange:
    swap_sets: List[List[Tuple[int, int]]]
    n_replica: int

    def permutations(self):
        perms = []
        for pairs in self.swap_sets:
            perm = np.arange(self.n_replica)
            for a, b in pairs:
                perm[a], perm[b] = perm[b], perm[a]
            perms.append(perm)
        return perms

    def attempt_swaps(self, key, pos, replica_index, beta, energy_of_pos,
                      stats=None, energies=None, slot_independent=False,
                      aux=None):
        """One exchange round over all swap sets.

        energy_of_pos: (n_rep, n_atom, 3) -> (n_rep,) energies, evaluated
        in each *slot's* Hamiltonian (vmapped energy with slot params).
        energies: optional (n_rep,) per-slot energies of `pos` (e.g. from
        the preceding force evaluation) — skips the initial evaluation.
        slot_independent: True for pure temperature exchange (every slot
        shares one Hamiltonian); swapped-configuration energies are then a
        permutation of the current ones and no re-evaluation happens at
        all.  The reference recomputes energies per swap set
        (main.cpp:251-274); carrying them forward is exact because the
        post-swap energy of each slot is one of the two values already
        evaluated for the Metropolis test.

        aux: optional pytree with leading replica axis (e.g. the per-slot
        solver warm-start cache) that travels WITH the configurations:
        swapped slots receive the swapped entries.  The reference leaves
        its BP message state with the process across exchanges (stale
        warm starts after accepted swaps); permuting the cache alongside
        keeps warm starts (and their extrapolation history) matched to
        the conformation they solved.

        Returns (pos, replica_index, stats, energies[, aux]) — aux is
        appended iff it was passed; stats accumulates (n_success,
        n_attempt) per swap pair per set and energies are the per-slot
        energies of the returned positions.
        """
        if stats is None:
            stats = [jnp.zeros((len(p), 2), jnp.int32) for p in self.swap_sets]
        if energies is None:
            energies = energy_of_pos(pos)
        new_stats = []
        for si, (pairs, perm) in enumerate(
                zip(self.swap_sets, self.permutations())):
            key, sub = jax.random.split(key)
            old_lboltz = -beta * energies
            swapped = pos[perm]
            if slot_independent:
                new_energies = energies[perm]
            else:
                new_energies = energy_of_pos(swapped)
            new_lboltz = -beta * new_energies

            pa = np.array([p[0] for p in pairs])
            pb = np.array([p[1] for p in pairs])
            ldiff = (new_lboltz[pa] + new_lboltz[pb]) - \
                (old_lboltz[pa] + old_lboltz[pb])
            u = jax.random.uniform(sub, (len(pairs),), dtype=pos.dtype)
            accept = (ldiff >= 0.0) | (jnp.exp(jnp.minimum(ldiff, 0.0)) >= u)

            # per-replica accept mask
            accept_rep = jnp.zeros((self.n_replica,), bool)
            accept_rep = accept_rep.at[pa].set(accept).at[pb].set(accept)

            pos = jnp.where(accept_rep[:, None, None], swapped, pos)
            energies = jnp.where(accept_rep, new_energies, energies)
            replica_index = jnp.where(accept_rep, replica_index[perm],
                                      replica_index)
            if aux is not None:
                aux = jax.tree.map(
                    lambda x: jnp.where(
                        accept_rep.reshape((-1,) + (1,) * (x.ndim - 1)),
                        x[perm], x), aux)
            new_stats.append(stats[si] + jnp.stack(
                [accept.astype(jnp.int32), jnp.ones_like(pa, jnp.int32)], -1))
        if aux is not None:
            return pos, replica_index, new_stats, energies, aux
        return pos, replica_index, new_stats, energies


def even_odd_swap_sets(n_replica: int):
    """The standard neighbor-exchange schedule: (0-1,2-3,...) and
    (1-2,3-4,...) — the reference generates the same via
    run_upside.swap_table2d for ladder topologies."""
    s0 = [(i, i + 1) for i in range(0, n_replica - 1, 2)]
    s1 = [(i, i + 1) for i in range(1, n_replica - 1, 2)]
    return [s0, s1] if s1 else [s0]
