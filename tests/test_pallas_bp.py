"""Fused BP+Bethe Pallas kernel (interpret mode) vs the XLA solver path:
free-energy values, envelope gradients, warm starts, and the MD cache
protocol (System.energy_and_cache)."""

import numpy as np
import jax
import jax.numpy as jnp

from upside_md_tpu.nodes.rotamer import (MAX_ROT, _bp_solve,
                                         bethe_free_energy)
from upside_md_tpu.ops.pallas_bp import LANE, bp_bethe_pallas


def make_problem(rng, R=33, edge_density=0.15):
    E1 = 2.0 * rng.normal(size=(R, MAX_ROT))
    E2p = 0.4 * rng.normal(size=(MAX_ROT * MAX_ROT, R, R))
    E2p = E2p + np.transpose(
        E2p.reshape(MAX_ROT, MAX_ROT, R, R), (1, 0, 3, 2)).reshape(
            MAX_ROT * MAX_ROT, R, R)
    adj = rng.random((R, R)) < edge_density
    adj = np.triu(adj, 1)
    adj = adj | adj.T
    valid = np.arange(MAX_ROT)[None, :] < rng.integers(1, 7, size=(R,))[:, None]
    E2p = E2p * adj[None, :, :]
    return (jnp.asarray(E1), jnp.asarray(E2p), jnp.asarray(adj),
            jnp.asarray(valid))


def xla_free_energy(E1, E2p, adj, valid, damping=0.4, max_iter=1000,
                    tol=1e-3, chunk=2):
    R = E1.shape[0]
    E2 = jnp.transpose(E2p.reshape(MAX_ROT, MAX_ROT, R, R), (2, 3, 0, 1))
    off = jnp.min(jnp.where(valid, E1, jnp.inf), axis=-1)
    pr = jnp.where(valid, jnp.exp(off[:, None] - E1), 0.0)
    P = jnp.exp(-E2)
    nb, eb = _bp_solve(jax.lax.stop_gradient(pr), jax.lax.stop_gradient(P),
                       adj, valid, damping, max_iter, tol, chunk)
    return bethe_free_energy(E1, off, P, adj, valid, nb, eb)


def test_value_and_gradients_match_xla(rng):
    E1, E2p, adj, valid = make_problem(rng)
    R = E1.shape[0]
    static = (R, 0.4, 1000, 1e-3, 2)

    def f_pl(E1_, E2p_):
        F, _, _ = bp_bethe_pallas(static, True, E1_, E2p_, adj, valid, None)
        return F

    Fr, g_ref = jax.value_and_grad(
        lambda a, b: xla_free_energy(a, b, adj, valid),
        argnums=(0, 1))(E1, E2p)
    Fp, g_pl = jax.value_and_grad(f_pl, argnums=(0, 1))(
        E1.astype(jnp.float32), E2p.astype(jnp.float32))
    assert abs(float(Fr) - float(Fp)) < 1e-3 * max(1.0, abs(float(Fr)))
    np.testing.assert_allclose(np.asarray(g_pl[0]), np.asarray(g_ref[0]),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(g_pl[1]), np.asarray(g_ref[1]),
                               atol=2e-4)


def test_warm_start_reaches_same_answer(rng):
    E1, E2p, adj, valid = make_problem(rng, R=21)
    R = E1.shape[0]
    static = (R, 0.4, 1000, 1e-4, 2)
    Fc, nb, eb = bp_bethe_pallas(static, True, E1.astype(jnp.float32),
                                 E2p.astype(jnp.float32), adj, valid, None)
    # warm start from the converged messages on a slightly perturbed problem
    E1b = E1 + 0.01
    Fw, _, _ = bp_bethe_pallas(static, True, E1b.astype(jnp.float32),
                               E2p.astype(jnp.float32), adj, valid,
                               (nb, eb))
    Fcold, _, _ = bp_bethe_pallas(static, True, E1b.astype(jnp.float32),
                                  E2p.astype(jnp.float32), adj, valid, None)
    assert abs(float(Fw) - float(Fcold)) < 5e-3

    # uniform init (the init_cache state) also converges to the same answer
    nb0 = jnp.zeros((LANE, MAX_ROT), jnp.float32).at[:R].set(
        jnp.asarray(valid, jnp.float32))
    eb0 = jnp.ones((MAX_ROT, LANE, LANE), jnp.float32)
    Fu, _, _ = bp_bethe_pallas(static, True, E1b.astype(jnp.float32),
                               E2p.astype(jnp.float32), adj, valid,
                               (nb0, eb0))
    assert abs(float(Fu) - float(Fcold)) < 5e-3


def test_energy_and_cache_protocol(rng):
    """The XLA rotamer path threads warm-start messages through
    System.energy_and_cache without changing the energy."""
    from tests.test_rotamer import make_bead_system
    from upside_md_tpu.system import build_system

    specs, beads, e1, consts, table = make_bead_system(
        rng, [3, 6, 3, 6], spread=6.0)
    sys = build_system(1, specs)
    params = sys.make_params()
    pos = jnp.zeros((1, 3))

    e_plain = float(sys.energy(pos, params))
    cache0 = sys.init_cache()
    assert any(k for k in cache0), "rotamer node should register a cache"
    e1_, cache1 = sys.energy_and_cache(pos, params, cache=cache0)
    e2_, cache2 = sys.energy_and_cache(pos, params, cache=cache1)
    assert abs(float(e1_) - e_plain) < 1e-3
    assert abs(float(e2_) - e_plain) < 1e-3
    # cache structure is stable (fori_loop carry requirement)
    assert jax.tree.structure(cache1) == jax.tree.structure(cache2)
    for a, b in zip(jax.tree.leaves(cache1), jax.tree.leaves(cache2)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_md_with_cache_matches_plain_energy(rng):
    """A short MD advance threads the cache; energies along the way stay
    finite and the cache-threaded energy equals the stateless energy."""
    from tests.test_rotamer import make_bead_system
    from upside_md_tpu.md.sim import Simulation
    from upside_md_tpu.system import build_system

    specs, beads, e1, consts, table = make_bead_system(
        rng, [3, 3, 6], spread=6.0)
    # add a harmonic tether so positions actually move the energy
    sys = build_system(4, specs)
    params = sys.make_params()
    sim = Simulation(sys, dt=0.005, do_recenter=False)
    state = sim.initial_state(jnp.zeros((4, 3)), params, seed=0,
                              temperature=0.5)
    state2 = sim.advance(state, params, 3)
    assert state2.round_num == 3
    e_cached, _ = sys.energy_and_cache(state2.pos, params,
                                       cache=state2.cache)
    e_plain = sys.energy(state2.pos, params)
    assert np.isfinite(float(e_plain))
    assert abs(float(e_cached) - float(e_plain)) < 1e-3
