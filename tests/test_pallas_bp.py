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


def make_bead_problem(rng, n_res=17, max_bead_per_res=4):
    """Random bead-space pair problem with the rotamer node's structure:
    each bead belongs to one (residue, rot-slot); pair energies live on
    the upper triangle of the bead grid between different residues."""
    from upside_md_tpu.ops.pallas_bp import _scatter_onehots

    res, rot = [], []
    valid = np.zeros((n_res, MAX_ROT), bool)
    for ri in range(n_res):
        n_rot = int(rng.integers(1, MAX_ROT + 1))
        valid[ri, :n_rot] = True
        for a in range(n_rot):
            for _ in range(int(rng.integers(1, max_bead_per_res + 1))):
                res.append(ri)
                rot.append(a)
    res = np.asarray(res, np.int32)
    rot = np.asarray(rot, np.int32)
    nb = len(res)
    E1 = 2.0 * rng.normal(size=(n_res, MAX_ROT)) * valid

    tri = (np.arange(nb)[:, None] < np.arange(nb)[None, :]) & \
        (res[:, None] != res[None, :])
    # sparse contacts, like a distance cutoff would leave
    contact = tri & (rng.random((nb, nb)) < 0.08)
    E_pair = np.where(contact, 0.5 * rng.normal(size=(nb, nb)), 0.0)

    nbp = -(-nb // LANE) * LANE
    S6 = _scatter_onehots(res, rot, nbp)
    return (jnp.asarray(E1, jnp.float32), jnp.asarray(E_pair, jnp.float32),
            S6, jnp.asarray(valid), res, rot, contact)


def bead_problem_reference(E1, E_pair, res, rot, valid):
    """XLA reference: scatter the bead grid to residue 6x6 blocks exactly
    as assemble_rotamer_energies does, then solve/differentiate through
    the dense-path Bethe energy."""
    n_res, nb = E1.shape[0], E_pair.shape[0]
    onehot = jnp.zeros((nb, n_res * MAX_ROT), jnp.float32).at[
        jnp.arange(nb), jnp.asarray(res) * MAX_ROT + jnp.asarray(rot)].set(1.0)
    E2u = (onehot.T @ E_pair @ onehot).reshape(
        n_res, MAX_ROT, n_res, MAX_ROT)
    E2u = jnp.transpose(E2u, (0, 2, 1, 3))
    E2 = E2u + jnp.transpose(E2u, (1, 0, 3, 2))
    adj = jnp.ones((n_res, n_res), bool) & ~jnp.eye(n_res, dtype=bool)
    off = jnp.min(jnp.where(valid, E1, jnp.inf), axis=-1)
    pr = jnp.where(valid, jnp.exp(off[:, None] - E1), 0.0)
    P = jnp.exp(-E2)
    nbel, ebel = _bp_solve(jax.lax.stop_gradient(pr),
                           jax.lax.stop_gradient(P), adj, valid,
                           0.4, 1000, 1e-4, 2)
    return bethe_free_energy(E1, off, P, adj, valid, nbel, ebel)


def test_pairs_kernel_matches_xla(rng):
    from upside_md_tpu.ops.pallas_bp import bp_bethe_pairs

    E1, E_pair, S6, valid, res, rot, contact = make_bead_problem(rng)
    static = (E1.shape[0], 0.4, 1000, 1e-4, 2)

    def f_pl(E1_, E_pair_):
        F, _, _ = bp_bethe_pairs(static, True, False, E1_, E_pair_,
                                 jnp.asarray(S6), jnp.asarray(S6.T),
                                 valid, None)
        return F

    Fr, g_ref = jax.value_and_grad(
        lambda a, b: bead_problem_reference(a, b, res, rot, valid),
        argnums=(0, 1))(E1, E_pair)
    Fp, g_pl = jax.value_and_grad(f_pl, argnums=(0, 1))(E1, E_pair)

    assert abs(float(Fr) - float(Fp)) < 2e-3 * max(1.0, abs(float(Fr)))
    np.testing.assert_allclose(np.asarray(g_pl[0]), np.asarray(g_ref[0]),
                               atol=3e-4)
    # pair-energy gradients agree at the entries the pair kernel can feed
    # (upper triangle); identity-edge gradients elsewhere are annihilated
    # downstream by the pair kernel's cutoff mask
    tri = np.triu(np.ones(contact.shape, bool), 1) & \
        (np.asarray(res)[:, None] != np.asarray(res)[None, :])
    np.testing.assert_allclose(np.asarray(g_pl[1])[tri],
                               np.asarray(g_ref[1])[tri], atol=3e-4)


def test_pairs_kernel_stacked_matches_unstacked(rng):
    """The stacked-plane kernel computes the same sweeps and assembly as
    the per-plane kernel (same operations, same reduction order) — values,
    envelope gradients, and warm-start messages agree to roundoff."""
    from upside_md_tpu.ops import pallas_bp
    from upside_md_tpu.ops.pallas_bp import _bp_pairs_impl

    E1, E_pair, S6, valid, res, rot, contact = make_bead_problem(rng)
    S6j, S6Tj = jnp.asarray(S6), jnp.asarray(S6.T)

    # symmetric residue-pair mask of non-identity potential planes (the
    # prodlog pinning set): prodlog variants keep eb pinned to exactly
    # 1.0 off this set, while the log path converges those messages to a
    # slot-independent constant — same beliefs either way, so eb is only
    # comparable on the real set
    real = np.zeros((LANE, LANE), bool)   # padded to the kernel's plane
    bi, bj = np.nonzero(np.asarray(E_pair) != 0.0)
    real[res[bi], res[bj]] = True
    real |= real.T

    def check(outs):
        for variant in [k for k in outs if k != 0]:
            prodlog = isinstance(variant, str)
            for a, b, name in zip(outs[0], outs[variant],
                                  ("F", "G1", "dE", "nb", "eb")):
                a, b = np.asarray(a), np.asarray(b)
                if name == "eb" and prodlog:
                    r = real
                    b_off = b[..., ~r]
                    assert np.all((b_off == 1.0) | (b_off == 0.0)), \
                        f"pinned eb not exactly 1 (variant {variant})"
                    a, b = a[..., r], b[..., r]
                if name == "nb":     # cols 6/7 are solve diagnostics
                    # iteration counts must agree exactly; the final
                    # deviation only to float reorder
                    np.testing.assert_array_equal(
                        b[..., 7], a[..., 7],
                        err_msg=f"iters (variant {variant})")
                    # the residual is a max over near-converged sweeps and
                    # so reorder-sensitive; its only consumer thresholds
                    # it against tol, so 5% agreement suffices
                    np.testing.assert_allclose(
                        b[..., 6], a[..., 6], rtol=5e-2, atol=1e-6,
                        err_msg=f"deviation (variant {variant})")
                    a, b = a[..., :6], b[..., :6]
                np.testing.assert_allclose(
                    b, a, rtol=5e-5, atol=2e-5,
                    err_msg=f"{name} (variant {variant})")

    # (stacked, prodlog) variants, all against the per-plane log-path
    # reference; "pl" keys exercise the identity-message pinning +
    # lane-product node update (same fixed point, see _stacked_solve_bethe)
    cases = {0: (0, 0), 1: (1, 0), 2: (2, 0), 3: (3, 0),
             "pl2": (2, 1), "pl3": (3, 1)}
    outs = {}
    for key, (stacked, prodlog) in cases.items():
        outs[key] = _bp_pairs_impl(
            E1.shape[0], 0.4, 1000, 1e-4, 2, True, False, stacked, 1,
            prodlog, 0, E1[None], E_pair[None], S6j, S6Tj, valid, None)
    check(outs)

    # warm-start path too
    _, _, _, nb0, eb0 = outs[1]
    for key, (stacked, prodlog) in cases.items():
        outs[key] = _bp_pairs_impl(
            E1.shape[0], 0.4, 1000, 1e-4, 2, True, False, stacked, 1,
            prodlog, 0, 1.01 * E1[None], E_pair[None], S6j, S6Tj, valid,
            (nb0, eb0))
    check(outs)


def test_pairs_kernel_vmapped_and_warm(rng):
    from upside_md_tpu.ops.pallas_bp import bp_bethe_pairs

    E1, E_pair, S6, valid, res, rot, contact = make_bead_problem(rng, n_res=9)
    static = (E1.shape[0], 0.4, 1000, 1e-4, 2)
    S6j, S6Tj = jnp.asarray(S6), jnp.asarray(S6.T)

    B = 3
    E1b = jnp.stack([E1 + 0.1 * i for i in range(B)])
    Epb = jnp.stack([E_pair * (1.0 + 0.05 * i) for i in range(B)])

    def one(e1, ep):
        F, nbel, ebel = bp_bethe_pairs(static, True, False, e1, ep,
                                       S6j, S6Tj, valid, None)
        return F, (nbel, ebel)

    Fb, (nbb, ebb) = jax.vmap(one)(E1b, Epb)
    for i in range(B):
        Fi, _ = one(E1b[i], Epb[i])
        assert abs(float(Fb[i]) - float(Fi)) < 1e-4 * max(1.0, abs(float(Fi)))

    # warm start from converged messages reaches the same answer
    def one_warm(e1, ep, nb0, eb0):
        F, _, _ = bp_bethe_pairs(static, True, False, e1, ep,
                                 S6j, S6Tj, valid, (nb0, eb0))
        return F
    Fw = jax.vmap(one_warm)(E1b, Epb, nbb, ebb)
    np.testing.assert_allclose(np.asarray(Fw), np.asarray(Fb), atol=5e-3)


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


def test_pairs_kernel_replica_blocked_matches_single(rng):
    """UPSIDE_BP_RB > 1: the replica-blocked kernel batches the four exact
    scatter dots across the block but runs each replica's solve alone —
    values, envelope gradients, and warm-start messages must agree with
    the one-replica-per-step kernel to float reorder."""
    from upside_md_tpu.ops.pallas_bp import _bp_pairs_impl

    E1, E_pair, S6, valid, res, rot, contact = make_bead_problem(rng,
                                                                 n_res=11)
    S6j, S6Tj = jnp.asarray(S6), jnp.asarray(S6.T)
    B = 4
    E1b = jnp.stack([E1 + 0.05 * i for i in range(B)])
    Epb = jnp.stack([E_pair * (1.0 + 0.03 * i) for i in range(B)])

    def run(rb, init=None, prodlog=0, lockstep=0):
        return _bp_pairs_impl(E1.shape[0], 0.4, 1000, 1e-4, 2, True,
                              False, 2, rb, prodlog, lockstep, E1b, Epb,
                              S6j, S6Tj, valid, init)

    def check(a_outs, b_outs, tag):
        for a, b, name in zip(a_outs, b_outs, ("F", "G1", "dE", "nb",
                                               "eb")):
            a, b = np.asarray(a), np.asarray(b)
            if name == "nb":
                np.testing.assert_array_equal(b[..., 7], a[..., 7],
                                              err_msg=f"iters ({tag})")
                np.testing.assert_allclose(b[..., 6], a[..., 6],
                                           rtol=5e-2, atol=1e-6,
                                           err_msg=f"dev ({tag})")
                a, b = a[..., :6], b[..., :6]
            np.testing.assert_allclose(b, a, rtol=5e-5, atol=2e-5,
                                       err_msg=f"{name} ({tag})")

    base = run(1)
    for rb in (2, 4):
        check(base, run(rb), f"rb={rb} cold")
    # rb=3 does not divide 4 -> clamps to the largest divisor (2)
    check(base, run(3), "rb=3 clamped")

    _, _, _, nb0, eb0 = base
    basew = run(1, (nb0, eb0))
    for rb in (2, 4):
        check(basew, run(rb, (nb0, eb0)), f"rb={rb} warm")

    # lockstep solve: per-replica message trajectories are identical to
    # the single-replica solve (replicas are uncoupled), so iteration
    # counts recorded at first convergence must match EXACTLY; a replica
    # that converged early keeps sweeping to the block max, which can
    # only converge it further — values agree to float reorder
    for rb in (2, 4):
        check(base, run(rb, lockstep=1), f"rb={rb} lockstep cold")
        check(basew, run(rb, (nb0, eb0), lockstep=1),
              f"rb={rb} lockstep warm")
