"""Fused coverage+coverage+pair kernel (interpret mode) vs the separate
kernels and the XLA formulation (nodes/fusion.py, fused_pair_block)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upside_md_tpu.ops.pairs import quadspline_coverage
from upside_md_tpu.ops.pallas_quadspline import fused_pair_block


def unit_rows(rng, n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def make_problem(rng, n_a=9, n_b=13, n2=21, ka=8, kc=7, kp=9):
    def table(A, B, k):
        return jnp.asarray(0.3 * rng.normal(size=(A, B, 2 * ka + 2 * k)))

    tab1, tab2, tab3 = table(2, 5, kc), table(3, 5, kc), table(5, 5, kp)
    t1a = jnp.asarray(rng.integers(0, 2, n_a), jnp.int32)
    t1b = jnp.asarray(rng.integers(0, 3, n_b), jnp.int32)
    tc = jnp.asarray(rng.integers(0, 5, n2), jnp.int32)

    def sites(n, spread):
        return jnp.asarray(np.concatenate(
            [spread * rng.normal(size=(n, 3)), unit_rows(rng, n)], axis=1))

    x1a, x1b, xb = sites(n_a, 3.0), sites(n_b, 3.0), sites(n2, 3.0)
    w1a = jnp.asarray(rng.uniform(0.1, 1.0, n_a))
    w1b = jnp.asarray(rng.uniform(0.1, 1.0, n_b))
    ma = jnp.asarray(rng.random((n_a, n2)) > 0.2)
    mb = jnp.asarray(rng.random((n_b, n2)) > 0.2)
    res = rng.integers(0, 8, n2)
    mc = jnp.asarray((np.arange(n2)[:, None] < np.arange(n2)[None, :])
                     & (res[:, None] != res[None, :]))
    fams = ((ka, kc, 1.0), (ka, kp, 1.0))
    return (fams, tab1, tab2, tab3, t1a, t1b, tc, ma, mb, mc,
            x1a, w1a, x1b, w1b, xb)


def reference_outputs(fams, tab1, tab2, tab3, t1a, t1b, tc, ma, mb, mc,
                      x1a, w1a, x1b, w1b, xb):
    """The three results via the plain XLA formulation."""
    from upside_md_tpu.ops.pairs import gather_pair_params
    (ka, kc, inv_dx), (_, kp, _) = fams

    def cov(tab, t1, x1, w, mask, k):
        p = gather_pair_params(tab, t1, tc)
        v = quadspline_coverage(p, x1[:, :3], x1[:, 3:6], xb[:, :3],
                                xb[:, 3:6], ka, k, inv_dx, mask)
        disp = xb[None, :, :3] - x1[:, None, :3]
        d2 = jnp.sum(disp ** 2, -1)
        cut = (k - 2 - 1e-6) / inv_dx
        v = jnp.where(d2 < cut * cut, v, 0.0)
        return jnp.sum(w[:, None] * v, axis=0)

    c1 = cov(tab1, t1a, x1a, w1a, ma, kc)
    c2 = cov(tab2, t1b, x1b, w1b, mb, kc)
    p = gather_pair_params(tab3, tc, tc)
    grid = quadspline_coverage(p, xb[:, :3], xb[:, 3:6], xb[:, :3],
                               xb[:, 3:6], ka, kp, inv_dx, mc)
    disp = xb[None, :, :3] - xb[:, None, :3]
    d2 = jnp.sum(disp ** 2, -1)
    cut = (kp - 2 - 1e-6) / inv_dx
    grid = jnp.where(d2 < cut * cut, grid, 0.0)
    return c1, c2, grid


def full_args(prob):
    (fams, tab1, tab2, tab3, t1a, t1b, tc, ma, mb, mc,
     x1a, w1a, x1b, w1b, xb) = prob
    statics = (tab1, tab2, tab3, t1a, t1b, tc, tc, tc, tc, ma, mb, mc)
    dyn = (x1a, w1a, x1b, w1b, xb)
    return statics, dyn


def test_fused_matches_separate(rng):
    prob = make_problem(rng)
    fams = prob[0]
    statics, dyn = full_args(prob)
    c1f, c2f, gf = fused_pair_block(fams, True, *statics, *dyn)
    c1r, c2r, gr = reference_outputs(*prob)
    np.testing.assert_allclose(np.asarray(c1f), np.asarray(c1r),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(c2f), np.asarray(c2r),
                               rtol=2e-4, atol=2e-6)
    # the grid comes back at its padded 128-aligned kernel layout with
    # exact zeros beyond the real beads (the BP kernel consumes it as-is)
    gf = np.asarray(gf)
    n2 = np.asarray(gr).shape[0]
    assert np.all(gf[n2:] == 0.0) and np.all(gf[:, n2:] == 0.0)
    np.testing.assert_allclose(gf[:n2, :n2], np.asarray(gr),
                               rtol=2e-4, atol=2e-6)


def test_fused_gradients_match(rng):
    prob = make_problem(rng, n_a=6, n_b=7, n2=11)
    fams = prob[0]
    statics, dyn_t = full_args(prob)

    def loss_fused(x1a, w1a, x1b, w1b, xb):
        c1, c2, g = fused_pair_block(fams, True, *statics, x1a, w1a,
                                     x1b, w1b, xb)
        return (jnp.sum(jnp.sin(c1)) + 2.0 * jnp.sum(jnp.cos(c2))
                + jnp.sum(g * g))

    def loss_ref(x1a, w1a, x1b, w1b, xb):
        c1, c2, g = reference_outputs(fams, *prob[1:10], x1a, w1a, x1b,
                                      w1b, xb)
        return (jnp.sum(jnp.sin(c1)) + 2.0 * jnp.sum(jnp.cos(c2))
                + jnp.sum(g * g))

    gf = jax.grad(loss_fused, argnums=tuple(range(5)))(*dyn_t)
    gr = jax.grad(loss_ref, argnums=tuple(range(5)))(*dyn_t)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-6)


def test_fused_table_gradients(rng):
    prob = make_problem(rng, n_a=6, n_b=7, n2=11)
    fams = prob[0]
    statics, dyn = full_args(prob)

    def loss_fused(tab1, tab2, tab3):
        c1, c2, g = fused_pair_block(fams, True, tab1, tab2, tab3,
                                     *statics[3:], *dyn)
        return jnp.sum(c1) - jnp.sum(c2) + jnp.sum(g)

    def loss_ref(tab1, tab2, tab3):
        c1, c2, g = reference_outputs(fams, tab1, tab2, tab3,
                                      *prob[4:])
        return jnp.sum(c1) - jnp.sum(c2) + jnp.sum(g)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(*prob[1:4])
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(*prob[1:4])
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-6)


def test_fused_vmapped(rng):
    prob = make_problem(rng, n_a=6, n_b=7, n2=11)
    fams = prob[0]
    statics, dyn_t = full_args(prob)
    B = 3
    dyn = [jnp.stack([x + 0.01 * i for i in range(B)]) for x in dyn_t]

    out = jax.vmap(lambda *d: fused_pair_block(fams, True, *statics, *d))(
        *dyn)
    for i in range(B):
        one = fused_pair_block(fams, True, *statics,
                               *[d[i] for d in dyn])
        for a, b in zip(out, one):
            np.testing.assert_allclose(np.asarray(a[i]), np.asarray(b),
                                       rtol=1e-4, atol=2e-6)


@pytest.mark.skipif(
    not os.path.exists("/root/reference/parameters/ff_1/sidechain.h5"),
    reason="reference parameters not mounted")
def test_system_level_fusion(rng, monkeypatch):
    """Full forcefield: the fused path (forced via UPSIDE_FORCE_FUSED,
    interpret mode) must reproduce the unfused energies and forces."""
    from upside_md_tpu.bench_systems import TRP_CAGE, build_full_system

    system, params, pos, aux = build_full_system(seq=TRP_CAGE)
    assert system.pair_fusion is not None, "fusion plan expected"
    pos = jnp.asarray(pos)

    e0, g0 = jax.value_and_grad(system.energy)(pos, params)
    monkeypatch.setenv("UPSIDE_FORCE_FUSED", "1")
    e1, g1 = jax.value_and_grad(system.energy)(pos, params)
    # identical graph except kernel partitioning; BP tolerance bounds the
    # residual difference
    np.testing.assert_allclose(float(e1), float(e0), rtol=2e-4)
    den = np.sqrt(np.mean(np.asarray(g0) ** 2))
    err = np.sqrt(np.mean((np.asarray(g1) - np.asarray(g0)) ** 2)) / den
    assert err < 2e-3, err


# --- environment-coverage band (fused_pair_block_env) -----------------------

def make_env_problem(rng, prob, n_e=7):
    """Env-band inputs sharing prob's bead columns."""
    n2 = prob[14].shape[0]
    tab4 = np.zeros((3, 4, 4))
    tab4[:, :, 0] = rng.uniform(1.0, 4.0, (3, 4))     # r0
    tab4[:, :, 1] = rng.uniform(0.5, 2.0, (3, 4))     # r_sharp
    tab4[:, :, 2] = rng.uniform(-0.5, 0.5, (3, 4))    # dot0
    tab4[:, :, 3] = rng.uniform(0.5, 2.0, (3, 4))     # dot_sharp
    tab4 = jnp.asarray(tab4)
    t1e = jnp.asarray(rng.integers(0, 3, n_e), jnp.int32)
    t2e = jnp.asarray(rng.integers(0, 4, n2), jnp.int32)
    me = jnp.asarray(rng.random((n_e, n2)) > 0.2)
    x1e = jnp.asarray(np.concatenate(
        [3.0 * rng.normal(size=(n_e, 3)), unit_rows(rng, n_e)], axis=1))
    wcol = jnp.asarray(rng.uniform(0.1, 1.5, n2))
    return tab4, t1e, t2e, me, x1e, wcol


def env_args(prob, envp):
    (fams, tab1, tab2, tab3, t1a, t1b, tc, ma, mb, mc,
     x1a, w1a, x1b, w1b, xb) = prob
    tab4, t1e, t2e, me, x1e, wcol = envp
    # like full_args: t2 = tc for all three quadspline tables
    statics = (tab1, tab2, tab3, tab4, t1a, t1b, tc, t1e,
               tc, tc, tc, t2e, ma, mb, mc, me)
    dyn = (x1a, w1a, x1b, w1b, xb, x1e, wcol)
    return statics, dyn


def env_reference(envp, xb):
    from upside_md_tpu.ops.pallas_quadspline import _env_xla_rowsums
    tab4, t1e, t2e, me, x1e, wcol = envp
    return _env_xla_rowsums(tab4, t1e, t2e, me, x1e, wcol, xb)


def test_fused_env_matches_xla(rng):
    from upside_md_tpu.ops.pallas_quadspline import fused_pair_block_env
    prob = make_problem(rng)
    envp = make_env_problem(rng, prob)
    fams = prob[0]
    statics, dyn = env_args(prob, envp)
    c1f, c2f, gf, envf = fused_pair_block_env(fams, True, *statics, *dyn)
    c1r, c2r, gr = reference_outputs(*prob)
    envr = env_reference(envp, prob[14])
    np.testing.assert_allclose(np.asarray(c1f), np.asarray(c1r),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(c2f), np.asarray(c2r),
                               rtol=2e-4, atol=2e-6)
    gf = np.asarray(gf)
    n2 = np.asarray(gr).shape[0]
    assert np.all(gf[n2:] == 0.0) and np.all(gf[:, n2:] == 0.0)
    np.testing.assert_allclose(gf[:n2, :n2], np.asarray(gr),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(envf), np.asarray(envr),
                               rtol=1e-5, atol=1e-7)
    assert np.any(np.asarray(envr) != 0.0)


def test_fused_env_gradients(rng):
    from upside_md_tpu.ops.pallas_quadspline import fused_pair_block_env
    prob = make_problem(rng, n_a=6, n_b=7, n2=11)
    envp = make_env_problem(rng, prob, n_e=5)
    fams = prob[0]
    statics, dyn = env_args(prob, envp)

    def loss_fused(x1a, w1a, x1b, w1b, xb, x1e, wcol):
        c1, c2, g, ev = fused_pair_block_env(
            fams, True, *statics, x1a, w1a, x1b, w1b, xb, x1e, wcol)
        return (jnp.sum(jnp.sin(c1)) + 2.0 * jnp.sum(jnp.cos(c2))
                + jnp.sum(g * g) + jnp.sum(jnp.sin(2.0 * ev)))

    def loss_ref(x1a, w1a, x1b, w1b, xb, x1e, wcol):
        c1, c2, g = reference_outputs(fams, *prob[1:10], x1a, w1a, x1b,
                                      w1b, xb)
        tab4, t1e, t2e, me = envp[0], envp[1], envp[2], envp[3]
        ev = env_reference((tab4, t1e, t2e, me, x1e, wcol), xb)
        return (jnp.sum(jnp.sin(c1)) + 2.0 * jnp.sum(jnp.cos(c2))
                + jnp.sum(g * g) + jnp.sum(jnp.sin(2.0 * ev)))

    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*dyn)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*dyn)
    for i, (a, b) in enumerate(zip(gf, gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-6,
                                   err_msg=f"grad argnum {i}")


def test_fused_env_table_gradient(rng):
    from upside_md_tpu.ops.pallas_quadspline import fused_pair_block_env
    prob = make_problem(rng, n_a=6, n_b=7, n2=11)
    envp = make_env_problem(rng, prob, n_e=5)
    fams = prob[0]
    statics, dyn = env_args(prob, envp)

    def loss_fused(tab4):
        st = (statics[0], statics[1], statics[2], tab4) + statics[4:]
        out = fused_pair_block_env(fams, True, *st, *dyn)
        return jnp.sum(out[3])

    def loss_ref(tab4):
        ev = env_reference((tab4,) + envp[1:4] + (envp[4], envp[5]),
                           prob[14])
        return jnp.sum(ev)

    gf = jax.grad(loss_fused)(envp[0])
    gr = jax.grad(loss_ref)(envp[0])
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=3e-4, atol=3e-6)


def test_fused_env_vmapped(rng):
    from upside_md_tpu.ops.pallas_quadspline import fused_pair_block_env
    prob = make_problem(rng, n_a=6, n_b=7, n2=11)
    envp = make_env_problem(rng, prob, n_e=5)
    fams = prob[0]
    statics, dyn_t = env_args(prob, envp)
    B = 3
    dyn = [jnp.stack([x + 0.01 * i for i in range(B)]) for x in dyn_t]
    out = jax.vmap(lambda *d: fused_pair_block_env(fams, True, *statics,
                                                   *d))(*dyn)
    for i in range(B):
        one = fused_pair_block_env(fams, True, *statics,
                                   *[d[i] for d in dyn])
        for a, b in zip(out, one):
            np.testing.assert_allclose(np.asarray(a[i]), np.asarray(b),
                                       rtol=1e-4, atol=2e-6)


@pytest.mark.skipif(
    not os.path.exists("/root/reference/parameters/ff_1/sidechain.h5"),
    reason="reference parameters not mounted")
def test_system_level_env_fusion(rng, monkeypatch):
    """Full forcefield with UPSIDE_FUSE_ENV: energies and forces match
    the unfused evaluation."""
    from upside_md_tpu.bench_systems import TRP_CAGE, build_full_system

    monkeypatch.setenv("UPSIDE_FUSE_ENV", "1")
    system, params, pos, aux = build_full_system(seq=TRP_CAGE)
    plan = system.pair_fusion
    assert plan is not None and plan.env is not None, \
        "env band expected in the fusion plan"
    pos = jnp.asarray(pos)

    monkeypatch.setenv("UPSIDE_NO_FUSED", "1")
    e0, g0 = jax.value_and_grad(system.energy)(pos, params)
    monkeypatch.delenv("UPSIDE_NO_FUSED")
    monkeypatch.setenv("UPSIDE_FORCE_FUSED", "1")
    e1, g1 = jax.value_and_grad(system.energy)(pos, params)
    np.testing.assert_allclose(float(e1), float(e0), rtol=2e-4)
    den = np.sqrt(np.mean(np.asarray(g0) ** 2))
    err = np.sqrt(np.mean((np.asarray(g1) - np.asarray(g0)) ** 2)) / den
    assert err < 2e-3, err


def test_fused_env_gradients_resid(rng, monkeypatch):
    """UPSIDE_FUSED_RESID=1 (derivative-fields-from-forward backward,
    BENCH_NOTES round-5 target #1): position/weight gradients match the
    default recomputing backward to float noise."""
    from upside_md_tpu.ops.pallas_quadspline import fused_pair_block_env
    prob = make_problem(rng, n_a=6, n_b=7, n2=11)
    envp = make_env_problem(rng, prob, n_e=5)
    fams = prob[0]
    statics, dyn = env_args(prob, envp)

    def loss(x1a, w1a, x1b, w1b, xb, x1e, wcol):
        c1, c2, g, ev = fused_pair_block_env(
            fams, True, *statics, x1a, w1a, x1b, w1b, xb, x1e, wcol)
        return (jnp.sum(jnp.sin(c1)) + 2.0 * jnp.sum(jnp.cos(c2))
                + jnp.sum(g * g) + jnp.sum(jnp.sin(2.0 * ev)))

    monkeypatch.setenv("UPSIDE_FUSED_RESID", "0")
    g0 = jax.grad(loss, argnums=tuple(range(7)))(*dyn)
    monkeypatch.setenv("UPSIDE_FUSED_RESID", "1")
    g1 = jax.grad(loss, argnums=tuple(range(7)))(*dyn)
    for i, (a, b) in enumerate(zip(g1, g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7,
                                   err_msg=f"grad argnum {i}")


def test_fused_env_vmapped_resid(rng, monkeypatch):
    """Resid backward under vmap (the production replica axis)."""
    from upside_md_tpu.ops.pallas_quadspline import fused_pair_block_env
    prob = make_problem(rng, n_a=6, n_b=7, n2=11)
    envp = make_env_problem(rng, prob, n_e=5)
    fams = prob[0]
    statics, dyn_t = env_args(prob, envp)
    B = 3
    dyn = [jnp.stack([x + 0.01 * i for i in range(B)]) for x in dyn_t]

    def loss(*d):
        c1, c2, g, ev = fused_pair_block_env(fams, True, *statics, *d)
        return (jnp.sum(jnp.sin(c1)) + 2.0 * jnp.sum(jnp.cos(c2))
                + jnp.sum(g * g) + jnp.sum(jnp.sin(2.0 * ev)))

    monkeypatch.setenv("UPSIDE_FUSED_RESID", "0")
    g0 = jax.vmap(jax.grad(loss, argnums=tuple(range(7))))(*dyn)
    monkeypatch.setenv("UPSIDE_FUSED_RESID", "1")
    g1 = jax.vmap(jax.grad(loss, argnums=tuple(range(7))))(*dyn)
    for i, (a, b) in enumerate(zip(g1, g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7,
                                   err_msg=f"vmapped grad argnum {i}")


def test_fused_prep_gradients_resid(rng, monkeypatch):
    """Resid backward on the prepared-operand MD fast path: gradients
    match the default prep backward."""
    from upside_md_tpu.ops.pallas_quadspline import (
        _fused_meta, _fused_prep_static, fused_pair_block_env_prep)
    prob = make_problem(rng, n_a=6, n_b=7, n2=11)
    envp = make_env_problem(rng, prob, n_e=5)
    (fams, tab1, tab2, tab3, t1a, t1b, tc, ma, mb, mc,
     x1a, w1a, x1b, w1b, xb) = prob
    tab4, t1e, t2e, me, x1e, wcol = envp
    shapes = (6, 7, 11, 5)
    prep, meta = _fused_prep_static(
        fams, (tab1, tab2, tab3), (t1a, t1b, tc), (tc, tc, tc),
        (ma, mb, mc), shapes, (tab4, t1e, t2e, me))
    meta2 = _fused_meta(
        fams, (tab1.shape[0], tab2.shape[0], tab3.shape[0]), shapes, True)
    assert meta == meta2

    def loss(x1a, w1a, x1b, w1b, xb, x1e, wcol):
        c1, c2, g, ev = fused_pair_block_env_prep(
            meta, True, *prep, x1a, w1a, x1b, w1b, xb, x1e, wcol)
        return (jnp.sum(jnp.sin(c1)) + 2.0 * jnp.sum(jnp.cos(c2))
                + jnp.sum(g * g) + jnp.sum(jnp.sin(2.0 * ev)))

    dyn = (x1a, w1a, x1b, w1b, xb, x1e, wcol)
    monkeypatch.setenv("UPSIDE_FUSED_RESID", "0")
    g0 = jax.grad(loss, argnums=tuple(range(7)))(*dyn)
    monkeypatch.setenv("UPSIDE_FUSED_RESID", "1")
    g1 = jax.grad(loss, argnums=tuple(range(7)))(*dyn)
    for i, (a, b) in enumerate(zip(g1, g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7,
                                   err_msg=f"prep grad argnum {i}")
