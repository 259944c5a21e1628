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
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
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
