"""Pallas quadspline kernel (interpret mode on CPU) vs the XLA reference
formulation: values, position/direction gradients, and table gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from upside_md_tpu.ops.pairs import gather_pair_params, quadspline_coverage
from upside_md_tpu.ops.pallas_quadspline import quadspline_pallas


def setup(rng, n1=70, n2=150, n_type=4, ka=8, k=9):
    x1 = np.zeros((n1, 6))
    x1[:, 0:3] = 3.0 * rng.normal(size=(n1, 3))
    d = rng.normal(size=(n1, 3)); d /= np.linalg.norm(d, -1, keepdims=True)
    x1[:, 3:6] = d
    x2 = np.zeros((n2, 6))
    x2[:, 0:3] = 3.0 * rng.normal(size=(n2, 3))
    d = rng.normal(size=(n2, 3)); d /= np.linalg.norm(d, -1, keepdims=True)
    x2[:, 3:6] = d
    t1 = rng.integers(0, n_type, n1).astype(np.int32)
    t2 = rng.integers(0, n_type, n2).astype(np.int32)
    table = 0.5 * rng.normal(size=(n_type, n_type, 2 * ka + 2 * k))
    mask = rng.random((n1, n2)) > 0.2
    return (jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(t1),
            jnp.asarray(t2), jnp.asarray(table), jnp.asarray(mask), ka, k)


def xla_reference(table, t1, t2, x1, x2, mask, ka, k, inv_dx):
    p = gather_pair_params(table, t1, t2)
    disp = x2[None, :, 0:3] - x1[:, None, 0:3]
    dist2 = jnp.sum(disp * disp, -1)
    cutoff = (k - 2 - 1e-6) / inv_dx
    m = mask & (dist2 < cutoff * cutoff)
    return quadspline_coverage(p, x1[:, 0:3], x1[:, 3:6], x2[:, 0:3],
                               x2[:, 3:6], ka, k, inv_dx, m)


def test_forward_matches_xla(rng):
    x1, x2, t1, t2, table, mask, ka, k = setup(rng)
    inv_dx = 1.0
    ref = xla_reference(table, t1, t2, x1, x2, mask, ka, k, inv_dx)
    out = quadspline_pallas((ka, k, inv_dx), True, table, t1, t2, x1, x2,
                            mask)
    # the kernel's hi/lo bf16 parameter split carries ~2^-16 relative
    # coefficient noise (see _make_get_C); values are O(1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_gradients_match_xla(rng):
    x1, x2, t1, t2, table, mask, ka, k = setup(rng, n1=40, n2=60)
    inv_dx = 1.0
    w = jnp.asarray(rng.normal(size=(40, 60)))  # random cotangent weights

    def loss_ref(x1_, x2_, table_):
        return jnp.sum(w * xla_reference(table_, t1, t2, x1_, x2_, mask,
                                         ka, k, inv_dx))

    def loss_pl(x1_, x2_, table_):
        return jnp.sum(w * quadspline_pallas((ka, k, inv_dx), True, table_,
                                             t1, t2, x1_, x2_, mask))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x1, x2, table)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(x1, x2, table)
    for a, b, name in zip(g_pl, g_ref, ("x1", "x2", "table")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, err_msg=name)


def test_vmap_replica_blocking_matches_per_replica(rng):
    """vmap over positions routes to the replica-blocked kernel grid
    (custom_vmap); values and gradients must equal per-replica calls."""
    x1, x2, t1, t2, table, mask, ka, k = setup(rng, n1=30, n2=40)
    inv_dx = 1.0
    n_rep = 5   # deliberately not a multiple of the replica block
    x1b = jnp.stack([x1 + 0.05 * r for r in range(n_rep)])
    x2b = jnp.stack([x2 - 0.03 * r for r in range(n_rep)])
    w = jnp.asarray(rng.normal(size=(n_rep, 30, 40)))

    def one(x1_, x2_):
        return quadspline_pallas((ka, k, inv_dx), True, table, t1, t2,
                                 x1_, x2_, mask)

    out_b = jax.vmap(one)(x1b, x2b)
    for r in range(n_rep):
        np.testing.assert_allclose(np.asarray(out_b[r]),
                                   np.asarray(one(x1b[r], x2b[r])),
                                   atol=1e-6)

    def loss_b(x1b_, x2b_):
        return jnp.sum(w * jax.vmap(one)(x1b_, x2b_))

    def loss_seq(x1b_, x2b_):
        return sum(jnp.sum(w[r] * one(x1b_[r], x2b_[r]))
                   for r in range(n_rep))

    g_b = jax.grad(loss_b, argnums=(0, 1))(x1b, x2b)
    g_s = jax.grad(loss_seq, argnums=(0, 1))(x1b, x2b)
    for a, b, name in zip(g_b, g_s, ("x1", "x2")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, err_msg=name)


def test_colsum_matches_xla(rng):
    from upside_md_tpu.ops.pallas_quadspline import quadspline_colsum_pallas

    x1, x2, t1, t2, table, mask, ka, k = setup(rng, n1=40, n2=60)
    inv_dx = 1.0
    w1 = jnp.asarray(rng.random(40) + 0.1)
    gj = jnp.asarray(rng.normal(size=(60,)))

    def loss_ref(x1_, x2_, table_, w1_):
        cov = xla_reference(table_, t1, t2, x1_, x2_, mask, ka, k, inv_dx)
        return jnp.sum(gj * jnp.sum(w1_[:, None] * cov, axis=0))

    def loss_pl(x1_, x2_, table_, w1_):
        out = quadspline_colsum_pallas((ka, k, inv_dx), True, table_, t1,
                                       t2, x1_, x2_, mask, w1_)
        return jnp.sum(gj * out)

    ref_v, ref_g = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(
        x1, x2, table, w1)
    pl_v, pl_g = jax.value_and_grad(loss_pl, argnums=(0, 1, 2, 3))(
        x1, x2, table, w1)
    assert abs(float(ref_v) - float(pl_v)) < 1e-4 * max(1.0, abs(float(ref_v)))
    for a, b in zip(pl_g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_colsum_vmapped(rng):
    from upside_md_tpu.ops.pallas_quadspline import quadspline_colsum_pallas

    x1, x2, t1, t2, table, mask, ka, k = setup(rng, n1=20, n2=30)
    inv_dx = 1.0
    B = 3
    x1b = jnp.stack([x1 + 0.05 * i for i in range(B)])
    x2b = jnp.stack([x2 - 0.05 * i for i in range(B)])
    w1b = jnp.asarray(rng.random((B, 20)) + 0.1)

    f = lambda a, b, w: quadspline_colsum_pallas(  # noqa: E731
        (ka, k, inv_dx), True, table, t1, t2, a, b, mask, w)
    out_b = jax.vmap(f)(x1b, x2b, w1b)
    for i in range(B):
        np.testing.assert_allclose(np.asarray(out_b[i]),
                                   np.asarray(f(x1b[i], x2b[i], w1b[i])),
                                   atol=1e-5)
