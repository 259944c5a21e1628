"""Training path: optax fitting through the jitted energy, including
through the rotamer BP envelope gradient."""

import numpy as np
import jax.numpy as jnp

from upside_md_tpu import build_system
from upside_md_tpu.training import (energy_match_loss, fit, merge_params,
                                    multi_system_gradient, select_trainable)

from helpers import spec


def test_fit_spring_constants_to_energies(rng):
    n_atom = 6
    ids = np.arange(n_atom, dtype=np.int32)
    x0 = np.zeros((n_atom, 3))
    true_k = 2.5

    sys_true = build_system(n_atom, [
        spec("atom_pos_spring", ["pos"], {"id": ids},
             {"x0": x0, "spring_const": np.full(n_atom, true_k)})])
    params_true = sys_true.make_params()

    pos_batch = jnp.asarray(rng.normal(size=(32, n_atom, 3)))
    target = jnp.asarray([float(sys_true.energy(p, params_true))
                          for p in pos_batch])

    sys_fit = build_system(n_atom, [
        spec("atom_pos_spring", ["pos"], {"id": ids},
             {"x0": x0, "spring_const": np.full(n_atom, 1.0)})])
    params = sys_fit.make_params()
    trainable, frozen = select_trainable(params, ["atom_pos_spring"])
    loss = energy_match_loss(sys_fit, pos_batch, target)

    fitted, history = fit(loss, trainable, frozen, n_steps=1500,
                          learning_rate=0.05)
    k_fit = np.asarray(fitted["atom_pos_spring"]["spring_const"])
    assert history[-1] < 1e-4 * history[0]
    np.testing.assert_allclose(k_fit, true_k, rtol=0.05)


def test_multi_system_gradient_matches_sum(rng):
    n_atom = 4
    ids = np.arange(n_atom, dtype=np.int32)
    sys1 = build_system(n_atom, [
        spec("atom_pos_spring", ["pos"], {"id": ids},
             {"x0": np.zeros((n_atom, 3)),
              "spring_const": np.full(n_atom, 2.0)})])
    params = sys1.make_params()
    pos_a = rng.normal(size=(n_atom, 3))
    pos_b = rng.normal(size=(n_atom, 3))
    loss, g = multi_system_gradient([(sys1, pos_a), (sys1, pos_b)], params)
    import jax
    ga = jax.grad(lambda p: sys1.energy(jnp.asarray(pos_a), p))(params)
    gb = jax.grad(lambda p: sys1.energy(jnp.asarray(pos_b), p))(params)
    expect = jax.tree.map(lambda a, b: np.asarray(a) + np.asarray(b), ga, gb)
    for k in expect:
        for kk in expect[k]:
            np.testing.assert_allclose(np.asarray(g[k][kk]), expect[k][kk],
                                       rtol=1e-6)
