"""Multi-device (virtual 8-CPU mesh) replica sharding and training psum."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from upside_md_tpu.md.sim import Simulation
from upside_md_tpu.parallel.mesh import (make_replica_mesh,
                                         shard_replica_state,
                                         sharded_advance,
                                         sharded_training_step)

from helpers import spec
from upside_md_tpu import build_system


def harmonic_system(n_atom, k=3.0):
    s = spec("atom_pos_spring", ["pos"],
             {"id": np.arange(n_atom, dtype=np.int32)},
             {"x0": np.zeros((n_atom, 3)),
              "spring_const": np.full(n_atom, k)})
    return build_system(n_atom, [s])


def test_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_replica_advance(rng):
    n_atom, n_rep = 5, 8
    sys = harmonic_system(n_atom)
    sim = Simulation(sys, dt=0.01, thermostat_interval=0.09,
                     do_recenter=False)
    params = sys.make_params()
    state = sim.initial_state(0.2 * rng.normal(size=(n_atom, 3)), params,
                              seed=0, temperature=1.0, n_replica=n_rep)
    mesh = make_replica_mesh(8)
    advance = sharded_advance(sim, mesh, 20)
    out = advance(state, params)
    assert out.pos.shape == (n_rep, n_atom, 3)
    assert np.all(np.asarray(out.round_num) == 20)

    # matches the unsharded computation exactly
    ref = sim.advance(state, params, 20, True)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               atol=1e-5)


def test_sharded_training_step(rng):
    n_atom, batch = 4, 16
    sys = harmonic_system(n_atom)
    params = sys.make_params()
    mesh = make_replica_mesh(8)

    def sgd(params, grads, opt_state):
        lr = 0.01
        return (jax.tree.map(lambda p, g: p - lr * g, params, grads),
                opt_state)

    step = sharded_training_step(sys, sgd, mesh)
    pos_batch = jnp.asarray(rng.normal(size=(batch, n_atom, 3)))
    target = jnp.asarray(rng.normal(size=(batch,)) ** 2)
    new_params, _, loss = step(params, (), pos_batch, target)
    assert np.isfinite(float(loss))

    # gradient matches the unsharded computation
    def loss_fn(p):
        e = jax.vmap(lambda x: sys.energy(x, p))(pos_batch)
        return jnp.mean((e - target) ** 2)

    g_ref = jax.grad(loss_fn)(params)
    g_step = jax.tree.map(lambda a, b: (np.asarray(a) - np.asarray(b)) / 0.01,
                          params, new_params)
    for k in g_ref:
        for kk in g_ref[k]:
            np.testing.assert_allclose(np.asarray(g_step[k][kk]),
                                       np.asarray(g_ref[k][kk]), atol=1e-4)
