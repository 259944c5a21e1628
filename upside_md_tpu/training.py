"""Force-field parameter training.

Replaces the reference's three-layer training stack — TensorFlow py_func
custom ops (py/tensorflow_upside.py), Theano ops + hand-rolled Adam
(py/rotamer_parameter_estimation.py), and the MPI rank-0 RPC collective
(py/mpi_collective_object.py) — with jax.grad through the jitted energy
plus optax.  Parameter derivatives that the reference computes with
special-cased C++ `get_param_deriv` implementations (interaction-graph
tables, HMM transition counts, spline coefficient derivatives) all fall
out of autodiff; the rotamer node's envelope-theorem gradient keeps
training through the BP solve cheap and exact at the fixed point.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

try:
    import optax
except ImportError:  # pragma: no cover
    optax = None


def select_trainable(params: Dict, names: Iterable[str]):
    """Split the parameter pytree into (trainable, frozen) by node name."""
    names = set(names)
    trainable = {k: v for k, v in params.items() if k in names}
    frozen = {k: v for k, v in params.items() if k not in names}
    return trainable, frozen


def merge_params(trainable: Dict, frozen: Dict):
    out = dict(frozen)
    out.update(trainable)
    return out


def energy_match_loss(system, pos_batch, target_energies):
    """Mean squared error of total energies over a batch of
    configurations (the reference's UpsideTrajEnergy per-frame energies,
    rotamer_parameter_estimation.py:358-419)."""
    def loss(trainable, frozen):
        params = merge_params(trainable, frozen)
        e = jax.vmap(lambda p: system.energy(p, params))(pos_batch)
        return jnp.mean((e - target_energies) ** 2)
    return loss


def energy_gap_loss(fixed_system, free_system, pos):
    """Native-rotamer log-likelihood: E_fixed - E_free is the free-energy
    cost of pinning side chains to their native rotamers; minimizing it
    maximizes native-rotamer probability (the reference's UpsideEnergyGap,
    rotamer_parameter_estimation.py:213-263)."""
    def loss(trainable, frozen):
        params_fixed = merge_params(trainable, frozen)
        e_fixed = fixed_system.energy(pos, params_fixed)
        e_free = free_system.energy(pos, params_fixed)
        return e_fixed - e_free
    return loss


def contrastive_divergence_loss(system, native_pos, ensemble_pos,
                                temperature=1.0):
    """Weighted-ensemble contrastive divergence (the reference's
    UpsideEnsemble op, tensorflow_upside.py:38-145): push native energy
    down relative to the Boltzmann-weighted simulation ensemble."""
    def loss(trainable, frozen):
        params = merge_params(trainable, frozen)
        e_native = system.energy(native_pos, params)
        e_ens = jax.vmap(lambda p: system.energy(p, params))(ensemble_pos)
        # free energy of the ensemble (self-normalized importance weights)
        beta = 1.0 / temperature
        f_ens = -temperature * jax.nn.logsumexp(-beta * e_ens) \
            + temperature * jnp.log(e_ens.shape[0] * 1.0)
        return e_native - f_ens
    return loss


def fit(loss_fn, trainable, frozen, n_steps=100, learning_rate=1e-3,
        optimizer=None, callback: Optional[Callable] = None):
    """Optimize the trainable parameter pytree with optax (default Adam —
    the reference implements Adam by hand,
    rotamer_parameter_estimation.py:266-310)."""
    if optimizer is None:
        if optax is None:
            raise RuntimeError("optax unavailable")
        optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(trainable)

    @jax.jit
    def step(trainable, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(trainable, frozen)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss

    history = []
    for i in range(n_steps):
        trainable, opt_state, loss = step(trainable, opt_state)
        history.append(float(loss))
        if callback is not None:
            callback(i, trainable, float(loss))
    return trainable, history


def multi_system_gradient(systems_and_pos, params):
    """Summed parameter gradient over independent protein systems — the
    reference's MPI data parallelism (tensorflow_upside.py:61-73,
    comm.Reduce of gradients).  Under a device mesh the same sum is a
    psum (see parallel.mesh.sharded_training_step)."""
    total = None
    loss = 0.0
    for system, pos in systems_and_pos:
        e, g = jax.value_and_grad(
            lambda p: system.energy(jnp.asarray(pos), p))(params)
        loss += e
        total = g if total is None else jax.tree.map(jnp.add, total, g)
    return loss, total
