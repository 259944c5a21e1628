"""Ornstein-Uhlenbeck thermostat (reference: src/thermostat.{h,cpp}).

mom' = exp(-dt/tau) * mom + sqrt(T * (1 - exp(-2 dt/tau))) * N(0,1)

The reference keys a Threefry4x32 stream by (seed, stream_id, atom,
n_invocations); here the same counter-based philosophy maps onto
jax.random: fold the stream id and invocation counter into the key and
draw all atoms at once.  Stream ids follow reference random.h:12-17.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

THERMOSTAT_STREAM = 0
REPLICA_EXCHANGE_STREAM = 1
PIVOT_MOVE_STREAM = 2
JUMP_MOVE_STREAM = 3


def stream_key(seed, stream_id, invocation):
    """Counter-based key: (seed, stream, invocation) — the same keyed-stream
    philosophy as the reference's Threefry4x32 (random.h:32-44)."""
    k = jax.random.PRNGKey(seed)
    k = jax.random.fold_in(k, stream_id)
    return jax.random.fold_in(k, invocation)


class OUThermostat:
    def __init__(self, timescale, delta_t):
        self.timescale = timescale
        self.delta_t = delta_t

    @property
    def mom_scale(self):
        return jnp.exp(-self.delta_t / self.timescale)

    def noise_scale(self, temperature):
        s = self.mom_scale
        return jnp.sqrt(temperature * (1.0 - s * s))

    def apply(self, key, mom, temperature):
        noise = jax.random.normal(key, mom.shape, dtype=mom.dtype)
        temp = jnp.asarray(temperature, mom.dtype)
        if temp.ndim:  # per-replica temperature broadcast over (atom, 3)
            temp = temp.reshape(temp.shape + (1,) * (mom.ndim - temp.ndim))
        return self.mom_scale * mom + jnp.sqrt(
            temp * (1.0 - self.mom_scale ** 2)) * noise


def thermalize(key, shape, temperature, dtype=jnp.float32):
    """Fresh Maxwell-Boltzmann momenta (the reference initializes with an
    OU step of delta_t=1e8, i.e. full rethermalization, main.cpp:515-522)."""
    noise = jax.random.normal(key, shape, dtype=dtype)
    temp = jnp.asarray(temperature, dtype)
    if temp.ndim:
        temp = temp.reshape(temp.shape + (1,) * (len(shape) - temp.ndim))
    return jnp.sqrt(temp) * noise
