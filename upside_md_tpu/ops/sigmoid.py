"""Sigmoid family used by the coarse-grained potentials.

Matches src/vector_math.h:621-695 of the reference.  All return
(value, derivative) pairs like the reference, but plain values are also
fine to use with autodiff — derivative outputs exist for tests.
"""

from __future__ import annotations

import jax.numpy as jnp


def sigmoid_val_deriv(x):
    """Increasing logistic 1/(1+exp(-x)) and its derivative, exactly as the
    reference computes it (vector_math.h:626-631: z = exp(-x), value =
    1/(1+z), deriv = z/(1+z)^2).  NOTE the C++ docstring above that code
    claims 1/(1+exp(x)); the code is the contract."""
    z = jnp.exp(-x)
    w = 1.0 / (1.0 + z)
    return w, z * w * w


def compact_sigmoid(x, sharpness):
    """Cubic 'compact sigmoid': 1 for x <= -1/sharpness, 0 for x >= 1/sharpness.

    value = 0.25*(y+2)*(y-1)^2 with y = x*sharpness (reference
    vector_math.h:640-658).  Returns (value, dvalue/dx).
    """
    y = x * sharpness
    val = 0.25 * (y + 2.0) * (y - 1.0) * (y - 1.0)
    der = sharpness * 0.75 * (y * y - 1.0)
    too_big = y > 1.0
    too_small = y < -1.0
    val = jnp.where(too_small, 1.0, jnp.where(too_big, 0.0, val))
    der = jnp.where(too_small | too_big, 0.0, der)
    return val, der


def compact_sigmoid_cutoff(sharpness):
    return 1.0 / sharpness


def compact_double_sigmoid(x, half_width, sharpness):
    """Product of opposing compact sigmoids: a smooth 'box' of given
    half-width (reference vector_math.h:672-676)."""
    v1, d1 = compact_sigmoid(x - half_width, sharpness)
    v2, d2 = compact_sigmoid(-x - half_width, sharpness)
    return v1 * v2, d1 * v2 - v1 * d2


def angular_compact_double_sigmoid(theta, center, half_width, sharpness):
    """compact_double_sigmoid with periodic wrapping of theta-center."""
    dev = theta - center
    dev = jnp.where(dev < -jnp.pi, dev + 2.0 * jnp.pi, dev)
    dev = jnp.where(dev > jnp.pi, dev - 2.0 * jnp.pi, dev)
    return compact_double_sigmoid(dev, half_width, sharpness)
