"""Upside-compatible Python API.

Mirrors the surface of the reference's upside_engine.py `Upside` class
(py/upside_engine.py:159-242), which wraps ctypes calls into libupside.so:
energy/deriv/set_param/get_param/get_param_deriv/get_output/get_sens.
Here the backing engine is the jitted JAX System; parameter derivatives
come from jax.grad w.r.t. the parameter pytree instead of a -DPARAM_DERIV
rebuild of the C++ engine.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config.reader import load_system
from .system import System


def _flatten_node_params(node_params: Dict) -> np.ndarray:
    return np.concatenate([np.asarray(v).ravel()
                           for _, v in sorted(node_params.items())])


class Upside:
    """Drop-in engine object for analysis / training scripts.

    Stateful like the reference: `energy(pos)` caches pos so that
    subsequent get_output/get_sens/get_param_deriv refer to the same
    configuration (upside_engine.py:172-242).
    """

    def __init__(self, config_path_or_system, params=None, initial_pos=None):
        if isinstance(config_path_or_system, System):
            self.system = config_path_or_system
            self.params = params if params is not None \
                else self.system.make_params()
            self._pos = initial_pos
            self.aux = {}
        else:
            self.system, self.params, self._pos, self.aux = \
                load_system(config_path_or_system)
        self.n_atom = self.system.n_atom
        self._energy_jit = jax.jit(self.system.energy)
        self._deriv_jit = jax.jit(
            lambda pos, params: jax.grad(self.system.energy)(pos, params))

    # -- reference-API methods ----------------------------------------------

    def energy(self, pos):
        self._pos = jnp.asarray(pos)
        return float(self._energy_jit(self._pos, self.params))

    def deriv(self, pos):
        self._pos = jnp.asarray(pos)
        return np.asarray(self._deriv_jit(self._pos, self.params))

    def get_output(self, node_name):
        return np.asarray(self.system.get_output(self._pos, self.params,
                                                 node_name))

    def get_sens(self, node_name):
        return np.asarray(self.system.get_sens(self._pos, self.params,
                                               node_name))

    def get_output_dims(self, node_name):
        out = self.get_output(node_name)
        return out.shape

    def get_param(self, node_name):
        spec = self.system.by_name[node_name]
        if spec.node_type.get_param is not None:
            return spec.node_type.get_param(spec.consts,
                                            self.params.get(node_name, {}))
        return _flatten_node_params(self.params.get(node_name, {}))

    def set_param(self, param, node_name):
        spec = self.system.by_name[node_name]
        flat = np.asarray(param, np.float32).ravel()
        if spec.node_type.set_param is not None:
            consts, new_params = spec.node_type.set_param(
                spec.consts, self.params.get(node_name, {}), flat)
            spec.consts = consts
            self.params[node_name] = new_params
        else:
            # generic: unflatten into the node's param pytree, sorted keys
            node_params = dict(self.params.get(node_name, {}))
            off = 0
            for k in sorted(node_params):
                arr = np.asarray(node_params[k])
                n = arr.size
                node_params[k] = jnp.asarray(
                    flat[off:off + n].reshape(arr.shape))
                off += n
            if off != flat.size:
                raise ValueError(
                    f"bad param size for {node_name}: got {flat.size}, "
                    f"expected {off}")
            self.params[node_name] = node_params

    def get_param_deriv(self, node_name):
        """d(total potential)/d(node params), flattened in get_param order."""
        grads = self.system.param_deriv(self._pos, self.params, node_name)
        return _flatten_node_params(grads)

    def get_value_by_name(self, node_name, log_name):
        """Diagnostics channel (subset of the reference's)."""
        from .nodes.rotamer import rotamer_marginals
        spec = self.system.by_name[node_name]
        if spec.node_type.name == "rotamer":
            _, outputs, _ = self.system.evaluate(self._pos, self.params)
            inputs = [outputs[a] for a in spec.args]
            nb, bead_marg = rotamer_marginals(
                spec.consts, self.params[node_name], inputs)
            if log_name == "node_marginal":
                return np.asarray(nb)
            if log_name == "bead_marginal":
                return np.asarray(bead_marg)
        raise ValueError(f"value {log_name} not implemented for {node_name}")
