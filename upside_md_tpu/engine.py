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
        """Diagnostics channel (reference: DerivComputation::get_value_by_name,
        rotamer.cpp:675-773, hbond.cpp:406-412)."""
        from .nodes.rotamer import rotamer_1body_energy, rotamer_diagnostics
        spec = self.system.by_name[node_name]
        _, outputs, _ = self.system.evaluate(self._pos, self.params)
        if spec.node_type.name == "rotamer":
            inputs = [outputs[a] for a in spec.args]
            if log_name.startswith("rotamer_1body_energy"):
                idx = int(log_name[len("rotamer_1body_energy"):] or 0)
                return np.asarray(rotamer_1body_energy(
                    spec.consts, self.params[node_name], inputs, idx))
            diag = rotamer_diagnostics(spec.consts, self.params[node_name],
                                       inputs)
            aliases = {"edge_marginal_in_graph_order": "edge_marginal",
                       "n_node": None}
            key = aliases.get(log_name, log_name)
            if log_name == "n_node":
                return np.array([float(spec.consts["n_res"])])
            if key in diag:
                return np.asarray(diag[key])
        if log_name == "count_edges_by_type":
            return self._count_edges_by_type(spec, outputs)
        raise ValueError(f"value {log_name} not implemented for {node_name}")

    def _count_edges_by_type(self, spec, outputs):
        """Edge counts per (type1, type2) pair — the igraph diagnostics
        channel every InteractionGraph node serves in the reference
        (interaction_graph.h:427-441, hbond.cpp:406-412)."""
        import jax.numpy as jnp

        from .ops.pairs import quadspline_family, sequence_exclusion_mask
        c = spec.consts
        name = spec.node_type.name
        if name == "rotamer":
            table = self.params[spec.name]["interaction_param"]
            x = outputs[spec.args[0]][c["index"], 0:3]
            _, k, dx = quadspline_family(table.shape[-1])
            d2 = np.asarray(jnp.sum((x[:, None] - x[None, :]) ** 2, -1))
            cutoff = (k - 2 - 1e-6) * dx
            tri = np.triu(np.ones((x.shape[0],) * 2, bool), 1)
            mask = (d2 < cutoff * cutoff) & tri & \
                (c["res"][:, None] != c["res"][None, :])
            t1 = t2 = c["type"]
            n1t, n2t = table.shape[0], table.shape[1]
        elif name == "hbond_coverage":
            table = self.params[spec.name]["interaction_param"]
            x1 = outputs[spec.args[0]][c["index1"], 0:3]
            x2 = outputs[spec.args[1]][c["index2"], 0:3]
            _, k, dx = quadspline_family(table.shape[-1])
            cutoff = (k - 2 - 1e-6) * dx
            d2 = np.asarray(jnp.sum((x1[:, None] - x2[None, :]) ** 2, -1))
            mask = (d2 < cutoff * cutoff) & np.asarray(
                sequence_exclusion_mask(c["id1"], c["id2"], 2))
            t1, t2 = c["type1"], c["type2"]
            n1t, n2t = table.shape[0], table.shape[1]
        elif name == "environment_coverage":
            from .ops.pairs import gather_pair_params
            table = self.params[spec.name]["interaction_param"]
            x1 = outputs[spec.args[0]][c["index1"], 0:3]
            x2 = outputs[spec.args[1]][c["index2"], 0:3]
            p = np.asarray(gather_pair_params(table, c["type1"], c["type2"]))
            cutoff = p[..., 0] + 1.0 / p[..., 1]
            d2 = np.asarray(jnp.sum((x1[:, None] - x2[None, :]) ** 2, -1))
            mask = (d2 < cutoff * cutoff) & np.asarray(
                sequence_exclusion_mask(c["id1"], c["id2"], 2))
            t1, t2 = c["type1"], c["type2"]
            n1t, n2t = table.shape[0], table.shape[1]
        else:
            raise ValueError(
                f"count_edges_by_type not implemented for {name}")
        i, j = np.nonzero(np.asarray(mask))
        out = np.zeros((n1t, n2t))
        np.add.at(out, (np.asarray(t1)[i], np.asarray(t2)[j]), 1)
        return out.ravel()
