"""Node library infrastructure.

The reference engine wires `DerivComputation` objects from HDF5 groups and
executes hand-written forward/reverse passes (src/deriv_engine.h:48-264).
Here a node type is a *pure function* ``compute(consts, params, inputs)``:

* ``consts``  — static data (indices, types, fitted spline tables that are
  not trained) kept as NumPy arrays; they become XLA constants under jit.
* ``params`` — a dict of jnp arrays, the differentiable parameter pytree
  (what the reference exposes through get_param/set_param/get_param_deriv).
* ``inputs`` — outputs of argument nodes, each (n_elem, elem_width).

Coordinate nodes return an (n_elem, elem_width) array; potential nodes
return a scalar energy.  Forces and parameter gradients come from jax.grad
of the composed energy — there is no hand-written reverse pass.

Node types register under a name prefix; config group names resolve by
prefix match exactly like the reference registry
(src/deriv_engine.cpp:234-241).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import numpy as np

NODE_REGISTRY: Dict[str, "NodeType"] = {}


@dataclass
class NodeType:
    name: str
    is_potential: bool
    compute: Callable  # (consts, params, inputs, extra) -> array or scalar
    read: Optional[Callable] = None  # (h5group, arg_specs) -> NodeSpec fields
    # optional flat-parameter API (reference get_param/set_param compatibility)
    get_param: Optional[Callable] = None  # (consts, params) -> np.ndarray
    set_param: Optional[Callable] = None  # (consts, params, flat) -> (consts, params)
    # optional per-step solver state threaded through the MD loop
    # (System.energy_and_cache): (consts, params) -> pytree or None
    init_cache: Optional[Callable] = None


def register_node(name, is_potential, compute, read=None,
                  get_param=None, set_param=None, init_cache=None):
    for existing in NODE_REGISTRY:
        if existing.startswith(name) or name.startswith(existing):
            raise ValueError(f"node type name clash: {existing} vs {name}")
    nt = NodeType(name, is_potential, compute, read, get_param, set_param,
                  init_cache)
    NODE_REGISTRY[name] = nt
    return nt


def resolve_node_type(group_name: str) -> NodeType:
    """Resolve a config group name to a node type by prefix match."""
    for prefix, nt in NODE_REGISTRY.items():
        if group_name.startswith(prefix):
            return nt
    raise KeyError(f"no node type found for config group '{group_name}'")


@dataclass
class NodeSpec:
    """One node instance of the computation graph."""
    name: str                 # unique instance name (config group name)
    node_type: NodeType
    args: List[str]           # parent node names ('pos' is the root)
    consts: Dict[str, Any] = field(default_factory=dict)
    params: Dict[str, Any] = field(default_factory=dict)
    n_elem: int = 0
    elem_width: int = 0


def topo_sort(specs: Dict[str, NodeSpec]) -> List[NodeSpec]:
    """Kahn-style topological order over the `arguments` dependency DAG,
    mirroring reference initialize_engine_from_hdf5
    (src/deriv_engine.cpp:213-229)."""
    order: List[NodeSpec] = []
    placed = {"pos"}
    remaining = dict(specs)
    remaining.pop("pos", None)
    while remaining:
        ready = [n for n, s in remaining.items()
                 if all(a in placed for a in s.args)]
        if not ready:
            raise ValueError(f"unsatisfiable dependencies among {list(remaining)}")
        for n in sorted(ready):
            order.append(remaining.pop(n))
            placed.add(n)
    return order
