"""Node library: importing this package populates NODE_REGISTRY with all
42 node types of the reference engine (SURVEY.md section 2.3)."""

from .base import NODE_REGISTRY, NodeSpec, register_node, resolve_node_type  # noqa: F401
from . import (affine, basic, env, hbond, hmm, membrane, nn,  # noqa: F401
               placement, radial, rama, rotamer, steric)
