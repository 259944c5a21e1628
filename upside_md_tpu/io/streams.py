"""Per-node logging streams, level-gated like the reference
(src/state_logger.h:56-104 LOG_BASIC/LOG_DETAILED/LOG_EXTENSIVE and the
per-node default_logger->add_logger registrations).

Each node type can contribute named frame streams at a minimum log level;
`stream_plan` collects them for a system and `make_stream_fn` compiles ONE
jitted function that evaluates the graph once per frame and returns every
stream.  Stream names and shapes follow the reference registrations so
downstream analysis written against reference trajectories keeps working:

  tip_pos, time_estimate              AFM            BASIC   bonds.cpp:130
  rama                                rama_coord     DETAILED bonds.cpp:199
  rama_map_potential                  rama_map_pot   DETAILED rama_map_pot.cpp:50
  hbond                               protein_hbond  DETAILED hbond.cpp:306
  rotamer_free_energy                 rotamer        DETAILED rotamer.cpp:661
  rotamer_1body_energy{i}             rotamer        DETAILED rotamer.cpp:668
  contact_energy                      contact        DETAILED sidechain_radial.cpp:171
  hmm_energy, hmm_energy_1body        fixed_hmm      DETAILED hmm.cpp:94
  linear_coupling_{uniform,with_inactivation}        DETAILED environment.cpp:271
  nonlinear_coupling                  nonlinear_coupling DETAILED environment.cpp:348
  virtual                             infer_H_O      EXTENSIVE hbond.cpp:48
  placement_pos                       placement_*    EXTENSIVE placement.cpp:254
  environment_coverage                environment_coverage EXTENSIVE environment.cpp:78

The driver-level streams (pos/kinetic/potential/time/temperature,
replica_index, replica_cumulative_swaps, pivot/jump _stats with
reset-per-frame semantics, main.cpp:526-541/194-218 and
monte_carlo_sampler.h:28-37) are logged by the CLI.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp

LOG_BASIC, LOG_DETAILED, LOG_EXTENSIVE = 0, 1, 2
LEVEL_NAMES = {"basic": LOG_BASIC, "detailed": LOG_DETAILED,
               "extensive": LOG_EXTENSIVE}


def _afm_streams(spec):
    def tip_pos(outputs, params, extra):
        t = (spec.consts.get("time_initial", 0.0) +
             spec.consts.get("time_step", 0.009) *
             extra.get("n_deriv_evals", 0))
        p = params[spec.name]
        return p["starting_tip_pos"] + p["pulling_vel"] * t

    def time_estimate(outputs, params, extra):
        t = (spec.consts.get("time_initial", 0.0) +
             spec.consts.get("time_step", 0.009) *
             extra.get("n_deriv_evals", 0))
        return jnp.asarray([t])

    return [("tip_pos", LOG_BASIC, tip_pos),
            ("time_estimate", LOG_BASIC, time_estimate)]


def _output_stream(name, level, column=None, width=None):
    def make(spec):
        def fn(outputs, params, extra):
            out = outputs[spec.name]
            if column is not None:
                return out[:, column]
            if width is not None:
                return out[:, :width]
            return out
        return [(name, level, fn)]
    return make


def _rama_map_streams(spec):
    from ..nodes.rama import rama_map_pot_per_residue

    def fn(outputs, params, extra):
        inputs = [outputs[a] for a in spec.args]
        return rama_map_pot_per_residue(spec.consts,
                                        params.get(spec.name, {}), inputs)
    return [("rama_map_potential", LOG_DETAILED, fn)]


def _rotamer_streams(spec):
    from ..nodes.rotamer import rotamer_1body_energy, rotamer_diagnostics

    def free_energy(outputs, params, extra):
        inputs = [outputs[a] for a in spec.args]
        diag = rotamer_diagnostics(spec.consts, params.get(spec.name, {}),
                                   inputs)
        return diag["rotamer_free_energy"]

    streams = [("rotamer_free_energy", LOG_DETAILED, free_energy)]
    n_prob = max(len(spec.args) - 1, 0)   # args[0] is the bead node
    for i in range(n_prob):
        def one_body(outputs, params, extra, i=i):
            inputs = [outputs[a] for a in spec.args]
            return rotamer_1body_energy(spec.consts,
                                        params.get(spec.name, {}),
                                        inputs, i)
        streams.append((f"rotamer_1body_energy{i}", LOG_DETAILED, one_body))
    return streams


def _contact_streams(spec):
    from ..nodes.radial import contact_energy_per_bead

    def fn(outputs, params, extra):
        inputs = [outputs[a] for a in spec.args]
        return contact_energy_per_bead(spec.consts,
                                       params.get(spec.name, {}), inputs)
    return [("contact_energy", LOG_DETAILED, fn)]


def _hmm_streams(spec):
    from ..nodes.hmm import hmm_energy_decomposition

    def total(outputs, params, extra):
        inputs = [outputs[a] for a in spec.args]
        t, _ = hmm_energy_decomposition(spec.consts,
                                        params.get(spec.name, {}), inputs)
        return jnp.asarray([t])

    def per_res(outputs, params, extra):
        inputs = [outputs[a] for a in spec.args]
        _, r = hmm_energy_decomposition(spec.consts,
                                        params.get(spec.name, {}), inputs)
        return r

    return [("hmm_energy", LOG_DETAILED, total),
            ("hmm_energy_1body", LOG_DETAILED, per_res)]


def _linear_coupling_streams(with_inactivation):
    name = ("linear_coupling_with_inactivation" if with_inactivation
            else "linear_coupling_uniform")

    def make(spec):
        def fn(outputs, params, extra):
            c = params[spec.name]["couplings"][spec.consts["coupling_types"]]
            val = outputs[spec.args[0]][:, 0]
            if with_inactivation:
                act = (1.0 - outputs[spec.args[1]][
                    :, spec.consts["inactivation_dim"]]) ** 2
            else:
                act = 1.0
            return c * val * act
        return [(name, LOG_DETAILED, fn)]
    return make


def _nonlinear_coupling_streams(spec):
    from ..ops.spline import eval_clamped_bspline

    def fn(outputs, params, extra):
        coeff = params[spec.name]["coeff"][spec.consts["coupling_types"]]
        x = ((outputs[spec.args[0]][:, 0] - spec.consts["spline_offset"]) *
             spec.consts["spline_inv_dx"])
        v, _ = eval_clamped_bspline(coeff, x)
        return v
    return [("nonlinear_coupling", LOG_DETAILED, fn)]


STREAM_BUILDERS: Dict[str, Callable] = {
    "AFM": _afm_streams,
    "rama_coord": _output_stream("rama", LOG_DETAILED, width=2),
    "rama_map_pot": _rama_map_streams,
    "protein_hbond": _output_stream("hbond", LOG_DETAILED, column=6),
    "infer_H_O": _output_stream("virtual", LOG_EXTENSIVE, width=3),
    "environment_coverage": _output_stream("environment_coverage",
                                           LOG_EXTENSIVE, column=0),
    "rotamer": _rotamer_streams,
    "contact": _contact_streams,
    "fixed_hmm": _hmm_streams,
    "linear_coupling_uniform": _linear_coupling_streams(False),
    "linear_coupling_with_inactivation": _linear_coupling_streams(True),
    "nonlinear_coupling": _nonlinear_coupling_streams,
}
for _p in ("placement_scalar", "placement_fixed_scalar",
           "placement_point_only", "placement_fixed_point_only",
           "placement_point_vector_only",
           "placement_fixed_point_vector_only",
           "placement_fixed_point_vector_scalar"):
    STREAM_BUILDERS[_p] = _output_stream("placement_pos", LOG_EXTENSIVE)


def stream_plan(system, level) -> List[Tuple[str, Callable]]:
    """All (stream_name, fn) pairs active at `level` for this system.
    Names are suffixed with the node instance name when two nodes would
    otherwise collide (e.g. several placement nodes)."""
    if isinstance(level, str):
        level = LEVEL_NAMES[level]
    plan, seen = [], {}
    for spec in system.specs:
        builder = STREAM_BUILDERS.get(spec.node_type.name)
        if builder is None:
            continue
        for name, min_level, fn in builder(spec):
            if level < min_level:
                continue
            if name in seen:
                name = f"{name}_{spec.name}"
            seen[name] = True
            plan.append((name, fn))
    return plan


def make_stream_fn(system, level, batched=False):
    """One jitted function pos, params -> {stream_name: array} evaluating
    the graph once per frame.  Returns None when no streams are active."""
    plan = stream_plan(system, level)
    if not plan:
        return None

    def compute(pos, params, extra=None):
        extra = extra or {}
        _, outputs, _ = system.evaluate(pos, params, extra=extra)
        return {name: fn(outputs, params, extra) for name, fn in plan}

    if batched:
        return jax.jit(lambda pos, params, extra=None:
                       jax.vmap(lambda p: compute(p, params, extra))(pos))
    return jax.jit(compute)


def make_frame_fn(system, level, params_batched=False):
    """One jitted per-frame evaluation over the replica ensemble: the graph
    runs ONCE per replica and yields (potential (R,), streams dict, hbond
    counts (R,)) — the reference evaluates the graph a single time per
    frame too (main.cpp:630-655).  With params_batched truthy (True or a
    stack_param_ensembles spec of stacked leaf paths) every replica
    slot is evaluated under its own parameter pytree (Hamiltonian replica
    exchange; the reference's per-system engines, main.cpp:456-495), so
    per-node streams for slot k are computed under slot k's Hamiltonian.

    Returns (frame_fn, has_hbond)."""
    plan = stream_plan(system, level)
    has_hb = any(s.node_type.name == "protein_hbond" for s in system.specs)

    def one(pos, params, extra):
        energy, outputs, _ = system.evaluate(pos, params, extra=extra)
        streams = {name: fn(outputs, params, extra) for name, fn in plan}
        hb = n_hbond(system, outputs) if has_hb else jnp.asarray(0.0)
        return energy, streams, hb

    def frame_fn(pos_batch, params, extra=None):
        from ..md.sim import param_axes
        p_ax = param_axes(params, params_batched) if params_batched else None
        return jax.vmap(one, in_axes=(0, p_ax, None))(pos_batch, params,
                                                      extra or {})

    return jax.jit(frame_fn), has_hb


def n_hbond(system, outputs):
    """Total hydrogen-bond count (sum of per-virtual probabilities), the
    reference console diagnostic (deriv_engine.cpp:284-288, printed by
    main.cpp:648-654).  Returns None if the system has no hbond node."""
    for spec in system.specs:
        if spec.node_type.name == "protein_hbond":
            return jnp.sum(outputs[spec.name][:, 6])
    return None
