"""Cross-node kernel fusion plans.

The force-field graph evaluates three pairwise kernels that stream the
same sidechain-bead operand: `hbond_coverage`, `hbond_coverage_hydrophobe`
(reference hbond.cpp:241-286) and the rotamer bead-pair grid
(bead_interaction.h:30-84, consumed by the BP solver).  On TPU these fuse
into ONE Pallas call per direction (ops/pallas_quadspline.fused_pair_block)
— fewer kernel launches, one shared stream of the bead operand, and a
tighter row packing than three separately padded launches.

The fusion crosses node boundaries, so it is planned once per System and
dispatched from System.evaluate: when the evaluation loop reaches the
first member whose inputs are all available, the fused kernel runs and its
per-member results are stashed in extra["_fused"], which the member node
functions consume instead of launching their own kernels.  Disable with
UPSIDE_NO_FUSED=1 (or UPSIDE_NO_PALLAS=1, which disables all kernels).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pairs import quadspline_family, sequence_exclusion_mask


class PairFusionPlan:
    """Static plan: the two coverage specs + the rotamer pair grid, plus
    (under UPSIDE_FUSE_ENV=1) the environment-coverage band riding the
    same bead columns."""

    def __init__(self, cov1, cov2, rot, trigger_name, env=None,
                 env_cb=None, env_wp=None):
        self.cov1 = cov1
        self.cov2 = cov2
        self.rot = rot
        self.trigger_name = trigger_name
        self.member_names = {cov1.name, cov2.name, rot.name}
        # env spec + the CB-placement and weighted_pos specs it reads
        self.env = env
        self.env_cb = env_cb
        self.env_wp = env_wp
        if env is not None:
            self.member_names = self.member_names | {env.name}
        # node outputs compute() reads (for tools that replay the plan)
        self.input_names = set(cov1.args) | set(cov2.args) \
            | set(rot.args) | {"pos"}
        if env is not None:
            self.input_names |= {env_cb.name, env_wp.args[1]}

    def enabled(self):
        if os.environ.get('UPSIDE_NO_PALLAS') or \
                os.environ.get('UPSIDE_NO_FUSED'):
            return False
        if os.environ.get('UPSIDE_FORCE_FUSED'):
            return True     # interpret-mode testing off-TPU
        return jax.default_backend() == 'tpu'

    def _static_inputs(self, params):
        """Tables, spline families, and masks — everything position-
        independent that the fused kernels consume."""
        cov1, cov2, rot = self.cov1, self.cov2, self.rot
        tab1 = jnp.asarray(params[cov1.name]["interaction_param"])
        tab2 = jnp.asarray(params[cov2.name]["interaction_param"])
        tab3 = jnp.asarray(params[rot.name]["interaction_param"])
        fam_cov = quadspline_family(tab1.shape[-1])
        fam_pair = quadspline_family(tab3.shape[-1])
        fams = ((fam_cov[0], fam_cov[1], 1.0 / fam_cov[2]),
                (fam_pair[0], fam_pair[1], 1.0 / fam_pair[2]))
        return fams, (tab1, tab2, tab3)

    def prepare(self, params):
        """Precompute the parameter-only kernel operands (the t2t poly
        slab + hi/lo split, type one-hots, concatenated masks, env
        sigmoid-parameter planes) ONCE, so Simulation.advance can thread
        them through the jit boundary instead of rebuilding them on
        every force evaluation — XLA's loop-invariant code motion never
        hoists that ~150-200 MB/eval staging chain out of the MD loop
        (BENCH_NOTES round-4 optimized-HLO section).  Returns the array
        pack for compute(prepared=...), or None when this plan shape has
        no prepared fast path (env band absent)."""
        if self.env is None:
            return None
        fams, tabs = self._static_inputs(params)
        cov1, cov2, rot, env = self.cov1, self.cov2, self.rot, self.env
        tab4 = jnp.asarray(params[env.name]["interaction_param"])
        t1s = (jnp.asarray(cov1.consts["type1"]),
               jnp.asarray(cov2.consts["type1"]),
               jnp.asarray(rot.consts["type"]))
        t2s = (jnp.asarray(cov1.consts["type2"]),
               jnp.asarray(cov2.consts["type2"]),
               jnp.asarray(rot.consts["type"]))
        masks, me, shapes = self._masks_and_shapes()
        env_static = (tab4, jnp.asarray(env.consts["type1"]),
                      jnp.asarray(env.consts["type2"]), me)
        from ..ops.pallas_quadspline import _fused_prep_static

        # one jitted dispatch: prepare runs OUTSIDE the MD jit, and on
        # the remote-TPU backend each eager op would pay a ~30 ms
        # round trip (prepare is called once per advance and memoized,
        # but the first call should not cost ~40 dispatches)
        def staged(tabs_, env_tab4):
            return _fused_prep_static(
                fams, tabs_, t1s, t2s, masks, shapes,
                (env_tab4,) + env_static[1:])[0]

        return jax.jit(staged)(tabs, env_static[0])

    def _masks_and_shapes(self):
        cov1, cov2, rot, env = self.cov1, self.cov2, self.rot, self.env
        ma = sequence_exclusion_mask(cov1.consts["id1"],
                                     cov1.consts["id2"], 2)
        mb = sequence_exclusion_mask(cov2.consts["id1"],
                                     cov2.consts["id2"], 2)
        res = rot.consts["res"]
        n_bead = len(res)
        tri = np.arange(n_bead)[:, None] < np.arange(n_bead)[None, :]
        mc = jnp.asarray(tri & (np.asarray(res)[:, None]
                                != np.asarray(res)[None, :]))
        me = None
        n_e = 0
        if env is not None:
            me = jnp.asarray(sequence_exclusion_mask(
                env.consts["id1"], env.consts["id2"], 2))
            n_e = len(np.asarray(env.consts["index1"]))
        n_a = len(np.asarray(cov1.consts["index1"]))
        n_b = len(np.asarray(cov2.consts["index1"]))
        return (ma, mb, mc), me, (n_a, n_b, n_bead, n_e)

    def compute(self, params, outputs,
                prepared=None) -> Dict[str, jnp.ndarray]:
        """Run the fused kernel; returns {member results}.  `prepared`
        (from prepare()) selects the MD fast path with the parameter
        staging precomputed."""
        from ..ops.pallas_quadspline import fused_pair_block

        cov1, cov2, rot = self.cov1, self.cov2, self.rot
        fams, (tab1, tab2, tab3) = self._static_inputs(params)

        def cov_inputs(spec):
            hb = outputs[spec.args[0]][spec.consts["index1"]]
            w = (1.0 - hb[:, 6]) ** 2
            mask = sequence_exclusion_mask(spec.consts["id1"],
                                           spec.consts["id2"], 2)
            return hb[:, :6], w, mask

        x1a, w1a, ma = cov_inputs(cov1)
        x1b, w1b, mb = cov_inputs(cov2)
        beads = outputs[rot.args[0]][rot.consts["index"]][:, :6]
        res = rot.consts["res"]
        n_bead = beads.shape[0]
        tri = np.arange(n_bead)[:, None] < np.arange(n_bead)[None, :]
        mc = jnp.asarray(tri & (np.asarray(res)[:, None]
                                != np.asarray(res)[None, :]))

        interpret = jax.default_backend() != 'tpu'
        if self.env is None:
            c1, c2, grid = fused_pair_block(
                fams, interpret, tab1, tab2, tab3,
                jnp.asarray(cov1.consts["type1"]),
                jnp.asarray(cov2.consts["type1"]),
                jnp.asarray(rot.consts["type"]),
                jnp.asarray(cov1.consts["type2"]),
                jnp.asarray(cov2.consts["type2"]),
                jnp.asarray(rot.consts["type"]),
                ma, mb, mc, x1a, w1a, x1b, w1b, beads)
            return {cov1.name: c1[:, None], cov2.name: c2[:, None],
                    rot.name + ":E_pair": grid}

        from ..ops.pallas_quadspline import fused_pair_block_env
        env, wp = self.env, self.env_wp
        tab4 = jnp.asarray(params[env.name]["interaction_param"])
        x1e = outputs[self.env_cb.name][env.consts["index1"]][:, :6]
        scalar_out = outputs[wp.args[1]]
        wcol = jnp.exp(-scalar_out[
            np.asarray(wp.consts["index_weight"])[
                np.asarray(env.consts["index2"])], 0])
        if prepared is not None:
            from ..ops.pallas_quadspline import (_fused_meta,
                                                 fused_pair_block_env_prep)
            _, _, shapes = self._masks_and_shapes()
            meta = _fused_meta(
                fams, (tab1.shape[0], tab2.shape[0], tab3.shape[0]),
                shapes, True)
            c1, c2, grid, envsum = fused_pair_block_env_prep(
                meta, interpret, *prepared, x1a, w1a, x1b, w1b, beads,
                x1e, wcol)
            return {cov1.name: c1[:, None], cov2.name: c2[:, None],
                    rot.name + ":E_pair": grid,
                    env.name: envsum[:, None]}

        me = sequence_exclusion_mask(env.consts["id1"],
                                     env.consts["id2"], 2)
        c1, c2, grid, envsum = fused_pair_block_env(
            fams, interpret, tab1, tab2, tab3, tab4,
            jnp.asarray(cov1.consts["type1"]),
            jnp.asarray(cov2.consts["type1"]),
            jnp.asarray(rot.consts["type"]),
            jnp.asarray(env.consts["type1"]),
            jnp.asarray(cov1.consts["type2"]),
            jnp.asarray(cov2.consts["type2"]),
            jnp.asarray(rot.consts["type"]),
            jnp.asarray(env.consts["type2"]),
            ma, mb, mc, jnp.asarray(me),
            x1a, w1a, x1b, w1b, beads, x1e, wcol)
        return {cov1.name: c1[:, None], cov2.name: c2[:, None],
                rot.name + ":E_pair": grid,
                env.name: envsum[:, None]}


def plan_pair_fusion(specs) -> Optional[PairFusionPlan]:
    """Detect the (coverage, hydrophobe coverage, rotamer pair) fusion
    group.  Returns None unless the graph matches the shape the fused
    kernel supports; mismatches simply keep the unfused kernels."""
    from .rotamer import PAIRS_KERNEL_MAX_BEADS

    covs = [s for s in specs if s.node_type.name == "hbond_coverage"]
    rots = [s for s in specs if s.node_type.name == "rotamer"]
    if len(covs) != 2 or len(rots) != 1:
        return None
    rot = rots[0]
    n_res = int(rot.consts["n_res"])
    n_bead = len(rot.consts["res"])
    if n_res > 128 or n_bead > PAIRS_KERNEL_MAX_BEADS:
        return None
    # both coverage groups must read the same bead rows the rotamer uses
    for c in covs:
        if c.args[1] != rot.args[0]:
            return None
        if not np.array_equal(np.asarray(c.consts["index2"]),
                              np.asarray(rot.consts["index"])):
            return None
        if c.consts.get("id1") is None or c.consts.get("id2") is None:
            return None
    try:
        f1 = quadspline_family(
            np.asarray(covs[0].params["interaction_param"]).shape[-1])
        f2 = quadspline_family(
            np.asarray(covs[1].params["interaction_param"]).shape[-1])
        f3 = quadspline_family(
            np.asarray(rot.params["interaction_param"]).shape[-1])
    except (ValueError, KeyError):
        return None
    if f1 != f2 or f1[0] != f3[0] or abs(f1[2] - f3[2]) > 1e-12:
        return None

    # System will move the FIRST coverage member directly before the
    # second, so the fused kernel (which needs both members' inputs) can
    # run at the first member's turn.  Validate that move: every fused
    # input must precede the second coverage spec, and nothing between the
    # two coverage specs may consume the first one's output.
    # environment-coverage band (default on — round-3 A/B winner on a
    # real v5e: full advance 7.838 ms/eval fused vs 8.046 unfused at 64
    # replicas, bench_logs/r3c_0819_0331/env_decision; UPSIDE_FUSE_ENV=0
    # opts out): the env node's pair columns must be exactly the rotamer
    # bead rows, via weighted_pos's index_pos, and its CB probes must fit
    # one row tile.
    env = env_cb = env_wp = None
    if os.environ.get('UPSIDE_FUSE_ENV', '1') not in ('0', 'off', ''):
        envs = [s for s in specs
                if s.node_type.name == "environment_coverage"]
        by_name = {s.name: s for s in specs}
        if len(envs) == 1:
            e = envs[0]
            wp = by_name.get(e.args[1])
            cb = by_name.get(e.args[0])
            if (wp is not None and wp.node_type.name == "weighted_pos"
                    and cb is not None
                    and e.consts.get("id1") is not None
                    and e.consts.get("id2") is not None
                    and len(e.consts["index1"]) <= 128
                    and np.array_equal(
                        np.asarray(wp.consts["index_pos"])[
                            np.asarray(e.consts["index2"])],
                        np.asarray(rot.consts["index"]))):
                env, env_cb, env_wp = e, cb, wp

    names = [s.name for s in specs]
    needed = {covs[0].args[0], covs[1].args[0], rot.args[0]}
    cov_pos = sorted(names.index(c.name) for c in covs)

    def precedes(dep):
        return dep == "pos" or names.index(dep) <= cov_pos[1]

    if not all(precedes(dep) for dep in needed):
        return None
    if env is not None and not all(
            precedes(dep) for dep in (env.args[0], env_wp.args[1])):
        env = env_cb = env_wp = None       # fuse without the env band
    first = names[cov_pos[0]]
    for s in specs[cov_pos[0] + 1:cov_pos[1]]:
        if first in s.args:
            return None
    cov1 = covs[0] if covs[0].name == first else covs[1]
    cov2 = covs[1] if cov1 is covs[0] else covs[0]
    return PairFusionPlan(cov1, cov2, rot, cov1.name, env=env,
                          env_cb=env_cb, env_wp=env_wp)
