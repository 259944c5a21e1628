"""Prepared-operand fused entry (fused_pair_block_env_prep): values and
position gradients must match the inline-staged path bit-for-bit modulo
float noise.  The prepared path moves the parameter-only operand staging
(t2t poly slab + hi/lo split, one-hots, masks, env planes) out of the MD
loop (PairFusionPlan.prepare, threaded by Simulation.advance); the
kernels and their operands are IDENTICAL arrays, so agreement should be
exact up to reduction-order noise."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

needs_params = pytest.mark.skipif(
    not os.path.exists("/root/reference/parameters/ff_1/sidechain.h5"),
    reason="reference parameters not mounted")


@needs_params
def test_prepared_compute_matches_inline(monkeypatch):
    """plan.compute(prepared=...) == plan.compute() on the full system,
    values and input cotangents (interpret mode)."""
    from upside_md_tpu.bench_systems import TRP_CAGE, build_full_system

    monkeypatch.setenv("UPSIDE_FUSE_ENV", "1")
    monkeypatch.setenv("UPSIDE_FORCE_FUSED", "1")
    system, params, pos, aux = build_full_system(seq=TRP_CAGE)
    plan = system.pair_fusion
    assert plan is not None and plan.env is not None
    pos = jnp.asarray(pos)

    # upstream outputs feeding the plan (fused members whose outputs
    # non-members consume still run via their XLA fallback)
    needed_members = {
        s.name for s in system.specs if s.name in plan.member_names
        and any(s.name in t.args for t in system.specs
                if t.name not in plan.member_names)}
    outputs = {"pos": pos}
    extra = {"_cache_out": {}}
    for s in system.specs:
        if s.name in plan.member_names and s.name not in needed_members:
            continue
        inputs = [outputs[a] for a in s.args]
        extra["_node_name"] = s.name
        outputs[s.name] = s.node_type.compute(
            s.consts, params.get(s.name, {}), inputs, extra)

    prep = plan.prepare(params)
    assert prep is not None

    def tot(o, prepared):
        r = plan.compute(params, o, prepared=prepared)
        return sum(jnp.sum(v * v) for v in r.values()), r

    keys = [k for k in plan.input_names if k in outputs]
    o = {k: outputs[k] for k in keys}
    (t0, r0), g0 = jax.value_and_grad(tot, has_aux=True)(o, None)
    (t1, r1), g1 = jax.value_and_grad(tot, has_aux=True)(o, prep)

    assert set(r0) == set(r1)
    for k in r0:
        np.testing.assert_allclose(np.asarray(r1[k]), np.asarray(r0[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    for k in g0:
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6, err_msg=k)


@needs_params
def test_prepared_advance_matches(monkeypatch):
    """One MD round with UPSIDE_FUSED_PREP on vs off: identical
    trajectories (the prepared pack only relocates staging)."""
    from upside_md_tpu.bench_systems import TRP_CAGE, build_full_system
    from upside_md_tpu.md.sim import Simulation

    monkeypatch.setenv("UPSIDE_FUSE_ENV", "1")
    monkeypatch.setenv("UPSIDE_FORCE_FUSED", "1")
    system, params, pos, aux = build_full_system(seq=TRP_CAGE)
    pos = jnp.asarray(pos)

    def run(flag):
        monkeypatch.setenv("UPSIDE_FUSED_PREP", flag)
        sim = Simulation(system, dt=0.009, thermostat_interval=0.135,
                         do_recenter=False)
        st = sim.initial_state(pos, params, seed=7, temperature=0.85,
                               n_replica=2)
        st = sim.advance(st, params, 2, True)
        return np.asarray(st.pos)

    p_off = run("0")
    p_on = run("1")
    np.testing.assert_allclose(p_on, p_off, rtol=1e-5, atol=1e-6)
