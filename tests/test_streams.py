"""Per-node logging streams (io/streams.py): level gating, stream names,
shapes, and internal consistency with the potential terms."""

import numpy as np
import jax.numpy as jnp

from upside_md_tpu.io.streams import (LOG_BASIC, LOG_DETAILED,
                                      LOG_EXTENSIVE, make_stream_fn,
                                      n_hbond, stream_plan)


def _backbone_system():
    from upside_md_tpu.bench_systems import TRP_CAGE, build_backbone_system
    return build_backbone_system(seq=TRP_CAGE)


def test_level_gating():
    system, params, pos, aux = _backbone_system()
    basic = {n for n, _ in stream_plan(system, "basic")}
    detailed = {n for n, _ in stream_plan(system, "detailed")}
    extensive = {n for n, _ in stream_plan(system, "extensive")}
    assert basic <= detailed <= extensive
    # backbone config: rama + hbond prob streams at detailed
    # (bonds.cpp:199, hbond.cpp:306), virtuals only at extensive
    # (hbond.cpp:48)
    assert "rama" in detailed and "hbond" in detailed
    assert "rama_map_potential" in detailed
    assert "virtual" not in detailed and "virtual" in extensive


def test_stream_values_and_shapes():
    system, params, pos, aux = _backbone_system()
    fn = make_stream_fn(system, "extensive")
    streams = fn(jnp.asarray(pos), params)
    n_res = 20
    assert streams["rama"].shape == (n_res, 2)
    assert streams["rama_map_potential"].shape == (n_res,)
    assert np.all(np.abs(np.asarray(streams["rama"])) <= np.pi + 1e-6)
    hb = np.asarray(streams["hbond"])
    assert hb.ndim == 1 and np.all(hb >= 0) and np.all(hb <= 1)
    assert streams["virtual"].shape == (hb.shape[0], 3)

    # per-residue rama potential sums to the rama_map_pot energy term
    _, _, per_term = system.evaluate(jnp.asarray(pos), params)
    rama_name = [k for k in per_term if k.startswith("rama_map")][0]
    assert abs(float(per_term[rama_name]) -
               float(np.sum(streams["rama_map_potential"]))) < 1e-3

    # n_hbond = sum of per-virtual probabilities
    _, outputs, _ = system.evaluate(jnp.asarray(pos), params)
    c = n_hbond(system, outputs)
    assert abs(float(c) - float(hb.sum())) < 1e-4


def test_batched_stream_fn():
    system, params, pos, aux = _backbone_system()
    fn = make_stream_fn(system, "detailed", batched=True)
    posb = jnp.stack([jnp.asarray(pos), jnp.asarray(pos) * 1.001])
    streams = fn(posb, params)
    assert streams["rama"].shape[0] == 2


def test_frame_fn_hamiltonian_per_slot_params():
    """Hamiltonian mode: per-frame streams and potentials for slot k must
    be computed under slot k's parameters (VERDICT r2 weak #3)."""
    import jax
    from upside_md_tpu.io.streams import make_frame_fn
    from upside_md_tpu.md.sim import stack_param_ensembles

    system, params, pos, aux = _backbone_system()
    p1 = jax.tree.map(lambda x: x, params)
    p1["rama_map_pot"] = dict(p1["rama_map_pot"])
    p1["rama_map_pot"]["coeffs"] = params["rama_map_pot"]["coeffs"] * 2.0
    mixed, spec = stack_param_ensembles([params, p1])
    assert spec  # exactly the differing leaf is stacked
    frame_fn, has_hb = make_frame_fn(system, "detailed",
                                     params_batched=spec)
    posb = jnp.stack([jnp.asarray(pos), jnp.asarray(pos)])
    pot, streams, hb = frame_fn(posb, mixed, {})

    # same positions, different Hamiltonians: slot potentials must match
    # single-slot evaluations under each slot's own params
    e0 = float(system.evaluate(jnp.asarray(pos), params)[0])
    e1 = float(system.evaluate(jnp.asarray(pos), p1)[0])
    assert abs(float(pot[0]) - e0) < 1e-3
    assert abs(float(pot[1]) - e1) < 1e-3
    assert abs(e0 - e1) > 1e-3  # the ladder actually differs

    # the per-residue rama stream follows its slot's (doubled) map
    r0 = np.asarray(streams["rama_map_potential"][0])
    r1 = np.asarray(streams["rama_map_potential"][1])
    np.testing.assert_allclose(r1, 2.0 * r0, rtol=1e-4, atol=1e-5)
