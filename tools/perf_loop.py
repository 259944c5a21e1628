"""In-jit loop timings of the sidechain-complex pieces at bench shapes.

The remote-TPU tunnel has a ~28 ms dispatch floor, so single-dispatch
micro-benchmarks (tools/perf_kernels.py) cannot resolve ms-scale kernels.
This tool wraps each candidate in a lax.fori_loop INSIDE one jit (the same
structure Simulation.advance uses) and divides by the iteration count.
Each iteration perturbs its inputs so no stage can be CSE'd or served from
a record/replay cache.

Pieces:
  * upstream energy+grad (everything but coverage+rotamer)
  * fused pair block forward / forward+backward
  * BP mega-kernel warm-start forward / forward+VJP
  * full force evaluation (context)

Usage: python tools/perf_loop.py [n_replica] [n_iters]
         [--only=up,fused,bp,full,glue]  [--prefix[=stride]]
         [--bp-jolt=AMP]  [--bp-zero]

--prefix times cumulative topological prefixes of the non-fused node
graph (energy+grad per prefix, in-loop); consecutive deltas attribute
per-node cost below the ~28 ms dispatch floor.
"""

import os
import sys
import time

# Session escape hatch: stacked-BP variants hit pathological Mosaic
# compiles on the real chip (>17 min vs 3 min for the per-plane kernel).
# Touching this sentinel makes queued stacked-variant steps exit before
# ever claiming the tunnel, so a serialized session falls through to its
# later stages with the per-plane winner.
if (os.environ.get("UPSIDE_BP_STACKED", "0") != "0"
        and os.path.exists(os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "bench_logs", "SKIP_STACKED"))):
    print("skipped: stacked BP variants disabled via bench_logs/SKIP_STACKED")
    sys.exit(0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

cache = os.environ.get("JAX_COMPILATION_CACHE",
                       os.path.expanduser("~/.upside_tpu_jax_cache"))
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from upside_md_tpu.bench_systems import UBIQUITIN, build_full_system


def timed(fn, n=3):
    out = fn()
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def loop_time(body, carry, n_iters, label):
    """Time a jitted fori_loop of `body` and print per-iteration cost."""
    @jax.jit
    def run(carry):
        return jax.lax.fori_loop(0, n_iters, body, carry)

    t = timed(lambda: run(carry))
    print(f"{label:48s} {t / n_iters * 1e3:9.3f} ms/iter"
          f"   ({t*1e3:8.1f} ms / {n_iters})")
    return t / n_iters


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only = [a.split("=", 1)[1].split(",") for a in sys.argv[1:]
            if a.startswith("--only=")]
    only = set(only[0]) if only else {"up", "fused", "bp", "full"}
    prefix = [a for a in sys.argv[1:] if a.startswith("--prefix")]
    prefix_stride = 0
    if prefix:
        prefix_stride = int(prefix[0].split("=", 1)[1]) if "=" in prefix[0] \
            else 1
        only = set()
    n_rep = int(args[0]) if len(args) > 0 else 64
    n_iters = int(args[1]) if len(args) > 1 else 30
    if prefix_stride:
        # Prefix attribution walks the NON-fused node list; with the env
        # band fused (default since round 4) the env chain's consumers
        # would reference a node the fused kernel now owns.  Pin fusion to
        # the round-3 shape so "upstream" keeps meaning the same set of
        # nodes across rounds (env chain included, XLA path).
        os.environ["UPSIDE_FUSE_ENV"] = "0"
    system, params, pos, aux = build_full_system(seq=UBIQUITIN)
    pos = jnp.asarray(pos)
    posb = jnp.broadcast_to(pos, (n_rep,) + pos.shape) \
        + 1e-3 * jax.random.normal(jax.random.PRNGKey(0),
                                   (n_rep,) + pos.shape, pos.dtype)
    jiggle = 1e-5 * jax.random.normal(jax.random.PRNGKey(1), posb.shape,
                                      posb.dtype)

    plan = system.pair_fusion
    assert plan is not None

    # Fused members whose outputs non-members consume (the env-coverage
    # band since its round-4 default-on) still run here, via their
    # node-fallback XLA path (no "_fused" in extra) — the same nodes the
    # round-3 "upstream" piece measured, so the number stays comparable.
    needed_members = {
        s.name for s in system.specs if s.name in plan.member_names
        and any(s.name in t.args for t in system.specs
                if t.name not in plan.member_names)}

    def upstream(p):
        """Everything except the fused members (coverage x2 + rotamer)."""
        outputs = {"pos": p}
        extra = {"_cache_out": {}}
        for s in system.specs:
            if s.name in plan.member_names and s.name not in needed_members:
                continue
            inputs = [outputs[a] for a in s.args]
            extra["_node_name"] = s.name
            outputs[s.name] = s.node_type.compute(
                s.consts, params.get(s.name, {}), inputs, extra)
        return {k: outputs[k] for k in plan.input_names if k in outputs}

    def up_energy(p):
        outputs = {"pos": p}
        extra = {"_cache_out": {}}
        tot = 0.0
        for s in system.specs:
            if s.name in plan.member_names and s.name not in needed_members:
                continue
            inputs = [outputs[a] for a in s.args]
            extra["_node_name"] = s.name
            out = s.node_type.compute(s.consts, params.get(s.name, {}),
                                      inputs, extra)
            outputs[s.name] = out
            if s.node_type.is_potential and s.name not in plan.member_names:
                tot = tot + jnp.sum(out)
        return tot

    # ---- 0. per-node attribution via cumulative prefixes ----------------
    if prefix_stride:
        nonfused = [s for s in system.specs
                    if s.name not in plan.member_names]
        # k=0 = empty prefix: times the fori_loop/vmap/jiggle glue alone,
        # so delta[1] attributes the FIRST node honestly (round-4 gap:
        # prefix[1] bundled affine_alignment with the loop baseline)
        cuts = [0] + list(range(prefix_stride, len(nonfused), prefix_stride))
        if cuts[-1] != len(nonfused):
            cuts.append(len(nonfused))

        def make_body(k):
            def prefix_loss(p):
                outputs = {"pos": p}
                extra = {"_cache_out": {}}
                tot = 1e-9 * jnp.sum(p)
                for s in nonfused[:k]:
                    inputs = [outputs[a] for a in s.args]
                    extra["_node_name"] = s.name
                    out = s.node_type.compute(
                        s.consts, params.get(s.name, {}), inputs, extra)
                    outputs[s.name] = out
                    if s.node_type.is_potential:
                        tot = tot + jnp.sum(out)
                    # keep every node live through fwd AND bwd
                    tot = tot + 1e-6 * sum(
                        jnp.sum(o) for o in jax.tree_util.tree_leaves(out))
                return tot

            eg = jax.vmap(jax.value_and_grad(prefix_loss))

            def body(i, p):
                _, g = eg(p + i * jiggle)
                return p + 1e-6 * g
            return body

        prev = 0.0
        for k in cuts:
            name = nonfused[k-1].name if k else "(loop glue baseline)"
            t = loop_time(make_body(k), posb, n_iters,
                          f"prefix .. {name} [{k}]")
            print(f"{'':48s}   delta {1e3*(t - prev):8.3f} ms")
            prev = t
        return

    # ---- 1. upstream energy+grad --------------------------------------
    if "up" in only:
        up_eg = jax.vmap(jax.value_and_grad(up_energy))

        def body_up(i, p):
            _, g = up_eg(p + i * jiggle)
            return p + 1e-6 * g

        loop_time(body_up, posb, n_iters,
                  "upstream (no cov/rot) energy+grad")

    # ---- 2. fused pair block ------------------------------------------
    if "fused" in only:
        outs0 = jax.jit(jax.vmap(upstream))(posb)

        def fused_loss(o):
            # SQUARED sum: a linear loss's cotangents are constant ones,
            # which lets JAX/XLA eliminate the forward kernel entirely
            # when the loss VALUE is unused (hlo_diff.py, round 4: the
            # plain-loss "fwd+bwd" loop contained ONLY the backward
            # kernel, understating the block by the whole forward
            # kernel).  v*v keeps the forward alive and its cotangents
            # data-dependent, matching the in-context cost.
            r = plan.compute(params, o)
            return sum(jnp.sum(v * v) for v in r.values())

        fused_vg = jax.vmap(jax.value_and_grad(fused_loss))
        fused_f = jax.vmap(lambda o: plan.compute(params, o))

        def body_fused_fwd(i, o):
            r = fused_f(o)
            s = sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(r))
            return jax.tree_util.tree_map(lambda x: x + 1e-12 * s, o)

        def body_fused_fb(i, o):
            _, g = fused_vg(o)
            return jax.tree_util.tree_map(lambda x, gg: x + 1e-9 * gg,
                                          o, g)

        loop_time(body_fused_fwd, outs0, n_iters, "fused pair block fwd")
        loop_time(body_fused_fb, outs0, n_iters, "fused pair block fwd+bwd")

        # --fused-plain: the round-2..4 historical loss (linear sum).
        # KNOWN-BROKEN as a fwd+bwd measurement — constant cotangents +
        # unused value let XLA delete the forward kernel, so this times
        # the BACKWARD KERNEL ONLY (+staging).  Kept for comparing
        # against historical logs.
        if "--fused-plain" in sys.argv:
            def fused_loss_plain(o):
                r = plan.compute(params, o)
                return sum(jnp.sum(v) for v in r.values())

            fused_vg_pl = jax.vmap(jax.value_and_grad(fused_loss_plain))

            def body_fused_pl(i, o):
                _, g = fused_vg_pl(o)
                return jax.tree_util.tree_map(
                    lambda x, gg: x + 1e-9 * gg, o, g)

            loop_time(body_fused_pl, outs0, n_iters,
                      "fused bwd-only (historical linear loss)")

        # --fused-jolt-tab: perturb the parameter TABLES per iteration so
        # the parameter-only operand staging (_fused_prep's table-slab
        # einsums, hi/lo split, one-hots, env planes) cannot be hoisted
        # either — if the advance's nested scan/cond structure defeats
        # XLA's loop-invariant code motion, THIS number should match the
        # in-context marginal (r4p: ~3.9 ms/eval) while the plain loop
        # stays at ~3.1.
        if "--fused-jolt-tab" in sys.argv:
            tab_names = {plan.cov1.name, plan.cov2.name, plan.rot.name}

            def joltp(i):
                s = 1.0 + 1e-12 * jnp.sin(i.astype(jnp.float32))
                return {k: ({**v, "interaction_param":
                             v["interaction_param"] * s}
                            if k in tab_names and "interaction_param" in v
                            else v)
                        for k, v in params.items()}

            def body_fused_tab(i, o):
                pj = joltp(i)

                def loss(oo):
                    r = plan.compute(pj, oo)
                    return sum(jnp.sum(v * v) for v in r.values())

                _, g = jax.vmap(jax.value_and_grad(loss))(o)
                return jax.tree_util.tree_map(
                    lambda x, gg: x + 1e-9 * gg, o, g)

            loop_time(body_fused_tab, outs0, n_iters,
                      "fused fwd+bwd, tables jolted (live staging)")

    # ---- 2b. full downstream block (fused kernel + member nodes) --------
    # Everything below the upstream cut: the fused Pallas call PLUS the
    # member nodes that consume it (coverage energies, env, and the
    # rotamer node's assemblies + warm-start BP + VJP), differentiated
    # wrt the upstream outputs.  full - upstream - down = residual
    # glue/HBM-traffic between the blocks.  --bp-jolt applies here too so
    # the BP solve runs an MD-like sweep count.
    #
    # "memb" is the same block with the fused Pallas call STUBBED by its
    # (stop-gradient) cached outputs: member-node XLA glue + BP only —
    # memb minus the bp piece isolates the member glue (E1 assembly,
    # coverage/env node post-processing, and the gather/scatter chains
    # around the kernel inputs).
    if {"down", "memb"} & only:
        jolt_d = [float(a.split("=", 1)[1]) for a in sys.argv
                  if a.startswith("--bp-jolt=")]
        jolt_d = jolt_d[0] if jolt_d else 1e-6
        # member args beyond plan.input_names (e.g. the env node's
        # weighted_pos input) must also cross the cut
        needed = plan.input_names | {
            a for s in system.specs if s.name in plan.member_names
            for a in s.args}

        def upstream_down(p):
            outputs = {"pos": p}
            extra = {"_cache_out": {}}
            for s in system.specs:
                if s.name in plan.member_names \
                        and s.name not in needed_members:
                    continue
                inputs = [outputs[a] for a in s.args]
                extra["_node_name"] = s.name
                outputs[s.name] = s.node_type.compute(
                    s.consts, params.get(s.name, {}), inputs, extra)
            return {k: outputs[k] for k in needed if k in outputs}

        outs0 = jax.jit(jax.vmap(upstream_down))(posb)
        cache0 = system.init_cache()

        def down_energy(o, cache):
            outputs = dict(o)
            extra = {"_cache": cache, "_cache_out": {}}
            extra["_fused"] = plan.compute(params, outputs)
            tot = 0.0
            for s in system.specs:
                if s.name not in plan.member_names:
                    continue
                inputs = [outputs[a] for a in s.args]
                extra["_node_name"] = s.name
                out = s.node_type.compute(s.consts,
                                          params.get(s.name, {}),
                                          inputs, extra)
                if s.node_type.is_potential:
                    tot = tot + jnp.sum(out)
                else:
                    outputs[s.name] = out
            return tot, extra["_cache_out"]

        # converge once for a warm cache
        _, cache_w = jax.jit(jax.vmap(
            lambda o: down_energy(o, cache0)))(outs0)
        down_vg = jax.vmap(jax.value_and_grad(down_energy, has_aux=True))

        def body_down(i, carry):
            o, cache = carry
            o2 = jax.tree_util.tree_map(
                lambda x: x * (1.0 + jolt_d * jnp.sin(
                    i.astype(jnp.float32))), o)
            (_, cache), g = down_vg(o2, cache)
            return (jax.tree_util.tree_map(
                lambda x, gg: x + 0.0 * gg, o, g),
                jax.tree_util.tree_map(jax.lax.stop_gradient, cache))

        rot_name = plan.rot.name

        def report_sweeps(body, carry, tag):
            """Mean BP sweeps inside a piece loop (diagnostics col 7 of
            the threaded cache) — detects when the node's warm-start
            extrapolation mispredicts the synthetic jolt and the piece
            runs more sweeps than MD would."""
            @jax.jit
            def final_cache(carry):
                return jax.lax.fori_loop(0, n_iters, body, carry)[1]
            nbf = final_cache(carry)[rot_name][0]
            if nbf.shape[-1] < 8:   # XLA BP path: no diagnostics columns
                return
            print(f"{'':4s}{tag}: mean sweeps "
                  f"{float(jnp.mean(nbf[:, 0, 7])):.2f}")

        if "down" in only:
            loop_time(body_down, (outs0, cache_w), n_iters,
                      "downstream block (fused+members+BP) e+g")
            report_sweeps(body_down, (outs0, cache_w), "down")

        if "memb" in only:
            fused0 = jax.jit(jax.vmap(
                lambda o: plan.compute(params, o)))(outs0)
            fused0 = jax.tree_util.tree_map(jax.lax.stop_gradient, fused0)

            def memb_energy(o, fused, cache):
                outputs = dict(o)
                extra = {"_cache": cache, "_cache_out": {},
                         "_fused": fused}
                tot = 0.0
                for s in system.specs:
                    if s.name not in plan.member_names:
                        continue
                    inputs = [outputs[a] for a in s.args]
                    extra["_node_name"] = s.name
                    out = s.node_type.compute(s.consts,
                                              params.get(s.name, {}),
                                              inputs, extra)
                    if s.node_type.is_potential:
                        tot = tot + jnp.sum(out)
                    else:
                        outputs[s.name] = out
                return tot, extra["_cache_out"]

            _, mcache_w = jax.jit(jax.vmap(
                lambda o, f: memb_energy(o, f, cache0)))(outs0, fused0)
            memb_vg = jax.vmap(jax.value_and_grad(memb_energy,
                                                  has_aux=True))

            def body_memb(i, carry):
                o, cache = carry
                o2 = jax.tree_util.tree_map(
                    lambda x: x * (1.0 + jolt_d * jnp.sin(
                        i.astype(jnp.float32))), o)
                (_, cache), g = memb_vg(o2, fused0, cache)
                return (jax.tree_util.tree_map(
                    lambda x, gg: x + 0.0 * gg, o, g),
                    jax.tree_util.tree_map(jax.lax.stop_gradient, cache))

            loop_time(body_memb, (outs0, mcache_w), n_iters,
                      "member nodes only (fused stubbed) e+g")
            report_sweeps(body_memb, (outs0, mcache_w), "memb")

    # ---- 3. BP mega-kernel (warm start, like MD) -----------------------
    if "bp" not in only and not ({"full", "glue", "nobp",
                                  "nofused"} & only):
        return
    if "bp" in only:
        from upside_md_tpu.nodes.rotamer import (assemble_one_body,
                                                 assemble_pair_grid)
        from upside_md_tpu.ops.pallas_bp import (LANE, _scatter_onehots,
                                                 bp_bethe_pairs)
        rot = plan.rot
        consts, rparams = rot.consts, params[rot.name]

        def rot_inputs(o):
            inputs = [o[a] for a in rot.args]
            x, E1, offset, prob, valid = assemble_one_body(consts, rparams,
                                                           inputs)
            E_pair, _ = assemble_pair_grid(consts, rparams, x)
            return E1, E_pair

        # make the coverage outputs available to rot_inputs
        def full_outputs(p):
            outputs = {"pos": p}
            extra = {"_cache_out": {}}
            for s in system.specs:
                if s.name == plan.rot.name:
                    continue
                inputs = [outputs[a] for a in s.args]
                extra["_node_name"] = s.name
                outputs[s.name] = s.node_type.compute(
                    s.consts, params.get(s.name, {}), inputs, extra)
            return {k: outputs[k] for k in set(rot.args) | {"pos"}}

        outs_full = jax.jit(jax.vmap(full_outputs))(posb)
        E1, E_pair = jax.jit(jax.vmap(rot_inputs))(outs_full)
        valid = jnp.asarray(consts["valid"])
        n_bead = E_pair.shape[1]
        nbp = -(-n_bead // LANE) * LANE
        S6 = jnp.asarray(_scatter_onehots(consts["res"], consts["rot"], nbp))
        S6T = jnp.asarray(np.ascontiguousarray(
            _scatter_onehots(consts["res"], consts["rot"], nbp).T))
        # CPU smoke-testing hook: interpret-mode kernels off-TPU
        interp = jax.default_backend() != "tpu"
        # --bp-zero: max_iter=0 skips the solve entirely (scatter dots +
        # Bethe/gradient assembly + exp only) — separates solve cost from
        # assembly cost
        max_iter = 0 if "--bp-zero" in sys.argv else int(consts["max_iter"])
        static = (int(consts["n_res"]), float(consts["damping"]),
                  max_iter, float(consts["tol"]), 2)

        def bp_warm(e1, ep, nb0, eb0):
            return bp_bethe_pairs(static, interp, False,
                                  e1.astype(jnp.float32),
                                  ep.astype(jnp.float32), S6, S6T,
                                  valid, (nb0, eb0))

        # converge once to get warm messages
        def bp_cold(e1, ep):
            return bp_bethe_pairs(static, interp, False,
                                  e1.astype(jnp.float32),
                                  ep.astype(jnp.float32), S6, S6T, valid, None)

        F0, nb0, eb0 = jax.jit(jax.vmap(bp_cold))(E1, E_pair)

        # numeric cross-check: a Mosaic lowering bug in a stacked variant must
        # not be allowed to "win" the A/B with wrong numbers (the variants
        # compute identical sweeps, so cold-solve free energies must agree to
        # float noise).  tools/tpu_session.sh skips variants whose log carries
        # the failure marker.
        variant = os.environ.get("UPSIDE_BP_STACKED", "2")   # package default
        rb = os.environ.get("UPSIDE_BP_RB", "1")
        if "bp" in only and (variant != "0" or rb != "1"):
            os.environ["UPSIDE_BP_STACKED"] = "0"
            os.environ["UPSIDE_BP_RB"] = "1"
            try:
                def bp_cold_ref(e1, ep):
                    return bp_bethe_pairs(static, interp, False,
                                          e1.astype(jnp.float32),
                                          ep.astype(jnp.float32), S6, S6T,
                                          valid, None)
                F_ref = jax.jit(jax.vmap(bp_cold_ref))(E1, E_pair)[0]
            finally:
                os.environ["UPSIDE_BP_STACKED"] = variant
                os.environ["UPSIDE_BP_RB"] = rb
            rel = float(jnp.max(jnp.abs(F0 - F_ref)) /
                        jnp.maximum(jnp.max(jnp.abs(F_ref)), 1.0))
            print(f"variant {variant} rb {rb} vs per-plane: cold-solve "
                  f"free-energy rel err {rel:.3e}")
            if not (rel < 1e-3):
                print("BP VARIANT NUMERIC CHECK FAILED")

        # --bp-jolt=AMP: per-iteration multiplicative perturbation of E_pair.
        # The default 1e-6 leaves the warm start nearly converged (~2 sweeps),
        # which UNDERestimates the in-MD BP cost (bp_sweeps_mean ~7 along a
        # real trajectory, where positions move O(dt) per stage).  Calibrate
        # AMP until the printed mean sweeps matches bench.py's bp_sweeps_mean
        # to read an honest in-MD solve cost.
        jolt = [float(a.split("=", 1)[1]) for a in sys.argv
                if a.startswith("--bp-jolt=")]
        jolt = jolt[0] if jolt else 1e-6

        def body_bp_fwd(i, carry):
            e1, ep, nb, eb = carry
            ep2 = ep * (1.0 + jolt * jnp.sin(i.astype(jnp.float32)))
            F, nb, eb = jax.vmap(bp_warm)(e1, ep2, nb, eb)
            return (e1, ep, jax.lax.stop_gradient(nb),
                    jax.lax.stop_gradient(eb))

        if "bp" in only:
            loop_time(body_bp_fwd, (E1, E_pair, nb0, eb0), n_iters,
                      "BP mega-kernel warm fwd")
            # mean sweeps at this jolt (diagnostics col 7 of the final nb)
            @jax.jit
            def final_nb(carry):
                return jax.lax.fori_loop(0, n_iters, body_bp_fwd, carry)[2]
            nbf = final_nb((E1, E_pair, nb0, eb0))
            print(f"{'':4s}jolt {jolt:g}: mean sweeps "
                  f"{float(jnp.mean(nbf[:, 0, 7])):.2f}")

        def bp_loss(e1, ep, nb, eb):
            F, nb2, eb2 = bp_warm(e1, ep, nb, eb)
            return F, (nb2, eb2)

        bp_vg = jax.vmap(jax.value_and_grad(bp_loss, argnums=(0, 1),
                                            has_aux=True))

        def body_bp_fb(i, carry):
            e1, ep, nb, eb = carry
            ep2 = ep * (1.0 + jolt * jnp.sin(i.astype(jnp.float32)))
            (F, (nb, eb)), (g1, g2) = bp_vg(e1, ep2, nb, eb)
            return (e1 + 0.0 * g1, ep + 0.0 * g2,
                    jax.lax.stop_gradient(nb), jax.lax.stop_gradient(eb))

        if "bp" in only:
            loop_time(body_bp_fb, (E1, E_pair, nb0, eb0), n_iters,
                      "BP mega-kernel warm fwd+VJP")

    # ---- 4. full force evaluation (context) ----------------------------
    if not ({"full", "glue", "nobp", "nofused"} & only):
        return
    from upside_md_tpu.md.sim import Simulation
    sim = Simulation(system, dt=0.009, thermostat_interval=0.135,
                     do_recenter=False)
    state0 = sim.initial_state(pos, params, seed=1234, temperature=0.85,
                               n_replica=n_rep)
    n_rounds = max(n_iters // 3, 1)

    def time_advance(label, the_sim):
        state_box = [state0]

        def adv():
            state_box[0] = the_sim.advance(state_box[0], params, n_rounds,
                                           True)
            return state_box[0].pos

        t = timed(adv)
        print(f"{label:48s} {t / (3 * n_rounds) * 1e3:9.3f} ms/eval"
              f"   ({t*1e3:8.1f} ms / {3*n_rounds})")

    def report_advance_sweeps(the_sim, tag):
        """Mean BP sweeps over one advance round (diagnostics col 7)."""
        st = the_sim.advance(state0, params, 1, True)
        entry = st.cache.get(plan.rot.name)
        nbf = entry[0] if isinstance(entry, tuple) and len(entry) else None
        if nbf is not None and getattr(nbf, "ndim", 0) == 3 \
                and nbf.shape[-1] >= 8:
            print(f"{'':4s}{tag}: mean sweeps "
                  f"{float(jnp.mean(nbf[:, 0, 7])):.2f}")

    if "full" in only:
        time_advance("full advance (context)", sim)
        report_advance_sweeps(sim, "full")

    # ---- 5. MD glue (advance with a trivial force) ----------------------
    # Times everything advance does AROUND the forcefield — integrator
    # stage scan, thermostat cond + RNG, warm-start cache threading (at
    # the REAL cache size: state0 carries the BP nb/eb planes, passed
    # through unchanged), the fori_loop/vmap structure — by substituting
    # a near-free quadratic energy.  full - glue = true forcefield cost
    # inside the loop.  A fresh Simulation instance is required: advance
    # is jitted with self static, so patching the shared instance would
    # silently reuse the full-forcefield trace.
    if "glue" in only:
        import copy

        glue_system = copy.copy(system)
        glue_system.energy_and_cache = \
            lambda p, params, extra=None, cache=None: \
            (1e-6 * jnp.sum(p * p), dict(cache or {}))
        glue_sim = Simulation(glue_system, dt=0.009,
                              thermostat_interval=0.135,
                              do_recenter=False)
        time_advance("glue advance (trivial force)", glue_sim)

    # ---- 6. subtractive in-context marginals ----------------------------
    # full − nobp    = the BP mega-kernel's true in-context marginal;
    # full − nofused = the fused pair block's (fwd + bwd + its operand
    # staging).  The isolated pieces (fused/bp/memb) time kernels in a
    # synthetic loop OUTSIDE the real MD program; r4n measured their sum
    # ~1.2 ms/eval (64 reps) short of the real advance while the jaxpr
    # audit (tools/jaxpr_audit.py) found no structural fat.  These stubs
    # remove ONE component from the REAL advance, so the delta vs
    # --only=full includes every staging/scheduling cost isolation cannot
    # see.  Stubs perturb the BP sweep count (printed); correct deltas
    # with the measured ~0.085 ms/sweep (64 reps).
    if "nobp" in only:
        from upside_md_tpu.ops import pallas_bp as _pbp
        if jax.default_backend() != "tpu":
            # CPU smoke hook: take the Pallas-BP branch (the kernel
            # itself is stubbed, so no real pallas_call runs for BP)
            import upside_md_tpu.nodes.rotamer as _rot
            _rot._use_pallas_bp = lambda n_res: n_res <= 128
        real_bp = _pbp.bp_bethe_pairs

        def stub_bp(static, interpret, bf16, E1, E_pair, S6, S6T, valid,
                    init):
            # data-dependent F keeps the E_pair cotangent (and the fused
            # backward it feeds) alive and non-hoistable
            nb0, eb0 = init
            F = 1e-12 * (jnp.sum(E_pair * E_pair) + jnp.sum(E1 * E1))
            return F, nb0, eb0

        _pbp.bp_bethe_pairs = stub_bp
        try:
            nobp_sim = Simulation(system, dt=0.009,
                                  thermostat_interval=0.135,
                                  do_recenter=False)
            time_advance("full advance, BP kernel stubbed", nobp_sim)
        finally:
            _pbp.bp_bethe_pairs = real_bp

    if "nofused" in only:
        import copy

        # one replica's real fused outputs, frozen as loop constants: BP
        # solves the true pair problem while the fused kernels (and their
        # operand staging) vanish from the program
        o0 = jax.jit(jax.vmap(upstream))(posb)
        fused_all = jax.jit(jax.vmap(lambda o: plan.compute(params, o)))(o0)
        fused_c = jax.tree_util.tree_map(
            lambda x: jax.lax.stop_gradient(x[0]), fused_all)

        stub_plan = copy.copy(plan)
        stub_plan.compute = (lambda params_, outputs_, prepared=None:
                             dict(fused_c))
        nofused_system = copy.copy(system)
        nofused_system.pair_fusion = stub_plan
        nofused_sim = Simulation(nofused_system, dt=0.009,
                                 thermostat_interval=0.135,
                                 do_recenter=False)
        time_advance("full advance, fused block stubbed", nofused_sim)
        report_advance_sweeps(nofused_sim, "nofused")


if __name__ == "__main__":
    main()
