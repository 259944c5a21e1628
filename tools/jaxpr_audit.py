"""Structural audit of the downstream block's jaxpr (CPU trace).

The r4f/r4m piece measurements leave ~1 ms/eval (64 reps) of the
downstream block unattributed: down (fused+members+BP, e+g) exceeds
fused-isolated + memb by more than the BP sweep-count delta explains.
Before optimizing blind, this tool traces the SAME down_energy body
perf_loop times and reports, from the jaxpr:

  * every pallas_call (kernel name, grid, output shapes) — a duplicated
    fused forward or a second BP solve would show up here;
  * every non-pallas equation producing a grid-scale intermediate
    (>= 1 MB per replica) — pads, adds, transposes, selects around the
    kernel handoffs that XLA may or may not fuse away.

Trace-only: pallas_call abstract evaluation does not need a TPU, so this
runs on the CPU backend with the Pallas branches forced
(UPSIDE_FORCE_FUSED=1 plus a _use_pallas_bp monkeypatch).

Usage: python tools/jaxpr_audit.py [n_replica]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("UPSIDE_FORCE_FUSED", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import upside_md_tpu.nodes.rotamer as rotamer_mod

# Force the mega-kernel branch off-TPU (trace only; never executed here).
rotamer_mod._use_pallas_bp = lambda n_res: n_res <= 128

from upside_md_tpu.bench_systems import UBIQUITIN, build_full_system


def build_down(n_rep):
    system, params, pos, aux = build_full_system(seq=UBIQUITIN)
    pos = jnp.asarray(pos)
    posb = jnp.broadcast_to(pos, (n_rep,) + pos.shape)
    plan = system.pair_fusion
    assert plan is not None

    needed_members = {
        s.name for s in system.specs if s.name in plan.member_names
        and any(s.name in t.args for t in system.specs
                if t.name not in plan.member_names)}
    needed = plan.input_names | {
        a for s in system.specs if s.name in plan.member_names
        for a in s.args}

    def upstream_down(p):
        outputs = {"pos": p}
        extra = {"_cache_out": {}}
        for s in system.specs:
            if s.name in plan.member_names and s.name not in needed_members:
                continue
            inputs = [outputs[a] for a in s.args]
            extra["_node_name"] = s.name
            outputs[s.name] = s.node_type.compute(
                s.consts, params.get(s.name, {}), inputs, extra)
        return {k: outputs[k] for k in needed if k in outputs}

    # shapes only — nothing is ever executed (interpret-mode kernels on
    # CPU would take minutes at bench replica counts)
    outs0 = jax.eval_shape(jax.vmap(upstream_down), posb)
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
            out = s.node_type.compute(s.consts, params.get(s.name, {}),
                                      inputs, extra)
            if s.node_type.is_potential:
                tot = tot + jnp.sum(out)
            else:
                outputs[s.name] = out
        return tot, extra["_cache_out"]

    _, cache_w = jax.eval_shape(jax.vmap(
        lambda o: down_energy(o, cache0)), outs0)
    down_vg = jax.vmap(jax.value_and_grad(down_energy, has_aux=True))
    return down_vg, outs0, cache_w


def audit(jaxpr, n_rep, min_mb=0.2):
    """Walk a closed jaxpr (recursing into sub-jaxprs) and report pallas
    calls and large intermediates."""
    pallas = []
    big = {}

    def visit(jx, depth):
        for eqn in jx.eqns:
            prim = eqn.primitive.name
            if prim == "pallas_call":
                name = eqn.params.get("name") or str(
                    eqn.params.get("name_and_src_info", "?")).split(" ")[0]
                grid = None
                gm = eqn.params.get("grid_mapping")
                if gm is not None:
                    grid = getattr(gm, "grid", None)
                outs = [tuple(v.aval.shape) for v in eqn.outvars]
                pallas.append((name, grid, outs))
            else:
                for v in eqn.outvars:
                    sh = getattr(v.aval, "shape", ())
                    if not sh:
                        continue
                    mb = np.prod(sh) * 4 / 1e6
                    if mb >= min_mb * n_rep:
                        key = (prim, tuple(sh))
                        big[key] = big.get(key, 0) + 1
            for sub in jax.core.jaxprs_in_params(eqn.params):
                visit(sub, depth + 1)

    visit(jaxpr.jaxpr, 0)
    return pallas, big


def main():
    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    down_vg, outs0, cache_w = build_down(n_rep)
    jaxpr = jax.make_jaxpr(down_vg)(outs0, cache_w)

    # Drop dead equations first (the trace carries the custom-VJP table
    # cotangent chains even though no table gradient is requested; XLA
    # DCEs them at compile time, so reporting them would be noise).
    from jax.interpreters import partial_eval as pe
    dced, _ = pe.dce_jaxpr(jaxpr.jaxpr,
                           [True] * len(jaxpr.jaxpr.outvars))
    jaxpr = jaxpr.replace(jaxpr=dced)

    pallas, big = audit(jaxpr, n_rep)

    print(f"== pallas_call sites (n_rep={n_rep}) ==")
    for name, grid, outs in pallas:
        outs_s = ", ".join(str(o) for o in outs[:4])
        more = f" +{len(outs)-4} more" if len(outs) > 4 else ""
        print(f"  {name:42s} grid={grid} outs=[{outs_s}{more}]")

    print(f"\n== non-pallas intermediates >= 0.2 MB/replica ==")
    for (prim, sh), cnt in sorted(big.items(),
                                  key=lambda kv: -np.prod(kv[0][1])):
        mb = np.prod(sh) * 4 / 1e6
        print(f"  {prim:28s} {str(sh):28s} x{cnt}   {mb:8.1f} MB total")


if __name__ == "__main__":
    main()
