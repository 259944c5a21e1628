"""Compile (never run) the isolated fused loop bodies for the TPU
backend and report every sizeable non-pallas instruction in the
OPTIMIZED HLO, so the +1.3 ms/iter cost of live cotangents (r4q:
plain fwd+bwd 3.009 vs squared-loss 4.329 ms/iter) can be attributed to
actual compiler output instead of bandwidth guesses.

Usage: python tools/hlo_diff.py [n_replica] [plain|sq|both]
"""

import os
import re
import sys
import collections

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

cache = os.environ.get("JAX_COMPILATION_CACHE",
                       os.path.expanduser("~/.upside_tpu_jax_cache"))
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)

from upside_md_tpu.bench_systems import UBIQUITIN, build_full_system

DT_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f16": 2,
            "u8": 1, "s8": 1}
SHAPE_RE = re.compile(r"(f32|bf16|f16|s32|u32|u8|s8|pred)\[([0-9,]*)\]")


def shape_bytes(text):
    total = 0
    for m in SHAPE_RE.finditer(text):
        dims = [int(d) for d in m.group(2).split(",") if d]
        total += int(np.prod(dims)) * DT_BYTES[m.group(1)] if dims else 0
        break   # first shape = the output of the instruction
    return total


def report(hlo, label, min_mb=4.0):
    print(f"\n== {label}: optimized-HLO instructions with output >= "
          f"{min_mb} MB (inside while bodies) ==")
    counts = collections.Counter()
    rows = []
    for line in hlo.splitlines():
        ls = line.strip()
        m = re.match(r"%?[\w.\-]+ = (\S+) ([a-z\-]+)\(", ls)
        if not m:
            continue
        op = m.group(2)
        if op in ("parameter", "constant", "tuple", "get-tuple-element",
                  "bitcast"):
            continue
        b = shape_bytes(ls)
        if b >= min_mb * 1e6:
            key = (op, ls.split(" = ")[1].split("(")[0].split(" ")[0])
            counts[key] += 1
            if len(rows) < 60:
                rows.append(f"  {b/1e6:8.1f} MB  {ls[:160]}")
    for (op, shp), c in sorted(counts.items(), key=lambda kv: -kv[1]):
        print(f"  {op:20s} {shp:40s} x{c}")
    print("  -- samples --")
    for r in rows[:40]:
        print(r)


def main():
    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    n_iters = 30

    system, params, pos, aux = build_full_system(seq=UBIQUITIN)
    pos = jnp.asarray(pos)
    posb = jnp.broadcast_to(pos, (n_rep,) + pos.shape)
    plan = system.pair_fusion
    needed_members = {
        s.name for s in system.specs if s.name in plan.member_names
        and any(s.name in t.args for t in system.specs
                if t.name not in plan.member_names)}

    def upstream(p):
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

    outs0 = jax.eval_shape(jax.vmap(upstream), posb)

    def make_run(sq):
        def loss(o):
            r = plan.compute(params, o)
            if sq:
                return sum(jnp.sum(v * v) for v in r.values())
            return sum(jnp.sum(v) for v in r.values())

        vg = jax.vmap(jax.value_and_grad(loss))

        def body(i, o):
            _, g = vg(o)
            return jax.tree_util.tree_map(lambda x, gg: x + 1e-9 * gg,
                                          o, g)

        def run(o):
            return jax.lax.fori_loop(0, n_iters, body, o)
        return run

    for sq, label in ((False, "plain (sum v)"), (True, "squared (sum v^2)")):
        if which != "both" and which != ("sq" if sq else "plain"):
            continue
        lowered = jax.jit(make_run(sq)).lower(outs0)
        compiled = lowered.compile()
        hlo = compiled.as_text()
        print(f"{label}: optimized HLO {len(hlo)/1e6:.1f} MB of text")
        report(hlo, label)


if __name__ == "__main__":
    main()
