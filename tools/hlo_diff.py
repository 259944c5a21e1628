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


OP_RE = re.compile(r"%?[\w.\-]+ = \(?(\S+?)[,)]?\s.*?([a-z][a-z\-]+)\(")


def collect(hlo, min_mb=0.5):
    """(op, shape) -> (count, bytes) for in-while-body instructions."""
    counts = {}
    for line in hlo.splitlines():
        ls = line.strip()
        if "while" not in ls:
            continue
        m = re.match(r"%?[\w.\-]+ = (\(?)((f32|bf16|f16|s32|u32|u8|s8|"
                     r"pred)\[[0-9,]*\])", ls)
        if not m:
            continue
        om = re.search(r"\)?\s([a-z][a-z\-]*)\(", ls)
        if not om:
            continue
        op = om.group(1)
        if op in ("parameter", "constant", "tuple", "while"):
            continue
        b = shape_bytes(m.group(2))
        if b < min_mb * 1e6:
            continue
        key = (op, m.group(2))
        c, _ = counts.get(key, (0, 0))
        counts[key] = (c + 1, b)
    return counts


def report_diff(plain, sq):
    print("\n== in-loop instruction diff (squared − plain), >=0.5 MB ==")
    keys = set(plain) | set(sq)
    rows = []
    for k in keys:
        cp = plain.get(k, (0, 0))[0]
        cs = sq.get(k, (0, 0))[0]
        b = (plain.get(k) or sq.get(k))[1]
        if cs != cp:
            rows.append((abs(cs - cp) * b, k, cp, cs, b))
    for w, (op, shp), cp, cs, b in sorted(rows, reverse=True)[:40]:
        print(f"  {op:18s} {shp:30s} plain x{cp:<3d} sq x{cs:<3d} "
              f"({b/1e6:6.1f} MB each, delta {w/1e6:8.1f} MB)")


def report(hlo, label, min_mb=4.0):
    print(f"\n== {label}: in-loop instructions >= {min_mb} MB ==")
    for (op, shp), (c, b) in sorted(collect(hlo, min_mb).items(),
                                    key=lambda kv: -kv[1][0] * kv[1][1]):
        print(f"  {op:20s} {shp:32s} x{c}  ({c*b/1e6:8.1f} MB total)")


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

    packs = {}
    for sq, label in ((False, "plain (sum v)"), (True, "squared (sum v^2)")):
        if which != "both" and which != ("sq" if sq else "plain"):
            continue
        lowered = jax.jit(make_run(sq)).lower(outs0)
        compiled = lowered.compile()
        hlo = compiled.as_text()
        print(f"{label}: optimized HLO {len(hlo)/1e6:.1f} MB of text")
        report(hlo, label)
        print(f"\n== {label}: every custom-call ==")
        for line in hlo.splitlines():
            if "custom-call" in line:
                ls = line.strip()
                tgt = re.search(r'custom_call_target="([^"]+)"', ls)
                shp = ls.split(" = ", 1)[1].split(" custom-call")[0] \
                    if " = " in ls else "?"
                print(f"  {tgt.group(1) if tgt else '?':30s} {shp[:90]}")
        packs["sq" if sq else "plain"] = collect(hlo)

    if len(packs) == 2:
        report_diff(packs["plain"], packs["sq"])


if __name__ == "__main__":
    main()
