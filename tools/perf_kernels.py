"""Standalone on-TPU timings of the two dominant kernels at bench shapes.

Splits the ~7 ms/eval sidechain complex (tools/perf_ab.py) into:
  * fused pair block forward                      (ops/pallas_quadspline)
  * fused pair block forward+backward
  * rotamer BP mega-kernel (solve + Bethe + VJP)  (ops/pallas_bp)
  * full energy+grad (context)

Methodology: host value fetch as sync, median of 3, 64 replicas.
"""

import os
import sys
import time

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


def main():
    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    system, params, pos, aux = build_full_system(seq=UBIQUITIN)
    pos = jnp.asarray(pos)
    posb = jnp.broadcast_to(pos, (n_rep,) + pos.shape) \
        + 1e-3 * jax.random.normal(jax.random.PRNGKey(0),
                                   (n_rep,) + pos.shape, pos.dtype)

    # ---- build the fused-kernel inputs exactly as System.evaluate does --
    plan = system.pair_fusion
    assert plan is not None

    def upstream(p):
        """Evaluate every node except the rotamer itself (unfused path),
        returning all outputs the fused kernel / BP assembly consume."""
        outputs = {"pos": p}
        extra = {"_cache_out": {}}
        for s in system.specs:
            if s.name == plan.rot.name:
                continue
            inputs = [outputs[a] for a in s.args]
            extra["_node_name"] = s.name
            outputs[s.name] = s.node_type.compute(
                s.consts, params.get(s.name, {}), inputs, extra)
        keys = set(plan.cov1.args) | set(plan.cov2.args) \
            | set(plan.rot.args) | {"pos"}
        return {k: outputs[k] for k in keys if k in outputs}

    up_jit = jax.jit(jax.vmap(upstream))
    outs = up_jit(posb)
    t_up = timed(lambda: up_jit(posb))

    fused_fn = jax.jit(jax.vmap(lambda o: plan.compute(params, o)))
    t_fused_fwd = timed(lambda: fused_fn(outs))

    def fused_loss(o):
        r = plan.compute(params, o)
        return sum(jnp.sum(v) for v in r.values())

    fused_grad = jax.jit(jax.vmap(jax.grad(fused_loss)))
    t_fused_fb = timed(lambda: fused_grad(outs))

    # ---- BP mega-kernel at system shapes --------------------------------
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
        return E1, E_pair, valid

    rot_in_jit = jax.jit(jax.vmap(rot_inputs))
    E1, E_pair, valid = rot_in_jit(outs)
    valid = valid[0]   # static per system; keep unbatched for the kernel
    n_bead = E_pair.shape[1]
    nbp = -(-n_bead // LANE) * LANE
    S6 = _scatter_onehots(consts["res"], consts["rot"], nbp)
    static = (int(consts["n_res"]), float(consts["damping"]),
              int(consts["max_iter"]), float(consts["tol"]), 2)

    def bp(E1, E_pair, valid):
        F, nb, eb = bp_bethe_pairs(static, False, False,
                                   E1.astype(jnp.float32),
                                   E_pair.astype(jnp.float32),
                                   jnp.asarray(S6), jnp.asarray(S6.T),
                                   valid, None)
        return F

    bp_jit = jax.jit(jax.vmap(lambda e1, ep: bp(e1, ep, valid)))
    t_bp = timed(lambda: bp_jit(E1, E_pair))

    bp_grad = jax.jit(jax.vmap(jax.grad(
        lambda e1, ep: bp(e1, ep, valid), argnums=(0, 1))))
    t_bp_g = timed(lambda: bp_grad(E1, E_pair))

    # ---- full energy+grad context ---------------------------------------
    eg = jax.jit(jax.vmap(jax.value_and_grad(
        lambda p: system.energy(p, params))))
    t_eg = timed(lambda: eg(posb))

    print(f"n_replica = {n_rep}")
    print(f"upstream (to fused trigger)      {t_up*1e3:8.2f} ms")
    print(f"fused pair block fwd             {t_fused_fwd*1e3:8.2f} ms"
          f"   (minus upstream: {(t_fused_fwd-t_up)*1e3:6.2f})")
    print(f"fused pair block fwd+bwd         {t_fused_fb*1e3:8.2f} ms"
          f"   (minus upstream: {(t_fused_fb-t_up)*1e3:6.2f})")
    print(f"BP mega-kernel fwd (cold start)  {t_bp*1e3:8.2f} ms")
    print(f"BP mega-kernel fwd+envelope VJP  {t_bp_g*1e3:8.2f} ms")
    print(f"full energy+grad                 {t_eg*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
