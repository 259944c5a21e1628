"""Compile (never run) the real Simulation.advance for the TPU backend
and dump every custom-call (pallas kernel) plus big in-loop
instructions — the in-context companion to tools/hlo_diff.py.  If the
optimized HLO shows a pallas kernel executed more than once per force
evaluation (XLA rematerialization or CSE failure), that — not operand
staging — is the r4p in-context gap.

Usage: python tools/hlo_advance.py [n_replica]
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache = os.environ.get("JAX_COMPILATION_CACHE",
                       os.path.expanduser("~/.upside_tpu_jax_cache"))
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)

from upside_md_tpu.bench_systems import UBIQUITIN, build_full_system
from upside_md_tpu.md.sim import Simulation
from tools.hlo_diff import report, collect


def main():
    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_rounds = 10

    system, params, pos, aux = build_full_system(seq=UBIQUITIN)
    pos = jnp.asarray(pos)
    sim = Simulation(system, dt=0.009, thermostat_interval=0.135,
                     do_recenter=False)
    state0 = sim.initial_state(pos, params, seed=1234, temperature=0.85,
                               n_replica=n_rep)

    def run(state, params):
        return sim.advance(state, params, n_rounds, True)

    lowered = jax.jit(run).lower(state0, params)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    print(f"advance({n_rounds} rounds, {n_rep} reps): optimized HLO "
          f"{len(hlo)/1e6:.1f} MB of text")

    print("\n== every custom-call ==")
    for line in hlo.splitlines():
        if "custom-call" in line:
            ls = line.strip()
            tgt = re.search(r'custom_call_target="([^"]+)"', ls)
            shp = ls.split(" = ", 1)[1].split(" custom-call")[0] \
                if " = " in ls else "?"
            print(f"  {tgt.group(1) if tgt else '?':30s} {shp[:90]}")

    report(hlo, "advance", min_mb=2.0)


if __name__ == "__main__":
    main()
