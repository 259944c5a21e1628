"""Summarize a tools/tpu_session.sh log directory into a BENCH_NOTES-ready
markdown block.

Usage: python tools/transcribe_session.py bench_logs/r3_<stamp>

Parses, where present:
  bp0..bp3.log       BP kernel variant A/B (warm fwd / fwd+VJP ms/iter)
  bp_winner          chosen UPSIDE_BP_STACKED value
  bench*.log         bench.py JSON lines (headline, env-fusion, final)
  bench_all.log      per-config rows + replica-scaling curve -> projection
  full*.log          perf_loop full-advance ms/eval under schedule flags
  pieces/prefix/...  attribution tables (echoed verbatim)
"""

import json
import os
import re
import sys


def timing_lines(path):
    out = []
    for line in open(path, errors="replace"):
        if re.search(r"ms/(iter|eval)", line):
            out.append(line.rstrip())
    return out


def last_json(path):
    rec = None
    for line in open(path, errors="replace"):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                rec = json.loads(line)
            except ValueError:
                pass
    return rec


def main():
    d = sys.argv[1]

    print("### TPU session", os.path.basename(d))

    # ---- BP variant A/B -------------------------------------------------
    rows = []
    for v in range(4):
        p = os.path.join(d, f"bp{v}.log")
        if not os.path.exists(p):
            continue
        ms = dict.fromkeys(("warm fwd", "fwd+VJP"))
        bad = False
        for line in open(p, errors="replace"):
            if "NUMERIC CHECK FAILED" in line:
                bad = True
            m = re.match(r"(.+?)\s+([\d.]+) ms/iter", line.strip())
            if m:
                label = m.group(1)
                key = ("fwd+VJP" if "fwd+VJP" in label
                       else "warm fwd" if "warm fwd" in label else None)
                if key:
                    ms[key] = float(m.group(2))
        rows.append((v, ms, bad))
    if rows:
        print("\n| UPSIDE_BP_STACKED | warm fwd ms | fwd+VJP ms | numeric |")
        print("|---|---|---|---|")
        for v, ms, bad in rows:
            print(f"| {v} | {ms.get('warm fwd')} | {ms.get('fwd+VJP')} | "
                  f"{'FAILED' if bad else 'ok'} |")
    wf = os.path.join(d, "bp_winner")
    if os.path.exists(wf):
        print(f"\nwinner: UPSIDE_BP_STACKED={open(wf).read().strip()}")

    # ---- bench JSON lines ----------------------------------------------
    for name in ("bench", "benchenv", "benchfast"):
        p = os.path.join(d, f"{name}.log")
        if os.path.exists(p):
            rec = last_json(p)
            print(f"\n{name}: {json.dumps(rec) if rec else 'NO JSON LINE'}")

    # ---- schedule-flag full-advance A/B --------------------------------
    sched = []
    for name in ("fullbase", "fullenv", "fullex", "fullexnb", "fulldamp04"):
        p = os.path.join(d, f"{name}.log")
        if os.path.exists(p):
            for line in timing_lines(p):
                if "full advance" in line:
                    m = re.search(r"([\d.]+) ms/eval", line)
                    if m:
                        sched.append((name, float(m.group(1))))
    if sched:
        print("\n| schedule | full advance ms/eval |")
        print("|---|---|")
        for name, ms in sched:
            print(f"| {name} | {ms} |")

    # ---- bench_all rows + projection -----------------------------------
    p = os.path.join(d, "bench_all.log")
    if os.path.exists(p):
        print("\nbench_all:")
        scaling = []
        for line in open(p, errors="replace"):
            line = line.rstrip()
            if re.search(r"steps/s$|acceptance|chi1", line):
                print("   ", line.strip())
            m = re.match(r"full FF 76-res ubiquitin, (\d+) rep\s+([\d,]+) "
                         r"steps/s", line.strip())
            if m:
                scaling.append((int(m.group(1)),
                                float(m.group(2).replace(",", ""))))
        if scaling:
            print("\n| replicas/chip | measured (1 chip) | "
                  "projected v5e-8 (x8, labeled projection) |")
            print("|---|---|---|")
            for n, v in sorted(scaling):
                print(f"| {n} | {v:,.0f} | {8 * v:,.0f} |")

    # ---- attribution extras (verbatim timing lines) --------------------
    for name in ("pieces", "rbhi", "rblo", "bp0z", "bpwz", "prefix"):
        p = os.path.join(d, f"{name}.log")
        if os.path.exists(p):
            lines = timing_lines(p)
            if lines:
                print(f"\n{name}:")
                for line in lines:
                    print("   ", line)


if __name__ == "__main__":
    main()
