"""Produce the BENCH_NOTES multi-chip projection table from a bench_all log.

VERDICT #10: publish the measured single-chip replica-scaling curve and
an honestly-LABELED v5e-8 projection alongside — never instead of — the
single-chip number.  Replicas are embarrassingly parallel between
exchange rounds (parallel/mesh.py sharded_advance), so a v5e-8 pod runs
8 independent replica shards; the projection multiplies the measured
per-chip aggregate at the per-chip replica count by 8.

Usage: python tools/projection.py bench_logs/<dir>/bench_all.log
"""

import re
import sys


def parse(path):
    rows = []
    for line in open(path):
        m = re.match(r"full FF 76-res ubiquitin, (\d+) rep\s+([\d,]+) "
                     r"steps/s", line.strip())
        if m:
            rows.append((int(m.group(1)),
                         float(m.group(2).replace(",", ""))))
    return sorted(rows)


def main():
    rows = parse(sys.argv[1])
    if not rows:
        sys.exit("no ubiquitin scaling rows found in the log")
    print("| replicas/chip | measured aggregate steps/s (1 chip) | "
          "projected v5e-8 (x8, labeled projection) |")
    print("|---|---|---|")
    for n, v in rows:
        print(f"| {n} | {v:,.0f} | {8 * v:,.0f} |")
    best = max(v for _, v in rows)
    print()
    print(f"Best measured single-chip aggregate: {best:,.0f} steps/s "
          f"(vs_baseline {best / 100000:.3f}).")
    print(f"Projected v5e-8 aggregate at that operating point: "
          f"{8 * best:,.0f} steps/s — a PROJECTION from measured "
          f"single-chip throughput x 8 (replica parallelism is "
          f"inter-chip-communication-free between exchange rounds); "
          f"no 8-chip hardware was available to verify.")


if __name__ == "__main__":
    main()
