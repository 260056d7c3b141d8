"""Summarize bsr_grid_results.json into the PERFORMANCE.md tables.

Usage: python -m sputnik_tpu.bench.grid_summary [--in bsr_grid_results.json]
Prints (a) mean frac-of-SoL per op x density (over modes and sizes, the
small-d table's layout), (b) per-size tables, (c) worst rows — so the doc
tables regenerate from the artifact instead of being hand-copied.
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict

OPS = ["dsd", "dds", "sdd", "ssd", "sds", "dss"]


def _fmt(vals):
    reliable = [v for v, r in vals if r]
    if reliable:
        return f"{sum(reliable) / len(reliable):.2f}"
    if vals:
        return "(sub-3 µs)*"
    return "—"


def table(rows, densities, title):
    cells = defaultdict(list)  # (op, density) -> [(frac, reliable)]
    for r in rows:
        if "error" in r:
            continue
        if "frac_sol" in r:
            cells[(r["op"], r["density"])].append((r["frac_sol"], True))
        elif "frac_sol_unreliable" in r:
            cells[(r["op"], r["density"])].append(
                (r["frac_sol_unreliable"], False))
    print(f"\n### {title}\n")
    print("| op | " + " | ".join(f"{int(d*100)}%" for d in densities) + " |")
    print("|---|" + "---|" * len(densities))
    for op in OPS:
        row = [_fmt(cells.get((op, d), [])) for d in densities]
        print(f"| {op} | " + " | ".join(row) + " |")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="path", default="bsr_grid_results.json")
    ap.add_argument("--worst", type=int, default=8)
    args = ap.parse_args()
    rows = json.load(open(args.path))
    sizes = sorted({r["d"] for r in rows})
    densities = sorted({r["density"] for r in rows}, reverse=True)
    errors = [r for r in rows if "error" in r]
    print(f"{len(rows)} rows, sizes {sizes}, densities {densities}, "
          f"{len(errors)} errors")
    for r in errors:
        print(f"  ERROR {r['op']}_{r['mode']} d={r['d']} "
              f"density={r['density']}: {r['error'][:80]}")
    table(rows, densities, f"all sizes ({'/'.join(map(str, sizes))})")
    for d in sizes:
        table([r for r in rows if r["d"] == d], densities, f"d = {d}")
    ranked = sorted((r for r in rows if "frac_sol" in r),
                    key=lambda r: r["frac_sol"])
    print(f"\nWorst {args.worst} reliable rows:")
    for r in ranked[:args.worst]:
        print(f"  {r['op']}_{r['mode']} d={r['d']} density={r['density']}: "
              f"{r['frac_sol']:.2f} ({r['time_us']:.0f} us)")


if __name__ == "__main__":
    main()
