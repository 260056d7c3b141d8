"""SSS floor probe: (group, kcat) sweep for the exact-intersection SSS
kernel at the audit and headline sizes.

The round-3 verdict asked bsr_sss (published 0.38 at d=2048) for "a
grouped/kcat variant toward 0.6+, or a measured floor note". This module
is the measurement (round 5): at d=2048 the intersection work list is
~70 items — the fixed kernel launch plus the ~200-500 ns/step floor
dominates a ~8 us SoL and NO schedule knob moves it (groups >= 2 tie at
0.47, kcat is measurement noise); at d=4096 (466 items) the same kernel
with the same defaults reaches 0.63 — the floor is the small-problem
regime, not the schedule. The adaptive group clamp (items per output
block averages ~2 at 25% x 25% x 25%) already picks the winner; there is
nothing for autotune to promote.

Run:  python -m sputnik_tpu.bench.sss_floor [--d 2048 4096]
Writes docs/sss_floor.json.
"""

from __future__ import annotations

import argparse
import json
import sys

import jax.numpy as jnp
import numpy as np


def run(ds=(2048, 4096), density: float = 0.25, chain: int = 8, runs: int = 3):
    from sputnik_tpu.bench.models import PEAKS
    from sputnik_tpu.kernels import bsr_flat
    from sputnik_tpu.utils import testing
    from sputnik_tpu.utils.profiling import device_time

    rows = []
    for d in ds:
        rng = np.random.default_rng(7)
        a = testing.random_bsr(rng, d, d, int(d * d * density), 128,
                               dtype=jnp.bfloat16)
        b = testing.random_bsr(rng, d, d, int(d * d * density), 128,
                               dtype=jnp.bfloat16)
        topo = testing.random_bsr(rng, d, d, int(d * d * density), 128,
                                  dtype=jnp.bfloat16)
        for group in (1, 2, 4, 8, 16):
            for kcat in (False, True):
                plan = bsr_flat.plan_sss(a, b, topo, group=group)
                n_items = plan.total
                flops = 2 * n_items * 128 * 128 * 128
                byts = (2 * n_items + topo.nnz_blocks) * 128 * 128 * 2
                sol = max(flops / PEAKS["bf16_flops"],
                          byts / PEAKS["hbm_bps"])

                def fn(da, db, _plan=plan, _kcat=kcat):
                    return bsr_flat.sss_flat(
                        a.with_data(da), b.with_data(db), topo,
                        schedule=_plan, kcat=_kcat).data

                try:
                    m = device_time(fn, a.data, b.data, chain=chain,
                                    runs=runs, perturb_index=0)
                except Exception as e:
                    rows.append({"d": d, "group": group, "kcat": kcat,
                                 "error": str(e)[:120]})
                    continue
                t = m["time_s"]
                rows.append(dict(
                    d=d, group=group, kcat=kcat, time_us=t * 1e6,
                    n_items=int(n_items), n_steps=int(plan.n_steps),
                    frac_sol=sol / t, timing=m["timing"],
                ))
                print(f"d={d} g={group} kcat={kcat}: {t*1e6:.1f} us "
                      f"frac={sol/t:.2f} steps={plan.n_steps}",
                      file=sys.stderr, flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, nargs="+", default=[2048, 4096])
    ap.add_argument("--density", type=float, default=0.25)
    ap.add_argument("--out", default="docs/sss_floor.json")
    args = ap.parse_args()
    rows = run(tuple(args.d), args.density)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"(written to {args.out})", file=sys.stderr)


if __name__ == "__main__":
    main()
