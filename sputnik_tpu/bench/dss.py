"""DSS path shootout: planned flat vs traced worklist vs CACHED worklist.

The round-3 verdict asked the traced-metadata DSS premium (104.2 us vs
the planned flat path's 47.4 at d=2048, 25% x 25%) to come down to
<= 1.5x. Round 4 built the lever — :func:`kernels.bsr_dss.build_dss_worklist`
returns a reusable pytree so the ~10 small on-device metadata ops
(cumsum / searchsorted / argsort) run once per topology pair instead of
once per call (the MatmulEx discipline; the reference rebuilds per call,
"TODO: cache", ``dss_*_tn_align8.cu:99-110``) — but never measured it.
This module is that measurement, as a reproducible command:

    python -m sputnik_tpu.bench.dss [--d 2048] [--densities 0.25 0.1]

Writes docs/dss_paths.json. Paths measured per (density_a x density_b):

* ``flat_planned``   — host-planned exact schedule (``plan_dss``), the
                       concrete-metadata fast path.
* ``worklist_traced``— the work list built ON DEVICE inside the jitted
                       call (what a fully-traced training step pays
                       every step if it never caches).
* ``worklist_cached``— ``build_dss_worklist`` once outside, the pytree
                       passed back in (what a training step SHOULD do:
                       topology changes per refresh, not per step).
* ``masked_stream``  — the full-row-extent masked kernel (round-2
                       fallback, kept for reference).
* ``densify``        — the XLA dense-detour.
"""

from __future__ import annotations

import argparse
import json
import sys

import jax.numpy as jnp
import numpy as np


def run(d: int = 2048, densities=(0.25, 0.1), dtype_name: str = "bfloat16",
        chain: int = 8, runs: int = 3):
    from sputnik_tpu.kernels import bsr_dss, bsr_flat, via_dense
    from sputnik_tpu.utils import testing
    from sputnik_tpu.utils.profiling import device_time

    dtype = jnp.dtype(dtype_name)
    rows = []
    for density in densities:
        rng = np.random.default_rng(7)
        a = testing.random_bsr(rng, d, d, int(d * d * density), 128,
                               dtype=dtype)
        b = testing.random_bsr(rng, d, d, int(d * d * density), 128,
                               dtype=dtype)
        plan = bsr_flat.plan_dss(a, b)
        wl = bsr_dss.build_dss_worklist(a, b)
        n_real = int(np.asarray(wl.flags).sum())
        budget = bsr_dss.worklist_budget(a, b)

        paths = {
            "flat_planned": lambda da, db: bsr_flat.dss_flat(
                a.with_data(da), b.with_data(db), schedule=plan),
            "worklist_traced": lambda da, db: bsr_dss.dss_worklist(
                a.with_data(da), b.with_data(db)),
            "worklist_cached": lambda da, db: bsr_dss.dss_worklist(
                a.with_data(da), b.with_data(db), worklist=wl),
            "masked_stream": lambda da, db: bsr_dss.dss(
                a.with_data(da), b.with_data(db)),
            "densify": lambda da, db: via_dense.dss(
                a.with_data(da), b.with_data(db)),
        }
        for name, fn in paths.items():
            def timed(da, db, _fn=fn):
                return _fn(da, db)

            try:
                m = device_time(timed, a.data, b.data, chain=chain,
                                runs=runs, perturb_index=0)
            except Exception as e:
                rows.append({"path": name, "density": density,
                             "error": str(e)[:120]})
                print(f"{name} @{density}: ERROR {str(e)[:80]}",
                      file=sys.stderr)
                continue
            rows.append({
                "path": name,
                "d": d,
                "density": density,
                "time_us": m["time_s"] * 1e6,
                "timing": m["timing"],
                "real_items": n_real,
                "budget": int(budget),
            })
            print(f"{name} @{density}: {m['time_s']*1e6:.1f} us "
                  f"({m['timing']})", file=sys.stderr)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=2048)
    ap.add_argument("--densities", type=float, nargs="+", default=[0.25, 0.1])
    ap.add_argument("--out", default="docs/dss_paths.json")
    args = ap.parse_args()
    rows = run(args.d, tuple(args.densities))
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"(written to {args.out})", file=sys.stderr)


if __name__ == "__main__":
    main()
