"""Prime the persistent autotune cache at chosen configs.

Times every compatible registered variant (``ops.autotune``) for the BSR
matmuls at each (d, density, mode) point and persists the winners, so
subsequent ``registry.dispatch`` calls — bench.py, the roofline audit, user
code — pick the measured-best kernel for those signatures.

Run:  python -m sputnik_tpu.bench.tune [--d 2048 4096] [--densities 0.25]
      [--ops dsd dds sdd] [--modes NN] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import sys

MODES = {"NN": (False, False), "NT": (False, True),
         "TN": (True, False), "TT": (True, True)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, nargs="+", default=[2048, 4096])
    ap.add_argument("--densities", type=float, nargs="+", default=[0.25])
    ap.add_argument("--ops", nargs="+", default=["dsd", "dds", "sdd"])
    ap.add_argument("--modes", nargs="+", default=["NN"],
                    choices=sorted(MODES))
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp

    from sputnik_tpu import ops
    from sputnik_tpu.ops.autotune import autotune, benchmark_variants
    from sputnik_tpu.utils import testing

    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(3)
    for d in args.d:
        for density in args.densities:
            nnz = int(d * d * density)
            a = testing.random_bsr(rng, d, d, nnz, 128, dtype=dtype)
            b = jnp.asarray(
                rng.standard_normal((d, d)).astype(np.float32)
            ).astype(dtype)
            topo = testing.random_bsr(rng, d, d, nnz, 128, dtype=dtype)
            problems = {"dsd": (a, b), "dds": (b, a), "sdd": (b, b, topo)}
            for op in args.ops:
                targs = problems[op]
                for mode in args.modes:
                    ta, tb = MODES[mode]
                    try:
                        times = benchmark_variants(
                            op, *targs, transpose_a=ta, transpose_b=tb)
                        for k, v in sorted(times.items(), key=lambda kv: kv[1]):
                            print(f"{op} d={d} density={density} {mode}: "
                                  f"{k:28s} {v*1e6:9.1f} us", flush=True)
                        win = autotune(op, *targs, transpose_a=ta,
                                       transpose_b=tb, timings=times)
                        print(f"{op} d={d} density={density} {mode} "
                              f"WINNER {win}", flush=True)
                    except Exception as e:
                        print(f"{op} d={d} density={density} {mode}: "
                              f"ERROR {type(e).__name__}: {str(e)[:140]}",
                              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
