"""Headline-config variant shootout: every DSD variant, one table.

Round-3 verdict: the headline (d=4096, 25% block density, bf16 DSD) sat at
0.70 of speed-of-light for three rounds while the candidate fixes (kcat
depth-concat q-streams, whole-B-resident bres at several q, the m-tile
question) existed only as registered-but-unmeasured code. This module
measures ALL of them at the headline config in one run:

  * every registered variant that ``can_implement`` the problem, via
    ``ops.autotune.benchmark_variants`` (the same machinery dispatch uses);
  * extra parameterized points the registry exposes only at defaults
    (bres q in {4,8,16} x accum in {kcat, value}; qstream kcat q16);
  * persists the winner into the autotune cache so ``bench.py`` and plain
    ``matmul_dsd`` dispatch pick it up.

Run:  python -m sputnik_tpu.bench.headline [--d 4096] [--density 0.25]
Writes docs/headline_shootout.json.

Reference analogue: the benchmark harness at
``block/dsd/dsd_benchmark.cu:32-46`` defines the config; the registry walk
mirrors its per-kernel ``can_launch`` gates (``block/dsd/cutlass/dsd.cu``).
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

import jax.numpy as jnp
import numpy as np


def run(d: int = 4096, density: float = 0.25, dtype_name: str = "bfloat16",
        chain: int = 8, runs: int = 3, persist: bool = True,
        extras_only: bool = False):
    import importlib

    from sputnik_tpu.bench.models import PEAKS, dsd_model
    from sputnik_tpu.kernels import bsr_qstream
    from sputnik_tpu.utils import testing
    from sputnik_tpu.utils.profiling import device_time

    # The ops package re-exports an `autotune` FUNCTION that shadows the
    # module name (see ops/registry.py:_autotune_module).
    autotune_mod = importlib.import_module("sputnik_tpu.ops.autotune")

    dtype = jnp.dtype(dtype_name)
    rng = np.random.default_rng(42)
    a = testing.random_bsr(rng, d, d, int(d * d * density), 128, dtype=dtype)
    b = jnp.asarray(rng.standard_normal((d, d)).astype(np.float32)).astype(dtype)

    isz = dtype.itemsize
    flops, bytes_moved = dsd_model(
        nnz=a.nnz, nnz_blocks=a.nnz_blocks, m=d, n=d, k=d, isz=isz,
        touched_deps=int(len(np.unique(np.asarray(a.indices)))),
    )
    sol_t = max(flops / PEAKS["bf16_flops"], bytes_moved / PEAKS["hbm_bps"])

    if extras_only:
        # Re-time only the incumbent as the control, then the extras.
        from sputnik_tpu.ops import registry as reg

        incumbent = reg.dispatch_name("dsd", a, b)
        timings = {}
        try:
            def _ctl(data, b_):
                return reg.dispatch("dsd", a.with_data(data), b_,
                                    variant=incumbent)

            m = device_time(_ctl, a.data, b, chain=chain, runs=runs,
                            perturb_index=1)
            timings[incumbent] = m["time_s"]
        except Exception as e:
            print(f"# control {incumbent}: FAILED {str(e)[:120]}",
                  file=sys.stderr)
    else:
        timings = autotune_mod.benchmark_variants(
            "dsd", a, b, chain=chain, runs=runs
        )

    # Parameterized extras the registry only exposes at defaults. Round-4
    # shootout #1 found ref-accum q=4 fastest (240.9 us) with kcat/value
    # LOSING (in-kernel concatenate / register-sum copies cost more than
    # the deeper dot saves) and bres == qstream (panel HBM traffic already
    # hidden); this sweep chases the remaining per-step cost: q at ref
    # accum, and the q8 kcat point kept as the depth-thesis control.
    from sputnik_tpu.kernels import bsr_cstack

    extras = {
        "qstream_q2_ref": functools.partial(bsr_qstream.dsd_q, q=2),
        "qstream_q6_ref": functools.partial(bsr_qstream.dsd_q, q=6),
        "qstream_q8_ref": functools.partial(bsr_qstream.dsd_q, q=8),
        "qstream_q4_nt2048": functools.partial(
            bsr_qstream.dsd_q, q=4, n_tile=2048),
        "cstack_q4": functools.partial(bsr_cstack.dsd_cstack, q=4),
        "cstack_q8": functools.partial(bsr_cstack.dsd_cstack, q=8),
        "cstack_q16": functools.partial(bsr_cstack.dsd_cstack, q=16),
        "cstack_q8_nt4096": functools.partial(
            bsr_cstack.dsd_cstack, q=8, n_tile=4096),
        # The round-4 dense tile sweep's law (docs/mxu_probe.json): per-dot
        # STREAMING length bm >= 512 is the MXU lever — (512,128,2048) runs
        # 0.818 of peak and (1024,128,1024) 0.803 where (128,*,*) caps at
        # 0.47-0.77. These are cstack's exact dot shapes at:
        "cstack_q4_nt2048": functools.partial(
            bsr_cstack.dsd_cstack, q=4, n_tile=2048),
        "cstack_q8_nt1024": functools.partial(
            bsr_cstack.dsd_cstack, q=8, n_tile=1024),
    }
    for name, fn in extras.items():
        try:
            def runner(data, b_, _fn=fn):
                return _fn(a.with_data(data), b_)

            m = device_time(runner, a.data, b, chain=chain, runs=runs,
                            perturb_index=1)
            timings[name] = m["time_s"]
        except Exception as e:
            print(f"# {name}: FAILED {str(e)[:120]}", file=sys.stderr)

    rows = []
    for name, t in sorted(timings.items(), key=lambda kv: kv[1]):
        rows.append({
            "variant": name,
            "d": d,
            "density": density,
            "time_us": t * 1e6,
            "eff_tflops": flops / t / 1e12,
            "frac_sol": sol_t / t,
        })
        print(f"# {name}: {t*1e6:8.1f} us  {flops/t/1e12:6.1f} TF eff  "
              f"{sol_t/t:.3f} of SoL", file=sys.stderr, flush=True)

    if persist and timings:
        # Only registry names can be dispatched; extras inform design.
        from sputnik_tpu.ops import registry

        reg_names = {v.name for v in registry.variants_for("dsd")}
        reg_timings = {k: v for k, v in timings.items() if k in reg_names}
        if reg_timings:
            autotune_mod.clear_cache()
            winner = autotune_mod.autotune("dsd", a, b, timings=reg_timings)
            print(f"# autotune winner persisted: {winner}", file=sys.stderr)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=4096)
    ap.add_argument("--density", type=float, default=0.25)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--out", default="docs/headline_shootout.json")
    ap.add_argument("--no-persist", action="store_true")
    ap.add_argument("--extras-only", action="store_true",
                    help="skip the full registry walk; time the incumbent "
                         "+ the parameterized extras only")
    args = ap.parse_args()
    rows = run(d=args.d, density=args.density, chain=args.chain,
               persist=not args.no_persist, extras_only=args.extras_only)
    print("| variant | time (us) | eff TFLOP/s | frac of SoL |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['variant']} | {r['time_us']:.1f} | "
              f"{r['eff_tflops']:.1f} | {r['frac_sol']:.3f} |")
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"(written to {args.out})", file=sys.stderr)


if __name__ == "__main__":
    main()
