"""Headline benchmark: BSR DSD SpMM (the MegaBlocks forward workhorse).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value        = effective GFLOP/s (2 * nnz * N / t) at the headline config
               (4096^2, 25% block density, block 128, bf16 — the reference
               benchmark grid's d=4096 point, dsd_benchmark.cu:32-46).
vs_baseline  = fraction of the roofline speed-of-light for this config on
               this chip (max of compute-bound and bandwidth-bound time,
               v5e peak: 197 TFLOP/s bf16, 819 GB/s HBM). BASELINE.json's
               target is >= 0.8.

Timing protocol mirrors the reference benchmarks (warmup + many timed
iterations; dsd_benchmark.cu:82-107) adapted for the axon tunnel's ~1 ms
dispatch latency: ops are chained inside one jitted function.

``python bench.py --full`` additionally writes the reference-mirroring
shape x sparsity grid to bench_results.json (stderr progress, stdout still
one line).
"""

import argparse
import json
import sys
import time

import numpy as np

PEAK_BF16_FLOPS = 197e12  # TPU v5e
PEAK_HBM_BPS = 819e9


def _bench_dsd(d: int, density: float, dtype_name: str = "bfloat16", chain: int = 8,
               iters: int = 10):
    import jax
    import jax.numpy as jnp
    import sputnik_tpu
    from sputnik_tpu.utils import testing

    dtype = jnp.dtype(dtype_name)
    rng = np.random.default_rng(42)
    a = testing.random_bsr(rng, d, d, int(d * d * density), 128, dtype=dtype)
    b = jnp.asarray(rng.standard_normal((d, d)).astype(np.float32)).astype(dtype)

    @jax.jit
    def chained(a_, b_):
        x = b_
        for _ in range(chain):
            x = sputnik_tpu.matmul_dsd(a_, x)
        return x

    jax.block_until_ready(chained(a, b))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = chained(a, b)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (iters * chain)

    flops = 2 * a.nnz * d
    itemsize = jnp.dtype(dtype).itemsize
    # Roofline: every nonzero block forces one read of a (128, N) B panel;
    # A blocks stream once per n-pass; the output writes once.
    n_tile = min(2048, d)
    n_passes = d // n_tile
    bytes_moved = (
        a.nnz_blocks * 128 * d * itemsize  # B gathers
        + a.nnz * itemsize * n_passes  # A stream per n-pass
        + d * d * itemsize  # output
    )
    sol_t = max(flops / PEAK_BF16_FLOPS, bytes_moved / PEAK_HBM_BPS)
    return {
        "time_s": dt,
        "gflops": flops / dt / 1e9,
        "sol_gflops": flops / sol_t / 1e9,
        "frac_sol": sol_t / dt,
        "nnz_blocks": a.nnz_blocks,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="also run the grid")
    ap.add_argument("--d", type=int, default=4096)
    ap.add_argument("--density", type=float, default=0.25)
    args = ap.parse_args()

    r = _bench_dsd(args.d, args.density)
    line = {
        "metric": f"bsr_dsd_spmm_bf16_d{args.d}_density{args.density}",
        "value": round(r["gflops"], 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(r["frac_sol"], 4),
    }

    if args.full:
        grid = []
        for d in (1024, 2048, 4096, 8192):
            for density in (1.0, 0.5, 0.25, 0.1):
                try:
                    g = _bench_dsd(d, density, iters=5)
                    g.update(d=d, density=density)
                    grid.append(g)
                    print(f"d={d} density={density}: {g['gflops']:.0f} GFLOP/s "
                          f"({g['frac_sol']:.2f} of SoL)", file=sys.stderr)
                except Exception as e:  # keep the sweep going
                    print(f"d={d} density={density}: FAILED {e}", file=sys.stderr)
        with open("bench_results.json", "w") as f:
            json.dump(grid, f, indent=2)

    print(json.dumps(line))


if __name__ == "__main__":
    main()
