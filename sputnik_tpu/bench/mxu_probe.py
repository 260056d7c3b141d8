"""MXU depth-floor isolation probe.

Round-3 finding: every DSD/DDS schedule (stream / cres / gres / qstream)
converges to ~0.95 us per (128,128)@(128,4096) dot at d=4096 — 0.72 of the
197 TFLOP/s spec peak — no matter how blocks are batched into grid steps or
how much panel refetch traffic is eliminated. This probe isolates WHERE that
cost lives by running a dense, metadata-free Pallas kernel with the exact
stream-DSD structure (fp32 accumulator scratch revisited across contraction
steps, one ``dot_general`` per step) while sweeping the per-dot contraction
depth. No sparsity, no scalar prefetch, contiguous operands — any residual
gap to peak is the MXU/accumulator cost itself, not the sparse machinery.

Variants:
  * ``acc``      — acc_ref += dot (the stream kernel's RMW accumulate)
  * ``overwrite``— acc_ref  = dot (wrong math, isolates the RMW read cost)
  * ``xla``      — jnp.dot of the full (M,K)@(K,N) as the XLA reference

Run:  python -m sputnik_tpu.bench.mxu_probe   (on the real TPU)
Writes docs/mxu_probe.json and a markdown table to stdout.

Reference analogue: the CUTLASS ``StepsK`` tuning study the reference's
ConfigHelper encodes (``block/cutlass/block_gemm.h:129-192``) — the TPU
question is per-``dot_general`` depth, not threadblock shape.
"""

from __future__ import annotations

import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sputnik_tpu.kernels.common import compiler_params, use_interpret

PEAK_BF16 = 197e12


def _probe_kernel(a_ref, b_ref, out_ref, acc_ref, *, k_steps, accumulate):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    d = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if accumulate:
        acc_ref[:] += d
    else:
        acc_ref[:] = d

    @pl.when(j == k_steps - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def dense_stream(a, b, *, depth: int, n_tile: int = 4096,
                 accumulate: bool = True, interpret: bool | None = None):
    """C = A @ B with the stream-DSD grid structure at contraction ``depth``."""
    interpret = use_interpret() if interpret is None else interpret
    m, k = a.shape
    k2, n = b.shape
    assert k == k2 and m % 128 == 0 and k % depth == 0
    bn = min(n_tile, n)
    isz = jnp.dtype(a.dtype).itemsize
    # Keep the double-buffered working set inside VMEM (the B panel is the
    # big term: 2 * depth * bn * isz); shrink the n tile at deep depths.
    while bn > 128 and 2 * (depth * bn + 128 * depth) * isz + 8 * 128 * bn > (100 << 20):
        bn //= 2
    k_steps = k // depth
    grid = (m // 128, n // bn, k_steps)
    kernel = functools.partial(
        _probe_kernel, k_steps=k_steps, accumulate=accumulate
    )
    vmem_limit = min(
        110 << 20,
        2 * (depth * bn + 128 * depth) * isz + 12 * 128 * bn + (4 << 20),
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((128, depth), lambda i, p, j: (i, j)),
            pl.BlockSpec((depth, bn), lambda i, p, j: (j, p)),
        ],
        out_specs=pl.BlockSpec((128, bn), lambda i, p, j: (i, p)),
        scratch_shapes=[pltpu.VMEM((128, bn), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((m, n), a.dtype),
        compiler_params=compiler_params(
            ("parallel", "parallel", "arbitrary"), vmem_limit_bytes=vmem_limit
        ),
        interpret=interpret,
    )(a, b)


def _resident_kernel(a_ref, b_ref, out_ref, acc_ref, *, k_steps, depth):
    """B whole in VMEM (constant-index spec): isolates per-dot MXU cost at
    ``depth`` with ZERO per-step HBM traffic — the acc_d* rows above refetch
    the B panel per m-tile and are HBM-bound, not MXU-bound."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    panel = b_ref[pl.ds(j * depth, depth), :]
    acc_ref[:] += jax.lax.dot_general(
        a_ref[:, pl.ds(j * depth, depth)], panel,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == k_steps - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def resident_stream(a, b, *, depth: int, mt: int = 128,
                    interpret: bool | None = None):
    """C = A @ B, B VMEM-resident, one depth-``depth`` dot per grid step.

    ``mt`` sweeps the output m-tile (the round-3 probe hardwired 128 —
    the stream kernels' block size — leaving the m-tile lever unmeasured)."""
    interpret = use_interpret() if interpret is None else interpret
    m, k = a.shape
    k2, n = b.shape
    assert k == k2 and m % mt == 0 and k % depth == 0
    k_steps = k // depth
    isz = jnp.dtype(a.dtype).itemsize
    vmem_limit = min(110 << 20, k * n * isz + 2 * mt * k * isz
                     + 12 * mt * n + (4 << 20))
    return pl.pallas_call(
        functools.partial(_resident_kernel, k_steps=k_steps, depth=depth),
        grid=(m // mt, k_steps),
        in_specs=[
            pl.BlockSpec((mt, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, n), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((mt, n), lambda i, j: (i, 0)),
        scratch_shapes=[pltpu.VMEM((mt, n), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((m, n), a.dtype),
        compiler_params=compiler_params(
            ("parallel", "arbitrary"), vmem_limit_bytes=vmem_limit
        ),
        interpret=interpret,
    )(a, b)


def _sweep_kernel(a_ref, b_ref, out_ref, acc_ref, *, k_steps):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == k_steps - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def tiled_matmul(a, b, *, bm, bk, bn, interpret: bool | None = None):
    """Dense pipelined 3D-grid matmul at an explicit (bm, bk, bn) tile —
    the probe behind the round-4 per-dot shape law (PERFORMANCE.md):
    per-dot streaming length bm is the MXU lever; bm=128 caps at ~0.77 at
    ANY depth while (512, 4096, 512) reaches 0.93."""
    interpret = use_interpret() if interpret is None else interpret
    m, k = a.shape
    _, n = b.shape
    k_steps = k // bk
    return pl.pallas_call(
        functools.partial(_sweep_kernel, k_steps=k_steps),
        grid=(m // bm, n // bn, k_steps),
        in_specs=[pl.BlockSpec((bm, bk), lambda i, p, j: (i, j)),
                  pl.BlockSpec((bk, bn), lambda i, p, j: (j, p))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, p, j: (i, p)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((m, n), a.dtype),
        compiler_params=compiler_params(
            ("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 << 20,
        ),
        interpret=interpret,
    )(a, b)


# The round-4 sweep grid: the XLA-class shapes, the shallow-bk corner the
# sparse schedules are constrained to, and the tall-skinny failure row.
SWEEP_CONFIGS = (
    (128, 2048, 2048),
    (256, 1024, 1024), (256, 2048, 1024),
    (512, 512, 512), (512, 1024, 1024), (512, 2048, 1024), (512, 4096, 512),
    (1024, 1024, 1024),
    (512, 128, 1024), (512, 128, 2048), (1024, 128, 1024), (1024, 128, 512),
    (512, 256, 1024), (1024, 256, 1024),
    (2048, 128, 128), (4096, 128, 128), (4096, 128, 256),
)


def run_dense_sweep(m=1024, k=4096, n=4096, configs=SWEEP_CONFIGS,
                    chain=4, runs=3):
    from sputnik_tpu.utils.profiling import device_time

    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
    flops = 2.0 * m * k * n
    rows = []
    for bm, bk, bn in configs:
        if m % bm or k % bk or n % bn:
            continue
        try:
            meas = device_time(
                functools.partial(tiled_matmul, bm=bm, bk=bk, bn=bn),
                a, b, chain=chain, runs=runs, perturb_index=0)
        except Exception as e:
            rows.append({"bm": bm, "bk": bk, "bn": bn,
                         "error": str(e)[:120]})
            continue
        t = meas["time_s"]
        rows.append({
            "bm": bm, "bk": bk, "bn": bn, "m": m, "k": k, "n": n,
            "time_us": t * 1e6, "tflops": flops / t / 1e12,
            "frac_peak": flops / t / PEAK_BF16, "timing": meas["timing"],
        })
        print(f"# bm{bm} bk{bk} bn{bn}: {t*1e6:7.1f} us  "
              f"{flops/t/1e12:6.1f} TF  {flops/t/PEAK_BF16:.3f} of peak",
              file=sys.stderr, flush=True)
    return rows


def run(m=1024, k=4096, n=4096, depths=(128, 256, 512, 1024, 2048, 4096),
        chain=4, runs=3):
    from sputnik_tpu.utils.profiling import device_time

    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
    flops = 2.0 * m * k * n
    rows = []

    def add(name, fn, **kw):
        meas = device_time(fn, a, b, chain=chain, runs=runs, **kw)
        t = meas["time_s"]
        rows.append({
            "variant": name, "m": m, "k": k, "n": n,
            "time_us": t * 1e6,
            "tflops": flops / t / 1e12,
            "frac_peak": flops / t / PEAK_BF16,
            "timing": meas["timing"],
        })
        print(f"# {name}: {t*1e6:.1f} us  {flops/t/1e12:.1f} TF  "
              f"{flops/t/PEAK_BF16:.2f} of peak", file=sys.stderr, flush=True)

    for depth in depths:
        add(f"acc_d{depth}",
            lambda a_, b_, depth=depth: dense_stream(a_, b_, depth=depth),
            perturb_index=0)
    for depth in depths:
        add(f"resident_d{depth}",
            lambda a_, b_, depth=depth: resident_stream(a_, b_, depth=depth),
            perturb_index=0)
    # m-tile sweep at the two interesting depths: does a fatter output tile
    # close the Pallas-vs-XLA gap (0.77 vs 0.90 in round 3)?
    for depth in (1024, 4096):
        for mt in (256, 512, 1024):
            if mt > m or k % depth:
                continue
            add(f"resident_d{depth}_mt{mt}",
                lambda a_, b_, depth=depth, mt=mt: resident_stream(
                    a_, b_, depth=depth, mt=mt),
                perturb_index=0)
    # RMW isolation at the shallow end only (the interesting regime).
    for depth in (128, 256):
        add(f"overwrite_d{depth}",
            lambda a_, b_, depth=depth: dense_stream(
                a_, b_, depth=depth, accumulate=False),
            perturb_index=0)
    # feed mode: scalar-dependent perturbations let XLA's DCE slice the
    # intermediate dots of a pure-XLA chain (utils/profiling.device_time).
    add("xla_dot", lambda a_, b_: jnp.dot(a_, b_),
        perturb_index=0, perturb_mode="feed")  # out (m,n) feeds a (m,k): k==n
    return rows


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1024)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--out", default="docs/mxu_probe.json")
    ap.add_argument("--dense-sweep", action="store_true",
                    help="run the (bm, bk, bn) tile-shape sweep instead "
                         "(writes docs/tile_sweep.json unless --out given)")
    args = ap.parse_args()
    if args.dense_sweep:
        if args.out == "docs/mxu_probe.json":
            args.out = "docs/tile_sweep.json"
        rows = run_dense_sweep(m=args.m, k=args.k, n=args.n)
        print("| bm | bk | bn | time (us) | TFLOP/s | frac of 197 peak |")
        print("|---|---|---|---|---|---|")
        for r in rows:
            if "error" in r:
                print(f"| {r['bm']} | {r['bk']} | {r['bn']} | ERROR | | |")
            else:
                print(f"| {r['bm']} | {r['bk']} | {r['bn']} | "
                      f"{r['time_us']:.1f} | {r['tflops']:.1f} | "
                      f"{r['frac_peak']:.2f} |")
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)
        print(f"(written to {args.out})", file=sys.stderr)
        return
    rows = run(m=args.m, k=args.k, n=args.n)
    print("| variant | time (us) | TFLOP/s | frac of 197 peak |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['variant']} | {r['time_us']:.1f} | {r['tflops']:.1f} | "
              f"{r['frac_peak']:.2f} |")
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"(written to {args.out})", file=sys.stderr)


if __name__ == "__main__":
    main()
