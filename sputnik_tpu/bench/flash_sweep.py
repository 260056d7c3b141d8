"""Flash strip-shape sweep: (rows_per_step, group) for the fused
block-sparse attention kernels.

Round-3 verdict queued the "strip-group sweep"; round-4's MXU shape law
(docs/mxu_probe.json) says WHY it should matter: the forward score dot is
(rows_per_step*bs, dh, group*bs), and per-dot efficiency climbs with the
streamed row count (bm) and the output width (bn) — (512, 128, 2048) runs
0.82 of peak where (128, *, *) caps at 0.77 and (bs, dh, bs) singles sit
far below. This module measures the whole grid at the audit config
(T=2048, causal window-8 band, dh=128, bf16) plus the 8-head TRAIN step
(forward + fused flash-2 backward) so the PERFORMANCE.md numbers are a
command, not a one-off.

Run:  python -m sputnik_tpu.bench.flash_sweep [--t 2048] [--heads 8]
Writes docs/flash_sweep.json.

Reference analogue: none (the reference has no attention kernels); the
sweep discipline mirrors its benchmark grids (dsd_benchmark.cu:32-46).
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def run(t: int = 2048, heads: int = 8, dh: int = 128, window: int = 8,
        dtype_name: str = "bfloat16", chain: int = 8, runs: int = 3):
    from sputnik_tpu.bench.models import PEAKS, sol_time
    from sputnik_tpu.kernels.flash_attention import flash_block_attention
    from sputnik_tpu.kernels.flash_mha import flash_mha
    from sputnik_tpu.models import attention as attn_lib
    from sputnik_tpu.utils.profiling import device_time

    dtype = jnp.dtype(dtype_name)
    isz = dtype.itemsize
    rng = np.random.default_rng(3)
    topo = attn_lib.causal_block_topology(t, 128, window_blocks=window,
                                          dtype=dtype)
    q1 = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32)).astype(dtype)
    qh = jnp.asarray(
        rng.standard_normal((heads, t, dh)).astype(np.float32)
    ).astype(dtype)

    # Roofline terms (same model as bench.roofline's flash rows).
    f_flops = 4 * topo.nnz_blocks * 128 * 128 * dh
    f_bytes = topo.nnz_blocks * 2 * 128 * dh * isz + 2 * t * dh * isz
    vpu_elems = 6 * topo.nnz
    peaks = PEAKS

    def sol(flops, bytes_, vpu):
        return sol_time(flops, bytes_, peak_flops=peaks["bf16_flops"],
                        hbm_bps=peaks["hbm_bps"], vpu_elems=vpu)

    rows = []

    def add(name, fn, args, flops, bytes_, vpu, perturb=0):
        try:
            m = device_time(fn, *args, chain=chain, runs=runs,
                            perturb_index=perturb)
            s = sol(flops, bytes_, vpu)
            rows.append({
                "variant": name, "t": t, "time_us": m["time_s"] * 1e6,
                "eff_tflops": flops / m["time_s"] / 1e12,
                "frac_sol": s / m["time_s"], "timing": m["timing"],
            })
            print(f"# {name}: {m['time_s']*1e6:8.1f} us  "
                  f"{s/m['time_s']:.3f} of SoL", file=sys.stderr, flush=True)
        except Exception as e:
            rows.append({"variant": name, "t": t, "error": str(e)[:140]})
            print(f"# {name}: FAILED {str(e)[:120]}", file=sys.stderr,
                  flush=True)

    # Single-head group sweep.
    for g in (2, 4, 8, 16):
        add(
            f"flash_1h_g{g}",
            lambda q_, k_, v_, g=g: flash_block_attention(
                q_, k_, v_, topo, causal=True, group=g),
            (q1, q1 + 0.1, q1 - 0.1), f_flops, f_bytes, vpu_elems,
        )

    # Multi-head (rows_per_step, group) grid.
    for r in (1, 2, 4, 8):
        for g in (2, 4, 8):
            add(
                f"flash_mha_r{r}_g{g}",
                lambda q_, k_, v_, r=r, g=g: flash_mha(
                    q_, k_, v_, topo, causal=True, rows_per_step=r, group=g),
                (qh, qh + 0.1, qh - 0.1),
                heads * f_flops, heads * f_bytes, heads * vpu_elems,
            )

    # The 8-head TRAIN step (forward-in-grad + both fused backward
    # kernels) at the default and the sweep's best forward config.
    fwd_ok = [r for r in rows if r["variant"].startswith("flash_mha")
              and "error" not in r]
    best = min(fwd_ok, key=lambda r: r["time_us"])["variant"] if fwd_ok else None
    train_flops = heads * f_flops * 3  # fwd + dQ + dK/dV passes (approx 3x)
    for label, kw in [("default", {})] + (
        [(best, dict(
            rows_per_step=int(best.split("_r")[1].split("_")[0]),
            group=int(best.split("_g")[1]),
        ))] if best and best != "flash_mha_r2_g4" else []
    ):
        def train(q_, k_, v_, kw=kw):
            def loss(qq, kk, vv):
                return jnp.sum(
                    flash_mha(qq, kk, vv, topo, causal=True, **kw)
                    .astype(jnp.float32) ** 2
                )
            l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q_, k_, v_)
            return grads[0] + l.astype(q_.dtype)

        add(f"flash_mha_train_{label}", train, (qh, qh + 0.1, qh - 0.1),
            train_flops, 3 * heads * f_bytes, 3 * heads * vpu_elems)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=2048)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--out", default="docs/flash_sweep.json")
    args = ap.parse_args()
    rows = run(t=args.t, heads=args.heads, window=args.window,
               chain=args.chain)
    print("| variant | time (us) | frac of SoL |")
    print("|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['variant']} | ERROR {r['error'][:60]} | |")
        else:
            print(f"| {r['variant']} | {r['time_us']:.1f} | "
                  f"{r['frac_sol']:.3f} |")
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"(written to {args.out})", file=sys.stderr)


if __name__ == "__main__":
    main()
