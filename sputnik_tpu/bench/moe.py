"""End-to-end MoE FFN benchmark — the MegaBlocks headline workload.

Compares, at equal parameter count on one chip:
  * dense FFN (all experts' parameters as one big FFN — the "no MoE" cost)
  * MoE grouped (fixed capacity -> batched per-expert GEMM, pure MXU)
  * MoE bsr (the SDD -> DSD block-sparse path, same math)
  * MoE dropless (variable block-diagonal topology built on device per
    step — the case that NEEDS the sparse kernels; MegaBlocks' raison
    d'etre, arXiv 2211.15841)

Run:  python -m sputnik_tpu.bench.moe [--d-model 1024] [--d-ff 2048]
      [--experts 8] [--tokens 4096]
Writes JSON lines to stdout.
"""

from __future__ import annotations

import argparse
import json


def run(d_model: int, d_ff: int, n_experts: int, tokens: int, dtype_name: str):
    import jax
    import jax.numpy as jnp

    from sputnik_tpu import models
    from sputnik_tpu.utils.profiling import device_time

    dtype = jnp.dtype(dtype_name)
    cfg = models.MoEConfig(
        d_model=d_model,
        d_ff=d_ff,
        n_experts=n_experts,
        capacity=tokens // n_experts,
        dtype=dtype,
    )
    topo = models.block_diag_topology(cfg)
    params = models.init_moe_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (tokens, d_model), dtype)

    # Useful MoE flops (top-1: each token visits one expert).
    moe_flops = 2 * tokens * d_model * d_ff * 2
    dense_flops = moe_flops * n_experts

    w1 = jax.random.normal(jax.random.PRNGKey(2), (d_model, d_ff * n_experts), dtype)
    w2 = jax.random.normal(jax.random.PRNGKey(3), (d_ff * n_experts, d_model), dtype)

    def dense(w1_, w2_, x_):
        h = jax.nn.gelu(
            jnp.dot(x_, w1_, preferred_element_type=jnp.float32)
        ).astype(dtype)
        return jnp.dot(h, w2_, preferred_element_type=jnp.float32)

    results = []

    def add(name, fn, args, flops, perturb, perturb_mode="row"):
        m = device_time(fn, *args, chain=4, runs=3, perturb_index=perturb,
                        perturb_mode=perturb_mode)
        results.append(
            {
                "impl": name,
                "time_us": m["time_s"] * 1e6,
                "gflops": flops / m["time_s"] / 1e9,
                "timing": m["timing"],
            }
        )

    add("dense_equal_params", dense, (w1, w2, x), dense_flops, 2,
        perturb_mode="roll")  # pure matmul chain: prevent XLA hoisting
    add(
        "moe_grouped",
        lambda p, x_: models.moe_forward(p, x_, cfg, topo, impl="grouped")[0],
        (params, x),
        moe_flops,
        1,
    )
    add(
        "moe_bsr",
        lambda p, x_: models.moe_forward(p, x_, cfg, topo, impl="bsr")[0],
        (params, x),
        moe_flops,
        1,
    )
    add(
        "moe_bsr_unfused",
        lambda p, x_: models.moe_forward(p, x_, cfg, topo, impl="bsr_unfused")[0],
        (params, x),
        moe_flops,
        1,
    )
    add(
        "moe_dropless",
        lambda p, x_: models.dropless_moe_forward(p, x_, cfg)[0],
        (params, x),
        moe_flops,
        1,
    )
    add(
        "moe_dropless_bsr",
        lambda p, x_: models.dropless_moe_forward(p, x_, cfg, impl="bsr")[0],
        (params, x),
        moe_flops,
        1,
    )
    add(
        "moe_dropless_bsr_fused",
        lambda p, x_: models.dropless_moe_forward(p, x_, cfg, impl="bsr_fused")[0],
        (params, x),
        moe_flops,
        1,
    )
    base = results[0]["time_us"]
    for r in results:
        r["speedup_vs_dense"] = base / r["time_us"]
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d-model", type=int, default=1024)
    ap.add_argument("--d-ff", type=int, default=2048)
    ap.add_argument("--experts", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=4096)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    for r in run(args.d_model, args.d_ff, args.experts, args.tokens, args.dtype):
        print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v) for k, v in r.items()}))


if __name__ == "__main__":
    main()
