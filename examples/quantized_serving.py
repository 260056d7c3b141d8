"""int8 quantized sparse serving: a pruned FFN layer with int8 weights.

The serving recipe the reference cannot express (its kernels are
half-precision only): prune a dense FFN to block sparsity, quantize the
surviving blocks to int8 offline, and run the forward pass through the
quantized BSR SpMM — exact int32 MXU accumulation, dequantization folded
into the kernel flush. Prints the output error of (a) block pruning and
(b) int8 on top of pruning, against the dense fp32 layer.

Run: python examples/quantized_serving.py
"""

import numpy as np

import _common  # noqa: F401  (repo path + JAX_PLATFORMS bootstrap)
import jax
import jax.numpy as jnp

from sputnik_tpu.formats import bsr_from_dense
from sputnik_tpu.ops.quant import matmul_dds_q8, quantize, quantize_bsr


def main():
    rng = np.random.default_rng(0)
    d_model, d_ff, tokens = 512, 2048, 256
    w1 = rng.standard_normal((d_model, d_ff)).astype(np.float32) / np.sqrt(d_model)
    x = rng.standard_normal((tokens, d_model)).astype(np.float32)

    # Magnitude-prune whole 128x128 blocks to 25% density (the MegaBlocks
    # block granularity; see examples/sparse_finetune.py for recovering
    # accuracy by training through the sparse kernels).
    bs = 128
    norms = w1.reshape(d_model // bs, bs, d_ff // bs, bs)
    norms = np.sqrt((norms ** 2).sum((1, 3)))
    keep = norms >= np.quantile(norms, 0.75)
    w1_pruned = w1 * np.repeat(np.repeat(keep, bs, 0), bs, 1)
    w1_bsr = bsr_from_dense(w1_pruned, bs)

    dense_out = x @ w1
    pruned_out = x @ w1_pruned

    # Offline weight quantization + activation quantization at the door.
    w1_q, sw = quantize_bsr(w1_bsr)
    x_q, sx = quantize(jnp.asarray(x))
    q_out = matmul_dds_q8(x_q, w1_q, scale_a=sx, scale_b=sw,
                          out_dtype=jnp.float32)

    def rel(a, b):
        return float(np.linalg.norm(a - b) / np.linalg.norm(b))

    print(f"density kept: {keep.mean():.2%} of blocks")
    print(f"pruning error vs dense fp32:      {rel(pruned_out, dense_out):.4f}")
    print(f"int8 error vs pruned fp32:        "
          f"{rel(np.asarray(q_out, np.float32), pruned_out):.4f}")
    serve = jax.jit(lambda xq: matmul_dds_q8(
        xq, w1_q, scale_a=sx, scale_b=sw, out_dtype=jnp.bfloat16))
    y = serve(x_q)
    print(f"jitted int8 serving output: {y.shape} {y.dtype}")


if __name__ == "__main__":
    main()
