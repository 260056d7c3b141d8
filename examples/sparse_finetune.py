"""Sparse-weight fine-tuning: magnitude-prune a trained layer, then train
only the SURVIVING weights through the SELL kernels.

The upstream-Sputnik story (Gale et al., "The State of Sparsity"):
magnitude-prune transformer weights, keep training. Here the pruned
pattern is FROZEN (indices fixed); gradients flow to the values only —
forward = SELL SpMM, dW = SELL SDDMM at the pattern, dx = transposed
SpMM — every pass sparse, nothing densified.

Run:  JAX_PLATFORMS=cpu python examples/sparse_finetune.py
      (or on TPU with the default backend)
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sputnik_tpu.formats import SellMatrix, csr_from_dense
from sputnik_tpu.ops import csr as csr_ops
from sputnik_tpu.utils.dlmc_gen import magnitude_prune


def main():
    rng = np.random.default_rng(0)
    # The trained weights artifact when present; a random stand-in otherwise.
    path = os.path.join(os.path.dirname(__file__), "..", "data", "dlmc_weights.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            w_dense = z["ffn_w1"][:256, :512]  # trim for a quick demo
        print("using trained ffn_w1 slice (DLMC protocol weights)")
    else:
        w_dense = rng.standard_normal((256, 512)).astype(np.float32) * 0.05

    sparsity = 0.9
    w_pruned = magnitude_prune(w_dense, sparsity)
    w = SellMatrix.from_csr(csr_from_dense(w_pruned), chunk="auto", sort_rows=True)
    print(f"pruned to {sparsity:.0%}: {int((w_pruned != 0).sum())} survivors, "
          f"SELL chunk={w.chunk}, width={w.width}")

    # Teacher-student regression: recover the DENSE layer's behavior with
    # the 10% surviving weights (the standard pruning fine-tune objective).
    # Layer convention: W is (out, in); activations are (in, batch).
    x = jnp.asarray(rng.standard_normal((512, 64)).astype(np.float32))
    teacher = jnp.asarray(w_dense) @ x

    def loss_fn(w_sell, x_):
        y = csr_ops.spmm(w_sell, x_)  # (out, batch), all-sparse backward
        return jnp.mean((y - teacher) ** 2)

    lr = 0.5
    val_grad = jax.jit(jax.value_and_grad(
        lambda vals, x_: loss_fn(w.with_values(vals), x_)
    ))
    vals = w.values
    for step in range(60):
        loss, g = val_grad(vals, x)
        vals = vals - lr * g  # pattern frozen: only values move
        if step % 20 == 0 or step == 59:
            print(f"step {step}: distill loss {float(loss):.5f}")
    final = w.with_values(vals)
    dense_now = np.asarray(final.to_dense())
    assert ((dense_now != 0) == (w_pruned != 0)).all(), "pattern drifted!"
    print("pattern preserved; sparse fine-tune complete")


if __name__ == "__main__":
    main()
