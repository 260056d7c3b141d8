"""Sparse-weight fine-tuning, both granularities the kernels serve.

Part 1 — element granularity, FROZEN pattern (the upstream-Sputnik story,
Gale et al. "The State of Sparsity"): magnitude-prune a trained layer,
train only the surviving values through the SELL kernels — forward = SELL
SpMM, dW = SELL SDDMM at the pattern, dx = transposed SpMM, every pass
sparse, nothing densified.

Part 2 — BLOCK granularity, DYNAMIC topology (RigL, Evci et al. 2020, at
the MegaBlocks block size): one-shot block-magnitude prune via
``sputnik_tpu.prune``, fine-tune values through the BSR DSD op, and every
N steps drop the weakest blocks / regrow the highest-gradient ones with
``prune.rigl_block_update``. The nonzero-block budget is static, so every
refresh reuses the same compiled train step (budget-stable static hints;
see prune.rigl_block_update).

Run:  JAX_PLATFORMS=cpu python examples/sparse_finetune.py
      (or on TPU with the default backend)
"""

import os
import sys

import numpy as np
import _common  # noqa: F401  (repo path + JAX_PLATFORMS bootstrap)
import jax
import jax.numpy as jnp

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


def block_rigl_demo():
    """Block-granular sparse training with RigL topology refreshes."""
    from sputnik_tpu import ops, prune

    rng = np.random.default_rng(1)
    rows, cols, bs, batch = 256, 512, 32, 64
    w_dense = rng.standard_normal((rows, cols)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.standard_normal((cols, batch)).astype(np.float32))
    teacher = jnp.asarray(w_dense) @ x

    # One-shot block prune to 25% block density.
    m = prune.block_magnitude_prune(jnp.asarray(w_dense), bs, sparsity=0.75)
    print(f"\nblock prune: bs={bs}, {m.nnz_blocks}/{m.block_rows * m.block_cols} "
          f"blocks kept ({m.density:.0%} block density)")

    def loss_from_data(data, topo):
        y = ops.dsd(topo.with_data(data), x)  # sparse fwd + sparse bwd
        return jnp.mean((y - teacher) ** 2)

    # One compiled step serves every topology: the budget is static, the
    # topology rides in as (traced) metadata arrays of fixed shape.
    @jax.jit
    def train_step(data, topo):
        loss, g = jax.value_and_grad(loss_from_data)(data, topo)
        return loss, data - 0.5 * g

    @jax.jit
    def dense_grad(topo):
        # RigL refresh signal: the loss gradient w.r.t. the DENSE weight
        # (scores for inactive blocks too). Only run on refresh steps.
        return jax.grad(lambda wd: jnp.mean((wd @ x - teacher) ** 2))(topo.to_dense())

    data = m.data
    for step in range(61):
        loss, data = train_step(data, m)
        if step in (20, 40):
            before = {(int(r), int(c)) for r, c in
                      zip(np.asarray(m.row_indices), np.asarray(m.indices))}
            m = prune.rigl_block_update(m.with_data(data), dense_grad(m.with_data(data)),
                                        drop_fraction=0.2)
            data = m.data
            after = {(int(r), int(c)) for r, c in
                     zip(np.asarray(m.row_indices), np.asarray(m.indices))}
            print(f"step {step}: loss {float(loss):.5f}, RigL refresh swapped "
                  f"{len(after - before)} blocks (budget {m.nnz_blocks})")
        elif step % 20 == 0 or step == 60:  # 0 and the final step
            print(f"step {step}: loss {float(loss):.5f}")
    print("block-RigL sparse fine-tune complete")


if __name__ == "__main__":
    main()
    block_rigl_demo()
