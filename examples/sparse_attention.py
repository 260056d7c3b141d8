"""Block-sparse attention end-to-end: topology -> SDD -> softmax -> DSD.

Also shows the SELL path for *unstructured* score sparsity and the
sequence-parallel version over a device mesh.

Run: python examples/sparse_attention.py
(CPU works — Pallas kernels auto-switch to interpret mode off-TPU.)
"""

import numpy as np
import _common  # noqa: F401  (repo path + JAX_PLATFORMS bootstrap)
import jax
import jax.numpy as jnp

from sputnik_tpu.models import attention as attn
from sputnik_tpu.formats import SellMatrix
from sputnik_tpu.ops import csr as csr_ops
from sputnik_tpu.utils import testing


def main():
    rng = np.random.default_rng(0)
    seq, heads, dh = 1024, 4, 128

    # --- structured (block-sparse) attention: banded causal topology -----
    topo = attn.causal_block_topology(seq, block_size=128, window_blocks=3)
    q, k, v = (
        jnp.asarray(rng.standard_normal((heads, seq, dh)).astype(np.float32))
        for _ in range(3)
    )
    out = jax.jit(
        lambda q, k, v: attn.multihead_block_sparse_attention(
            q, k, v, topo, causal=True
        )
    )(q, k, v)
    print(f"block-sparse causal attention: {out.shape}, "
          f"{topo.nnz_blocks}/{topo.block_rows * topo.block_cols} blocks")

    # --- unstructured score sparsity via the SELL CSR engine -------------
    mask = testing.random_csr(rng, seq, seq, int(seq * seq * 0.05))
    sell_topo = SellMatrix.from_csr(mask, sort_rows=True)

    @jax.jit
    def sell_attention(q1, k1, v1):
        scores = csr_ops.sddmm(q1, k1, sell_topo)
        probs = csr_ops.sparse_softmax(scores, scale=1.0 / np.sqrt(dh))
        return csr_ops.spmm(probs, v1)

    out2 = sell_attention(q[0], k[0], v[0])
    print(f"SELL unstructured attention:   {out2.shape}, nnz={mask.nnz}")

    # --- gradients flow through both -------------------------------------
    g = jax.grad(lambda q1: jnp.sum(sell_attention(q1, k[0], v[0]) ** 2))(q[0])
    print(f"dL/dq max |g| = {float(jnp.abs(g).max()):.4f}")

    # --- content-based top-k selection (routing/NSA-style) ----------------
    # The topology is recomputed from the data INSIDE jit: the block budget
    # is static, so the step never recompiles across batches.
    kb = 3

    @jax.jit
    def topk_attention(q1, k1, v1):
        topo_t = attn.topk_block_topology(q1, k1, kb, causal=True,
                                          dtype=jnp.float32)
        return attn.block_sparse_attention(q1, k1, v1, topo_t, causal=True)

    out3 = topk_attention(q[0], k[0], v[0])
    dense_blocks = (seq // 128) ** 2
    print(f"top-k content-based attention: {out3.shape}, "
          f"{(seq // 128) * kb}/{dense_blocks} blocks selected per batch")

    # --- decode step over a paged KV cache (serving) ----------------------
    # One compiled step serves the growing cache: the page budget is
    # static; valid_len masks the unfilled tail exactly.
    decode = jax.jit(lambda q1, k1, v1, vl: attn.decode_topk_attention(
        q1, k1, v1, kb, valid_len=vl))
    q_tok = q[:, -1]  # (H, dh) current token's query
    for filled in (300, 700, seq):
        tok = decode(q_tok, k, v, filled)
    print(f"paged-KV decode: {tok.shape} per step, {kb} of {seq // 128} "
          f"pages read (same compiled step for every fill level)")


if __name__ == "__main__":
    main()
