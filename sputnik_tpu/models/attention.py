"""Block-sparse attention: SDD (scores) -> BSR softmax -> DSD (output).

The attention stack upstream Sputnik's CSR kernels were built for (SpMM +
SDDMM + sparse softmax), at MXU-native 128-block granularity — the
structure of BigBird / Longformer / block-local attention. The score
topology is an explicit BSR mask, so all three ops skip absent blocks
entirely; compute scales with the number of stored blocks, not T^2.

Differentiable end to end (SDD/DSD custom VJPs + jnp softmax).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sputnik_tpu import ops
from sputnik_tpu.formats import BlockSparseMatrix
from sputnik_tpu.kernels.flash_attention import flash_block_attention
from sputnik_tpu.ops.softmax import bsr_softmax

__all__ = [
    "flash_block_attention",
    "band_topology",
    "causal_block_topology",
    "block_sparse_attention",
    "multihead_block_sparse_attention",
]


def _topology_from_mask(mask: np.ndarray, t: int, bs: int, dtype) -> BlockSparseMatrix:
    rows, cols = np.nonzero(mask)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    offsets = np.zeros(t // bs + 1, np.int32)
    np.add.at(offsets[1:], rows, 1)
    offsets = np.cumsum(offsets).astype(np.int32)
    data = jnp.zeros((len(rows), bs, bs), dtype)
    return BlockSparseMatrix.create(
        data, jnp.asarray(offsets), jnp.asarray(cols.astype(np.int32)), (t, t)
    )


def band_topology(
    seq_len: int, window_blocks: int, block_size: int = 128, *, dtype=jnp.bfloat16,
    global_blocks: int = 0,
) -> BlockSparseMatrix:
    """Banded (local-window) score topology, optionally with leading global
    blocks attending everywhere / attended by everyone (BigBird-style)."""
    nb = seq_len // block_size
    r = np.arange(nb)[:, None]
    c = np.arange(nb)[None, :]
    mask = np.abs(r - c) < window_blocks
    if global_blocks:
        mask[:global_blocks, :] = True
        mask[:, :global_blocks] = True
    return _topology_from_mask(mask, seq_len, block_size, dtype)


def causal_block_topology(
    seq_len: int, block_size: int = 128, *, window_blocks: Optional[int] = None,
    dtype=jnp.bfloat16,
) -> BlockSparseMatrix:
    """Block-lower-triangular topology (optionally banded): use together
    with ``bsr_softmax(..., causal=True)`` for exact causal attention."""
    nb = seq_len // block_size
    r = np.arange(nb)[:, None]
    c = np.arange(nb)[None, :]
    mask = c <= r
    if window_blocks is not None:
        mask &= (r - c) < window_blocks
    return _topology_from_mask(mask, seq_len, block_size, dtype)


def block_sparse_attention(
    q: jax.Array,  # (T, dh)
    k: jax.Array,  # (T, dh)
    v: jax.Array,  # (T, dh)
    topology: BlockSparseMatrix,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
    fused: bool = False,
) -> jax.Array:
    """Single-head block-sparse attention. compute ~ O(nnz_blocks * 128^2 * dh).

    ``fused=True`` runs the flash-style single-pass kernel
    (``kernels/flash_attention.py``): scores never materialize, O(T*dh)
    memory, ~2.4x faster forward on v5e; its backward recomputes through
    the unfused chain (more backward FLOPs — leave off for training loops
    dominated by backward, on for inference and long contexts).
    """
    if scale is None:
        scale = 1.0 / float(np.sqrt(q.shape[-1]))
    if fused:
        return flash_block_attention(q, k, v, topology, causal=causal, scale=scale)
    scores = ops.sdd(q, k, topology, transpose_b=True)  # (T, T) sparse
    probs = bsr_softmax(scores, scale=scale, causal=causal)
    return ops.dsd(probs, v)


def multihead_block_sparse_attention(
    q: jax.Array,  # (H, T, dh)
    k: jax.Array,
    v: jax.Array,
    topology: BlockSparseMatrix,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
    fused: bool = False,
) -> jax.Array:
    """(H, T, dh) multi-head attention.

    ``fused=True`` dispatches to the round-3 multi-head kernel
    (``kernels/flash_mha.py``): head axis in the grid and TWO query
    row-blocks per step sharing the union of their topology columns —
    K/V bytes per score nearly halve on banded/causal patterns. Falls
    back to the vmapped single-head kernel when the pair plan doesn't
    apply (odd block-row count or traced metadata)."""
    if fused:
        from sputnik_tpu.kernels.flash_mha import flash_mha

        concrete = not (
            isinstance(topology.row_indices, jax.core.Tracer)
            or isinstance(topology.indices, jax.core.Tracer)
        )
        if concrete and (topology.rows // topology.block_size) % 2 == 0:
            return flash_mha(q, k, v, topology, causal=causal, scale=scale)
    fn = functools.partial(
        block_sparse_attention, topology=topology, causal=causal, scale=scale,
        fused=fused,
    )
    return jax.vmap(fn)(q, k, v)
