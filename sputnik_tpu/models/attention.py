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
    "topk_block_topology",
    "decode_topk_attention",
    "decode_band_attention",
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


def topk_block_topology(
    q: jax.Array,  # (T, dh)
    k: jax.Array,  # (Tk, dh)
    k_blocks: int,
    *,
    block_size: int = 128,
    causal: bool = True,
    include_local: bool = True,
    dtype=None,
) -> BlockSparseMatrix:
    """Content-based topology: per query block, the top-``k_blocks`` key
    blocks ranked by mean-pooled q·kᵀ block scores (the native-sparse- /
    routing-attention selection rule), built ON DEVICE and jittable —
    ``k_blocks`` is a static budget, so every block-row holds exactly
    ``k_blocks`` entries: perfectly load-balanced for the output-stationary
    kernels, and the topology can be recomputed per batch inside jit
    without recompiles.

    ``include_local`` forces each query block's diagonal key block into
    the selection (guaranteeing at least one causally-valid block per
    row). Under ``causal=True`` future blocks rank below every valid one;
    rows too early to have ``k_blocks`` valid choices select some future
    blocks, which ``bsr_softmax(..., causal=True)`` masks to exactly zero
    probability — run the attention chain with ``causal=True``.

    Beyond the reference (its topologies are caller-provided); the SDD
    one-program-per-nonzero-block structure this feeds is
    ``kernel.h:86-90``.
    """
    bs = block_size
    t, tk = q.shape[0], k.shape[0]
    if t % bs or tk % bs:
        raise ValueError(f"seq lens ({t}, {tk}) not divisible by block {bs}")
    s_q, s_k = t // bs, tk // bs
    if not 1 <= k_blocks <= s_k:
        raise ValueError(f"k_blocks {k_blocks} out of range [1, {s_k}]")
    qp = q.reshape(s_q, bs, -1).mean(axis=1).astype(jnp.float32)
    kp = k.reshape(s_k, bs, -1).mean(axis=1).astype(jnp.float32)
    scores = qp @ kp.T  # (s_q, s_k) pooled block scores
    r = jax.lax.broadcasted_iota(jnp.int32, (s_q, s_k), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (s_q, s_k), 1)
    if causal:
        # Rank every future block below every valid one. top_k indices are
        # distinct by construction; the column term only makes WHICH
        # fallback columns win deterministic (its 1024 step exceeds the
        # f32 ulp at 1e9, which a plain -c offset would not).
        scores = jnp.where(
            c <= r, scores, -1e9 - c.astype(jnp.float32) * 1024.0
        )
    if include_local:
        scores = jnp.where(c == jnp.minimum(r, s_k - 1), jnp.inf, scores)
    _, idx = jax.lax.top_k(scores, k_blocks)  # (s_q, k_blocks) distinct cols
    idx = jnp.sort(idx, axis=1)
    offsets = jnp.arange(s_q + 1, dtype=jnp.int32) * k_blocks
    indices = idx.reshape(-1).astype(jnp.int32)
    row_indices = jnp.repeat(jnp.arange(s_q, dtype=jnp.int32), k_blocks)
    data = jnp.zeros((s_q * k_blocks, bs, bs), dtype or q.dtype)
    return BlockSparseMatrix.create(
        data,
        offsets,
        indices,
        (t, tk),
        row_indices=row_indices,
        max_row_nnz=k_blocks,
        max_col_nnz=s_q,
    )


def decode_topk_attention(
    q: jax.Array,  # (dh,) or (H, dh) — one decode step
    k_cache: jax.Array,  # (T, dh) or (H, T, dh)
    v_cache: jax.Array,  # same shape as k_cache
    k_blocks: int,
    *,
    block_size: int = 128,
    valid_len: Optional[jax.Array | int] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Single-token decode attention over a block-paged KV cache with
    content-based page selection (the serving-side counterpart of
    :func:`topk_block_topology`, Quest-style): rank the cache's
    ``block_size``-sized pages by pooled ``q·k`` score, then run exact
    softmax attention over ONLY the top ``k_blocks`` pages — KV bytes per
    step drop from ``T·dh`` to ``k_blocks·block_size·dh``. The budget is
    static, so the step jits once and serves any cache content.

    ``valid_len`` masks cache positions ``>= valid_len`` (a partially
    filled cache): masked positions get zero probability, and fully
    invalid pages rank below every valid one so they are only selected
    when fewer than ``k_blocks`` valid pages exist.
    """
    if q.ndim == 2:  # (H, dh): vmap heads over shared-per-head caches
        return jax.vmap(
            lambda q1, k1, v1: decode_topk_attention(
                q1, k1, v1, k_blocks, block_size=block_size,
                valid_len=valid_len, scale=scale,
            )
        )(q, k_cache, v_cache)
    t, dh = k_cache.shape
    bs = block_size
    if t % bs:
        raise ValueError(f"cache len {t} not divisible by block {bs}")
    s_k = t // bs
    if not 1 <= k_blocks <= s_k:
        raise ValueError(f"k_blocks {k_blocks} out of range [1, {s_k}]")
    if scale is None:
        scale = 1.0 / float(np.sqrt(dh))

    kb3 = k_cache.reshape(s_k, bs, dh)
    pos = jax.lax.broadcasted_iota(jnp.int32, (s_k, bs), 0) * bs + \
        jax.lax.broadcasted_iota(jnp.int32, (s_k, bs), 1)
    if valid_len is not None:
        vl = jnp.asarray(valid_len, jnp.int32)
        valid = pos < vl  # (s_k, bs)
        kpool = jnp.sum(
            jnp.where(valid[:, :, None], kb3.astype(jnp.float32), 0.0), axis=1
        ) / jnp.maximum(jnp.sum(valid, axis=1), 1)[:, None]
    else:
        valid = jnp.ones((s_k, bs), bool)
        kpool = kb3.astype(jnp.float32).mean(axis=1)
    page_scores = kpool @ q.astype(jnp.float32)  # (s_k,)
    if valid_len is not None:
        # Fully-invalid pages rank below every valid page, distinct order.
        any_valid = jnp.any(valid, axis=1)
        page_scores = jnp.where(
            any_valid, page_scores,
            -1e9 - jnp.arange(s_k, dtype=jnp.float32) * 1024.0,
        )
    _, idx = jax.lax.top_k(page_scores, k_blocks)  # (k_blocks,) distinct

    vb3 = v_cache.reshape(s_k, bs, dh)
    return _attend_pages(
        q,
        jnp.take(kb3, idx, axis=0),
        jnp.take(vb3, idx, axis=0),
        jnp.take(valid, idx, axis=0),
        scale,
    )


def _attend_pages(q, k_sel, v_sel, sel_valid, scale):
    """Exact softmax attention of one query over gathered KV pages:
    q (dh,), k_sel/v_sel (n, bs, dh), sel_valid (n, bs) position mask."""
    scores = jnp.einsum(
        "kbd,d->kb", k_sel.astype(jnp.float32), q.astype(jnp.float32)
    ) * scale
    scores = jnp.where(sel_valid, scores, -jnp.inf)
    m = jnp.maximum(jnp.max(scores), -3e38)  # all-masked guard
    e = jnp.where(sel_valid, jnp.exp(scores - m), 0.0)
    denom = jnp.maximum(jnp.sum(e), 1e-30)
    out = jnp.einsum("kb,kbd->d", e, v_sel.astype(jnp.float32)) / denom
    return out.astype(q.dtype)


def decode_band_attention(
    q: jax.Array,  # (dh,) or (H, dh)
    k_cache: jax.Array,  # (T, dh) or (H, T, dh)
    v_cache: jax.Array,
    window_blocks: int,
    pos: jax.Array | int,
    *,
    block_size: int = 128,
    scale: Optional[float] = None,
) -> jax.Array:
    """Decode-step attention matching the TRAINING band topology: the token
    at ``pos`` attends to cache pages ``(pos//bs - window_blocks, pos//bs]``
    with the causal position mask ``<= pos`` — exactly the mask
    :func:`causal_block_topology`/:func:`band_topology` + causal softmax
    apply during training, so incremental decoding reproduces the full
    forward pass logits (see ``models/transformer.py::lm_generate``).
    Reads ``window_blocks`` pages per step regardless of cache length."""
    if q.ndim == 2:
        return jax.vmap(
            lambda q1, k1, v1: decode_band_attention(
                q1, k1, v1, window_blocks, pos, block_size=block_size,
                scale=scale,
            )
        )(q, k_cache, v_cache)
    t, dh = k_cache.shape
    bs = block_size
    if t % bs:
        raise ValueError(f"cache len {t} not divisible by block {bs}")
    s_k = t // bs
    if not 1 <= window_blocks <= s_k:
        raise ValueError(f"window_blocks {window_blocks} out of range [1, {s_k}]")
    if scale is None:
        scale = 1.0 / float(np.sqrt(dh))
    pos = jnp.asarray(pos, jnp.int32)
    r = pos // bs
    pages = r - window_blocks + 1 + jnp.arange(window_blocks, dtype=jnp.int32)
    page_ok = pages >= 0  # early positions: window clipped at the start
    idx = jnp.maximum(pages, 0)
    kb3 = k_cache.reshape(s_k, bs, dh)
    vb3 = v_cache.reshape(s_k, bs, dh)
    # O(window*bs) validity: causal position mask on the SELECTED pages
    # only (never materialize a cache-length grid on the decode hot path),
    # with clipped (negative) pages masked out entirely.
    sel_pos = idx[:, None] * bs + jnp.arange(bs, dtype=jnp.int32)[None, :]
    sel_valid = (sel_pos <= pos) & page_ok[:, None]
    return _attend_pages(
        q, jnp.take(kb3, idx, axis=0), jnp.take(vb3, idx, axis=0), sel_valid, scale
    )


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

    ``fused=True`` runs a flash-style single-pass kernel: scores never
    materialize, O(T*dh) memory. With concrete topology metadata the op
    routes through the STRIP kernel (``kernels/flash_mha.py`` with a
    singleton head axis) — its (rows_per_step*bs, dh, group*bs) score
    dot rides the MXU shape law and measured 17.5 vs 23.2 us for the
    per-row single-head kernel at the T=2048 audit config (round 5,
    outputs bf16-identical). Traced metadata falls back to
    ``flash_block_attention`` (the per-row plan works from traced
    arrays).
    """
    if scale is None:
        scale = 1.0 / float(np.sqrt(q.shape[-1]))
    if fused:
        concrete = not (
            isinstance(topology.row_indices, jax.core.Tracer)
            or isinstance(topology.indices, jax.core.Tracer)
        )
        if concrete:
            from sputnik_tpu.kernels.flash_mha import flash_mha

            return flash_mha(
                q[None], k[None], v[None], topology,
                causal=causal, scale=scale,
            )[0]
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
    (``kernels/flash_mha.py``): head axis in the grid and a strip of
    query row-blocks per step sharing the union of their topology
    columns — K/V bytes per score shrink on banded/causal patterns, and
    the strip dot shape rides the MXU shape law (rows_per_step auto-picks
    4/2/1 by divisibility; (4, 8) won the round-5 sweep). Falls back to
    the vmapped single-head kernel when the pair plan doesn't apply
    (traced metadata)."""
    if fused:
        from sputnik_tpu.kernels.flash_mha import flash_mha

        concrete = not (
            isinstance(topology.row_indices, jax.core.Tracer)
            or isinstance(topology.indices, jax.core.Tracer)
        )
        if concrete:
            return flash_mha(q, k, v, topology, causal=causal, scale=scale)
    fn = functools.partial(
        block_sparse_attention, topology=topology, causal=causal, scale=scale,
        fused=fused,
    )
    return jax.vmap(fn)(q, k, v)
