"""Block-sparsity pruning and sparse-training utilities (jit-friendly).

The reference library is the kernel engine behind two sparse-training
workflows — DLMC-style magnitude-pruned transformers (upstream Sputnik's
SC'20 evaluation) and MegaBlocks MoE — but ships no pruning tools itself:
users hand-roll topology construction on the host. This module makes the
workflow first-class and TPU-native. The organizing contract is XLA's
static-shape discipline turned into an API rule: **the nonzero-block
budget is static** (fixed by the target sparsity), so topology refreshes
during training swap WHICH blocks are active without changing any array
shape — the same compiled kernels serve every refresh, no recompiles.
(The reference keeps ``nonzeros`` in its descriptor for the same reason:
grids must be static — ``block/arguments.h:49``.)

Provided:

- :func:`block_magnitude_prune` — dense → BSR keeping the top-k blocks by
  norm (one-shot pruning; jittable, static ``k``).
- :func:`gradual_sparsity` — the Zhu & Gupta (2017) cubic sparsity
  schedule for gradual magnitude pruning (host-side: sparsity targets are
  static shape parameters by the contract above).
- :func:`rigl_block_update` — RigL (Evci et al., 2020) topology refresh
  at block granularity: drop the lowest-|W| fraction of active blocks,
  regrow the same number of inactive blocks with the largest gradient
  norm, preserving surviving values and zero-initializing regrown blocks.
  Fully jittable; the nnz budget is invariant.

Element-granularity (CSR) magnitude pruning for trained weights lives in
``utils/dlmc_gen.py`` (``magnitude_prune`` / ``pruned_csr``), which
reproduces the DLMC dataset protocol; this module covers the block
granularity the BSR engine consumes.

See ``examples/sparse_finetune.py`` for the end-to-end loop: dense
warmup → one-shot block prune → sparse fine-tune with periodic RigL
refreshes, forward/backward through ``ops.dsd``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .formats import BlockSparseMatrix

__all__ = [
    "block_scores",
    "block_magnitude_prune",
    "gradual_sparsity",
    "rigl_block_update",
]


def block_scores(w: jax.Array, block_size: int, *, score: str = "l2") -> jax.Array:
    """Per-block saliency of a dense (rows, cols) matrix.

    Returns a (rows/bs, cols/bs) float32 array: the squared Frobenius norm
    (``score="l2"``) or the absolute-value sum (``score="l1"``) of each
    block. Both are monotone rankings, so pruning decisions agree with the
    element-magnitude protocol aggregated to blocks.
    """
    rows, cols = w.shape
    bs = block_size
    if rows % bs or cols % bs:
        raise ValueError(f"shape {w.shape} not divisible by block_size {bs}")
    blocks = w.reshape(rows // bs, bs, cols // bs, bs)
    b32 = blocks.astype(jnp.float32)
    if score == "l2":
        return jnp.sum(b32 * b32, axis=(1, 3))
    if score == "l1":
        return jnp.sum(jnp.abs(b32), axis=(1, 3))
    raise ValueError(f"score must be 'l1' or 'l2', got {score!r}")


def _topology_arrays(flat_sorted: jax.Array, n_block_rows: int, n_block_cols: int):
    """CSR-order (offsets, col indices, row indices) from sorted flat block
    ids (row-major flattening, so ascending flat order IS block-CSR order)."""
    rows_b = (flat_sorted // n_block_cols).astype(jnp.int32)
    cols_b = (flat_sorted % n_block_cols).astype(jnp.int32)
    counts = jnp.bincount(rows_b, length=n_block_rows)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )
    return offsets, cols_b, rows_b


def block_magnitude_prune(
    w: jax.Array,
    block_size: int,
    *,
    sparsity: Optional[float] = None,
    nnz_blocks: Optional[int] = None,
    score: str = "l2",
) -> BlockSparseMatrix:
    """One-shot block-magnitude pruning: dense → BSR, top-k blocks by norm.

    Exactly one of ``sparsity`` (fraction of BLOCKS removed, a static
    Python float) or ``nnz_blocks`` (blocks kept) must be given; the kept
    count is a static shape, so the function is jittable and successive
    calls at the same budget reuse compiled kernels.

    The block-granular analogue of the DLMC magnitude protocol
    (``utils/dlmc_gen.py``); descriptor layout per reference
    ``block/arguments.h:48-153``.
    """
    rows, cols = w.shape
    bs = block_size
    n_br, n_bc = rows // bs, cols // bs
    total = n_br * n_bc
    if (sparsity is None) == (nnz_blocks is None):
        raise ValueError("pass exactly one of sparsity= or nnz_blocks=")
    if nnz_blocks is None:
        if not 0.0 <= sparsity < 1.0:
            raise ValueError(f"sparsity must be in [0, 1), got {sparsity}")
        nnz_blocks = max(1, int(round((1.0 - sparsity) * total)))
    k = int(nnz_blocks)
    if not 1 <= k <= total:
        raise ValueError(f"nnz_blocks {k} out of range [1, {total}]")

    scores = block_scores(w, bs, score=score).reshape(total)
    _, flat = jax.lax.top_k(scores, k)
    flat = jnp.sort(flat)
    offsets, cols_b, rows_b = _topology_arrays(flat, n_br, n_bc)
    blocks = w.reshape(n_br, bs, n_bc, bs).transpose(0, 2, 1, 3).reshape(total, bs, bs)
    data = jnp.take(blocks, flat, axis=0)
    return BlockSparseMatrix.create(
        data, offsets, cols_b, (rows, cols), row_indices=rows_b
    )


def gradual_sparsity(
    step: int,
    *,
    final_sparsity: float,
    initial_sparsity: float = 0.0,
    begin_step: int = 0,
    end_step: int,
) -> float:
    """Zhu & Gupta (2017) cubic gradual-pruning schedule (host-side).

    ``s(t) = s_f + (s_i - s_f) * (1 - (t - t0)/(t1 - t0))^3`` clamped to
    [begin_step, end_step]. Returns a Python float: the sparsity target is
    a STATIC shape parameter (it sets the nnz-block budget), so schedules
    are evaluated on the host between jitted train steps, and each
    distinct budget compiles once.
    """
    if end_step <= begin_step:
        raise ValueError("end_step must be > begin_step")
    t = min(max(int(step), begin_step), end_step)
    frac = (t - begin_step) / (end_step - begin_step)
    return final_sparsity + (initial_sparsity - final_sparsity) * (1.0 - frac) ** 3


def rigl_block_update(
    m: BlockSparseMatrix,
    dense_grad: jax.Array,
    *,
    drop_fraction: float = 0.3,
    score: str = "l2",
) -> BlockSparseMatrix:
    """One RigL topology refresh at block granularity (jittable).

    Drops the ``drop_fraction`` of active blocks with the smallest value
    norm and regrows the same number of currently-INACTIVE blocks with the
    largest gradient norm (computed from ``dense_grad``, the loss gradient
    w.r.t. the DENSE weight — obtain it by differentiating through
    ``to_dense()`` / a densified forward on refresh steps, the standard
    RigL recipe). Surviving blocks keep their values; regrown blocks start
    at zero. The nonzero-block count is invariant, so the result is
    shape-identical to the input and reuses every compiled kernel; the
    static row/col-nnz hints are set to budget-stable bounds
    (``min(budget, block_cols)``) so successive refreshes produce
    metadata-identical pytrees — a jitted train step taking the matrix as
    an argument compiles once per budget, not once per topology. (A
    tight-hinted matrix from :func:`block_magnitude_prune` recompiles one
    time at the first refresh.)

    A dropped block cannot be regrown in the same update (RigL's sets are
    disjoint: regrowth ranks only blocks inactive BEFORE the update).
    """
    bs = m.block_size
    n_br, n_bc = m.block_rows, m.block_cols
    total = n_br * n_bc
    k = m.nnz_blocks
    if dense_grad.shape != m.shape:
        raise ValueError(f"dense_grad shape {dense_grad.shape} != {m.shape}")
    if not 0.0 <= drop_fraction <= 1.0:
        raise ValueError(f"drop_fraction must be in [0, 1], got {drop_fraction}")
    # Static budget: cannot regrow more blocks than are inactive.
    n_drop = min(int(round(drop_fraction * k)), total - k)
    if n_drop <= 0:
        return m

    flat = (m.row_indices * n_bc + m.indices).astype(jnp.int32)

    # Drop: keep the top (k - n_drop) active blocks by value norm.
    d32 = m.data.astype(jnp.float32)
    if score == "l2":
        wnorm = jnp.sum(d32 * d32, axis=(1, 2))
    elif score == "l1":
        wnorm = jnp.sum(jnp.abs(d32), axis=(1, 2))
    else:
        raise ValueError(f"score must be 'l1' or 'l2', got {score!r}")
    _, keep_pos = jax.lax.top_k(wnorm, k - n_drop)
    keep_pos = keep_pos.astype(jnp.int32)
    kept_flat = jnp.take(flat, keep_pos)

    # Regrow: top gradient-norm blocks among blocks inactive pre-update.
    gscore = block_scores(dense_grad, bs, score=score).reshape(total)
    active = jnp.zeros((total,), jnp.bool_).at[flat].set(True)
    gscore = jnp.where(active, -jnp.inf, gscore)
    _, grown_flat = jax.lax.top_k(gscore, n_drop)
    grown_flat = grown_flat.astype(jnp.int32)

    new_flat = jnp.sort(jnp.concatenate([kept_flat, grown_flat]))
    offsets, cols_b, rows_b = _topology_arrays(new_flat, n_br, n_bc)

    # Value remap: surviving blocks carry their data, regrown start at 0.
    posmap = jnp.full((total,), -1, jnp.int32).at[kept_flat].set(keep_pos)
    src = jnp.take(posmap, new_flat)
    gathered = jnp.take(m.data, jnp.maximum(src, 0), axis=0)
    data = jnp.where((src >= 0)[:, None, None], gathered, jnp.zeros((), m.dtype))
    # Budget-stable static hints: any tight (data-dependent) bound could
    # change across refreshes and recompile jitted consumers. A block-row
    # can hold at most min(budget, block_cols) blocks — static in the
    # budget alone, so every refresh produces metadata-identical pytrees.
    return BlockSparseMatrix.create(
        data,
        offsets,
        cols_b,
        m.shape,
        row_indices=rows_b,
        max_row_nnz=min(k, n_bc),
        max_col_nnz=min(k, n_br),
    )
