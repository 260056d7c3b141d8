"""BSR SpMM Pallas kernels: DSD (dense = sparse @ dense) and its mirror
DDS (dense = dense @ sparse).

TPU-native re-design of the reference's DSD/DDS paths
(``block/dsd/*``, ``block/dds/*``, iterators in
``block/cutlass/block_tile_access_iterator.h`` and
``block/cutlass/dependent_tile_access_iterator.h``):

  * The sparse operand's packed blocks are streamed in iteration order via a
    scalar-prefetched physical-position array — Pallas' analogue of the
    reference's predicate-free ``BlockTileAccessIterator`` (natural order:
    contiguous; transposed order: `block_offsets` gather,
    ``block_tile_access_iterator.h:217-234``).
  * The dense operand's tile index map reads the prefetched block-column ids
    — the analogue of ``DependentTileAccessIterator``'s data-dependent tile
    jumps (``dependent_tile_access_iterator.h:119-133``).
  * One kernel body covers all four transpose modes (the reference needs 8
    instantiation files per op): transposition never moves data — it only
    flips ``dot_general`` contraction dims and index-map orientation.

Grid: ``(panel_tiles, nnz_blocks)`` with the block dimension innermost
("arbitrary"); blocks arrive grouped by output tile, so the fp32 accumulator
scratch carries partial sums across a row's blocks and flushes exactly once
per output tile — the variable-trip-count ``StepsK()`` of the reference
(``block_gemm.h:129-192``) expressed as grid iteration + revisiting.

All four modes accept unordered column indices within a row (reference
tests shuffle them; our iteration order only sorts by output tile id).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sputnik_tpu.formats import BlockSparseMatrix
from sputnik_tpu.kernels.common import (
    cdiv,
    compiler_params,
    dot_dims,
    pick_tile,
    use_interpret,
)

__all__ = ["dsd", "dds"]


def _mask_empty_groups(out, offsets, bs: int, axis: int, min_hint=None):
    """Zero output tiles the kernel never visited.

    The stream kernel writes an output tile only when at least one sparse
    block maps to it; a block-row (DSD) / block-column (DDS) with no blocks
    leaves uninitialized HBM behind. (The reference's CUTLASS epilogue
    always writes every tile of the dense output grid; our grid is the nnz
    list.) When the descriptor's static min-nnz hint proves no empty groups
    — or the offsets are concrete and show none — this is a no-op with zero
    runtime cost.
    """
    if min_hint is not None and min_hint >= 1:
        return out
    if not isinstance(offsets, jax.core.Tracer):
        counts = np.asarray(offsets)
        if (counts[1:] - counts[:-1] > 0).all():
            return out
    mask = (offsets[1:] - offsets[:-1]) > 0
    mask = jnp.repeat(mask, bs)
    mask = mask[:, None] if axis == 0 else mask[None, :]
    return jnp.where(mask, out, jnp.zeros([], out.dtype))


def _stream_kernel(
    # scalar prefetch
    out_ids,  # (nnz,) output-tile id per block, non-decreasing
    dep_ids,  # (nnz,) contraction block id per block
    data_ids,  # (nnz,) physical block position (unused in body; index maps only)
    # tensors
    block_ref,  # (1, bs, bs) sparse operand block
    panel_ref,  # dense operand tile
    out_ref,  # output tile
    acc_ref,  # fp32 accumulator scratch
    *,
    nnz: int,
    dims,
    block_first: bool,
    out_scale: float | None = None,
):
    del data_ids
    j = pl.program_id(1)
    cur = out_ids[j]
    prev = out_ids[jnp.maximum(j - 1, 0)]
    nxt = out_ids[jnp.minimum(j + 1, nnz - 1)]
    is_first = jnp.logical_or(j == 0, prev != cur)
    is_last = jnp.logical_or(j == nnz - 1, nxt != cur)

    @pl.when(is_first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    block = block_ref[0]
    panel = panel_ref[:]
    lhs, rhs = (block, panel) if block_first else (panel, block)
    # Accumulator dtype follows the scratch: fp32 for float operands,
    # int32 for the quantized int8 path (exact integer accumulation on
    # the MXU; the dequantization scale folds into the flush).
    acc_ref[:] += jax.lax.dot_general(
        lhs, rhs, dims, preferred_element_type=acc_ref.dtype
    )

    @pl.when(is_last)
    def _():
        acc = acc_ref[:]
        if out_scale is not None:
            acc = acc.astype(jnp.float32) * out_scale
        out_ref[:] = acc.astype(out_ref.dtype)


def _stream_call(
    *,
    sparse_data,
    out_ids,
    dep_ids,
    data_ids,
    panel,
    panel_spec,
    out_rows: int,
    out_cols: int,
    out_block,  # (tile_rows, tile_cols) of the output tile
    out_index,  # (panel_idx, j, out_ids, ...) -> block index tuple
    panel_tiles: int,
    dims,
    block_first: bool,
    out_dtype,
    interpret: bool,
    out_scale: float | None = None,
):
    nnz = sparse_data.shape[0]
    bs = sparse_data.shape[-1]
    grid = (panel_tiles, nnz)
    kernel = functools.partial(
        _stream_kernel, nnz=nnz, dims=dims, block_first=block_first,
        out_scale=out_scale,
    )
    acc_dtype = (
        jnp.int32 if jnp.issubdtype(sparse_data.dtype, jnp.integer)
        else jnp.float32
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, bs, bs),
                lambda p, j, out_ids, dep_ids, data_ids: (data_ids[j], 0, 0),
            ),
            panel_spec,
        ],
        out_specs=pl.BlockSpec(out_block, out_index),
        scratch_shapes=[pltpu.VMEM(out_block, acc_dtype)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, out_cols), out_dtype),
        compiler_params=compiler_params(("parallel", "arbitrary")),
        interpret=interpret,
    )(out_ids, dep_ids, data_ids, sparse_data, panel)


def dsd(
    a: BlockSparseMatrix,
    b: jax.Array,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    n_tile: int = 4096,
    interpret: bool | None = None,
    out_scale: float | None = None,
) -> jax.Array:
    """C[M, N] = op(A_sparse) @ op(B_dense).

    ``out_scale`` multiplies the accumulator at flush — the dequantization
    hook for the int8 path (int8 operands accumulate exactly in int32).

    Reference: ``block/dsd/dsd.h:10-22`` (SpMM, the MegaBlocks forward
    workhorse). ``transpose_a`` consumes the transpose metadata exactly like
    the reference's TN/TT paths (``dsd_*_tn_align8.cu:73-83``), built on
    device if absent.
    """
    interpret = use_interpret() if interpret is None else interpret
    out_dtype = out_dtype or a.dtype
    bs = a.block_size
    m_dim = a.cols if transpose_a else a.rows
    k_dim = a.rows if transpose_a else a.cols
    n_dim = b.shape[0] if transpose_b else b.shape[1]
    bk = b.shape[1] if transpose_b else b.shape[0]
    if bk != k_dim:
        raise ValueError(f"contraction mismatch: A gives k={k_dim}, B gives {bk}")

    if a.nnz_blocks == 0:
        return jnp.zeros((m_dim, n_dim), out_dtype)

    out_ids, dep_ids, data_ids = a.iteration_arrays(transposed=transpose_a)
    group_offsets = (
        a.with_transpose_metadata().offsets_t if transpose_a else a.offsets
    )
    min_hint = a.min_col_nnz if transpose_a else a.min_row_nnz
    bn = pick_tile(n_dim, n_tile)
    if transpose_b:  # B stored (N, K)
        panel_spec = pl.BlockSpec(
            (bn, bs), lambda p, j, out_ids, dep_ids, data_ids: (p, dep_ids[j])
        )
    else:  # B stored (K, N)
        panel_spec = pl.BlockSpec(
            (bs, bn), lambda p, j, out_ids, dep_ids, data_ids: (dep_ids[j], p)
        )
    out = _stream_call(
        sparse_data=a.data,
        out_ids=out_ids,
        dep_ids=dep_ids,
        data_ids=data_ids,
        panel=b,
        panel_spec=panel_spec,
        out_rows=m_dim,
        out_cols=n_dim,
        out_block=(bs, bn),
        out_index=lambda p, j, out_ids, dep_ids, data_ids: (out_ids[j], p),
        panel_tiles=cdiv(n_dim, bn),
        dims=dot_dims(transpose_a, transpose_b),
        block_first=True,
        out_dtype=out_dtype,
        interpret=interpret,
        out_scale=out_scale,
    )
    return _mask_empty_groups(out, group_offsets, bs, axis=0, min_hint=min_hint)


def dds(
    a: jax.Array,
    b: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    m_tile: int = 4096,
    interpret: bool | None = None,
    out_scale: float | None = None,
) -> jax.Array:
    """C[M, N] = op(A_dense) @ op(B_sparse).

    Reference: ``block/dds/dds.h``. Mirrors :func:`dsd`: the sparse operand
    is streamed grouped by *output column*, which for the non-transposed B
    requires the transpose metadata (the reference's tests point this out:
    B needs transpose buffers when NOT transposed, ``dss_test.cu:215-218``).
    """
    interpret = use_interpret() if interpret is None else interpret
    out_dtype = out_dtype or b.dtype
    bs = b.block_size
    n_dim = b.rows if transpose_b else b.cols
    k_dim = b.cols if transpose_b else b.rows
    m_dim = a.shape[1] if transpose_a else a.shape[0]
    ak = a.shape[0] if transpose_a else a.shape[1]
    if ak != k_dim:
        raise ValueError(f"contraction mismatch: B gives k={k_dim}, A gives {ak}")

    if b.nnz_blocks == 0:
        return jnp.zeros((m_dim, n_dim), out_dtype)

    # Group B's blocks by the output-column tile they touch.
    out_ids, dep_ids, data_ids = b.iteration_arrays(transposed=not transpose_b)
    group_offsets = (
        b.offsets if transpose_b else b.with_transpose_metadata().offsets_t
    )
    min_hint = b.min_row_nnz if transpose_b else b.min_col_nnz
    bm = pick_tile(m_dim, m_tile)
    if transpose_a:  # A stored (K, M)
        panel_spec = pl.BlockSpec(
            (bs, bm), lambda p, j, out_ids, dep_ids, data_ids: (dep_ids[j], p)
        )
    else:  # A stored (M, K)
        panel_spec = pl.BlockSpec(
            (bm, bs), lambda p, j, out_ids, dep_ids, data_ids: (p, dep_ids[j])
        )
    out = _stream_call(
        sparse_data=b.data,
        out_ids=out_ids,
        dep_ids=dep_ids,
        data_ids=data_ids,
        panel=a,
        panel_spec=panel_spec,
        out_rows=m_dim,
        out_cols=n_dim,
        out_block=(bm, bs),
        out_index=lambda p, j, out_ids, dep_ids, data_ids: (p, out_ids[j]),
        panel_tiles=cdiv(m_dim, bm),
        dims=dot_dims(transpose_a, transpose_b),
        block_first=False,
        out_dtype=out_dtype,
        interpret=interpret,
        out_scale=out_scale,
    )
    return _mask_empty_groups(out, group_offsets, bs, axis=1, min_hint=min_hint)

