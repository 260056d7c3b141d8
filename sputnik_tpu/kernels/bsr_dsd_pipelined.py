"""Manually-pipelined BSR SpMM (DSD/DDS) — the performance kernel.

The grid-streamed kernel (bsr_dsd.py) leaves the MXU idle during the
gathered dense-panel DMAs (measured: total = DMA + MXU, no overlap). This
kernel takes explicit control, the direct analogue of the reference's
multistage cp.async mainloop (``MmaMultistage``, 5 stages): one program per
output tile; inside, a dynamic-trip loop over the row's nonzero blocks with
an S-slot rotating buffer — each iteration waits on slot i%S, immediately
re-issues that slot for block i+S, then feeds the MXU. DMAs run ahead of
compute by S-1 blocks.

Structure notes:
  * grid = (panel_tiles, groups): one program per output tile, written
    exactly once — empty rows naturally emit zeros (no epilogue masking).
  * The sparse operand and the dense panel both live in HBM
    (``memory_space=ANY``); all movement is explicit ``make_async_copy``.
  * Variable trip count = the reference's ``StepsK()`` from
    ``offsets[m], offsets[m+1]`` (``block_gemm.h:129-192``), here a
    ``fori_loop`` bound read from the scalar-prefetched offsets.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sputnik_tpu.formats import BlockSparseMatrix
from sputnik_tpu.kernels.common import cdiv, compiler_params, dot_dims, pick_tile, use_interpret

__all__ = ["dsd", "dds"]

_SLOTS = 4


def _pipelined_kernel(
    # scalar prefetch
    offs,  # (groups + 1,)
    dep_ids,  # (nnz,) contraction block ids, iteration order
    data_ids,  # (nnz,) physical block positions, iteration order
    # tensors (HBM)
    blocks_hbm,  # (nnz, bs, bs)
    panel_hbm,  # dense operand
    # output (VMEM)
    out_ref,  # (tile_m, tile_n)
    # scratch
    block_buf,  # (S, bs, bs)
    panel_buf,  # (S, pb0, pb1)
    acc_ref,  # fp32
    block_sems,  # DMA (S,)
    panel_sems,  # DMA (S,)
    *,
    nnz: int,
    bs: int,
    bn: int,
    panel_transposed: bool,
    dims,
    block_first: bool,
):
    p = pl.program_id(0)
    g = pl.program_id(1)
    start = offs[g]
    steps = offs[g + 1] - start

    def block_copy(i, slot):
        idx = data_ids[jnp.minimum(start + i, nnz - 1)]
        return pltpu.make_async_copy(
            blocks_hbm.at[idx], block_buf.at[slot], block_sems.at[slot]
        )

    def panel_copy(i, slot):
        k = dep_ids[jnp.minimum(start + i, nnz - 1)]
        if panel_transposed:
            src = panel_hbm.at[pl.ds(p * bn, bn), pl.ds(k * bs, bs)]
        else:
            src = panel_hbm.at[pl.ds(k * bs, bs), pl.ds(p * bn, bn)]
        return pltpu.make_async_copy(src, panel_buf.at[slot], panel_sems.at[slot])

    # Warm up: issue the first S fetches.
    for i in range(_SLOTS):
        @pl.when(i < steps)
        def _(i=i):
            block_copy(i, i).start()
            panel_copy(i, i).start()

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(i, _):
        slot = jax.lax.rem(i, _SLOTS)
        block_copy(i, slot).wait()
        panel_copy(i, slot).wait()
        block = block_buf[slot]
        panel = panel_buf[slot]
        lhs, rhs = (block, panel) if block_first else (panel, block)
        prod = jax.lax.dot_general(
            lhs, rhs, dims, preferred_element_type=jnp.float32
        )
        # Refill the slot for block i+S before waiting on anything else.
        @pl.when(i + _SLOTS < steps)
        def _():
            block_copy(i + _SLOTS, slot).start()
            panel_copy(i + _SLOTS, slot).start()

        acc_ref[:] += prod
        return 0

    jax.lax.fori_loop(0, steps, body, 0, unroll=False)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _pipelined_call(
    *,
    sparse_data,
    offs,
    dep_ids,
    data_ids,
    panel,
    panel_transposed: bool,
    out_rows: int,
    out_cols: int,
    out_block,
    out_index,
    panel_tiles: int,
    groups: int,
    dims,
    block_first: bool,
    out_dtype,
    interpret: bool,
):
    nnz, bs = sparse_data.shape[0], sparse_data.shape[-1]
    bn = out_block[1] if block_first else out_block[0]
    pb = (bn, bs) if panel_transposed else (bs, bn)
    kernel = functools.partial(
        _pipelined_kernel,
        nnz=nnz,
        bs=bs,
        bn=bn,
        panel_transposed=panel_transposed,
        dims=dims,
        block_first=block_first,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(panel_tiles, groups),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(out_block, out_index),
        scratch_shapes=[
            pltpu.VMEM((_SLOTS, bs, bs), sparse_data.dtype),
            pltpu.VMEM((_SLOTS,) + pb, panel.dtype),
            pltpu.VMEM(out_block, jnp.float32),
            pltpu.SemaphoreType.DMA((_SLOTS,)),
            pltpu.SemaphoreType.DMA((_SLOTS,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, out_cols), out_dtype),
        compiler_params=compiler_params(("parallel", "arbitrary")),
        interpret=interpret,
    )(offs, dep_ids, data_ids, sparse_data, panel)


def dsd(
    a: BlockSparseMatrix,
    b: jax.Array,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    n_tile: int = 2048,
    interpret: bool | None = None,
) -> jax.Array:
    """Pipelined C[M, N] = op(A_sparse) @ op(B_dense)."""
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

    _, dep_ids, data_ids = a.iteration_arrays(transposed=transpose_a)
    offs = a.with_transpose_metadata().offsets_t if transpose_a else a.offsets
    bn = pick_tile(n_dim, n_tile)
    return _pipelined_call(
        sparse_data=a.data,
        offs=offs,
        dep_ids=dep_ids,
        data_ids=data_ids,
        panel=b,
        panel_transposed=transpose_b,
        out_rows=m_dim,
        out_cols=n_dim,
        out_block=(bs, bn),
        out_index=lambda p, g, *sc: (g, p),
        panel_tiles=cdiv(n_dim, bn),
        groups=m_dim // bs,
        dims=dot_dims(transpose_a, transpose_b),
        block_first=True,
        out_dtype=out_dtype,
        interpret=interpret,
    )


def dds(
    a: jax.Array,
    b: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    m_tile: int = 2048,
    interpret: bool | None = None,
) -> jax.Array:
    """Pipelined C[M, N] = op(A_dense) @ op(B_sparse)."""
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

    _, dep_ids, data_ids = b.iteration_arrays(transposed=not transpose_b)
    offs = b.offsets if transpose_b else b.with_transpose_metadata().offsets_t
    bm = pick_tile(m_dim, m_tile)
    return _pipelined_call(
        sparse_data=b.data,
        offs=offs,
        dep_ids=dep_ids,
        data_ids=data_ids,
        panel=a,
        panel_transposed=not transpose_a,
        out_rows=m_dim,
        out_cols=n_dim,
        out_block=(bm, bs),
        out_index=lambda p, g, *sc: (p, g),
        panel_tiles=cdiv(m_dim, bm),
        groups=n_dim // bs,
        dims=dot_dims(transpose_a, transpose_b),
        block_first=False,
        out_dtype=out_dtype,
        interpret=interpret,
    )
