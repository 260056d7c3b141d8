"""BSR SSD / SDS Pallas kernels: sparse = sparse @ dense / dense @ sparse.

TPU-native re-design of the reference SSD/SDS paths (``block/ssd/ssd.h``,
``block/sds/sds.h``): output-stationary — one program chain per nonzero
output block (the ``SparseOutputThreadblockSwizzle`` structure) — with a
data-dependent trip count over the sparse *operand*'s blocks in the output
block's row (SSD) / column (SDS), the analogue of the reference's
``ConfigHelper`` reading ``offsets[m], offsets[m+1]`` to set ``StepsK()``
(``block_gemm.h:129-192``).

XLA needs static grids, so the step dimension is bounded by the operand's
``max_row_nnz`` / ``max_col_nnz`` descriptor hint (worst case: the full
block dimension) and steps beyond a row's extent are masked — they fetch a
clamped (repeated, hence cached) block and contribute zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sputnik_tpu.formats import BlockSparseMatrix
from sputnik_tpu.kernels.common import compiler_params, dot_dims, use_interpret

__all__ = ["ssd", "sds"]


def _sparse_out_kernel(
    # scalar prefetch
    group_of,  # (nnz_c,) stream-group id per output block
    c_other,  # (nnz_c,) the output block's other coordinate (unused in body)
    offs,  # (groups + 1,) stream operand's group offsets
    dep,  # (nnz_stream,) contraction block ids, iteration order
    data_ids,  # (nnz_stream,) physical positions, iteration order
    # tensors
    block_ref,  # (1, bs, bs) sparse operand block
    panel_ref,  # (bs, bs) dense operand tile
    out_ref,  # (1, bs, bs) output block
    acc_ref,  # (bs, bs) fp32
    *,
    max_steps: int,
    dims,
    block_first: bool,
):
    del c_other, dep, data_ids
    b = pl.program_id(0)
    s = pl.program_id(1)
    g = group_of[b]
    valid = offs[g] + s < offs[g + 1]

    @pl.when(s == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    block = block_ref[0]
    panel = panel_ref[:]
    lhs, rhs = (block, panel) if block_first else (panel, block)
    prod = jax.lax.dot_general(
        lhs, rhs, dims, preferred_element_type=jnp.float32
    )
    acc_ref[:] += jnp.where(valid, prod, jnp.zeros_like(prod))

    @pl.when(s == max_steps - 1)
    def _():
        out_ref[0] = acc_ref[:].astype(out_ref.dtype)


def _sparse_out_call(
    *,
    stream: BlockSparseMatrix,
    stream_transposed: bool,
    group_of,
    c_other,
    panel,
    panel_index,  # (k_fn, other_fn) -> block index for the dense tile
    topology: BlockSparseMatrix,
    max_steps: int | None,
    dims,
    block_first: bool,
    out_dtype,
    interpret: bool,
):
    bs = topology.block_size
    nnz_c = topology.nnz_blocks
    nnz_s = stream.nnz_blocks
    if nnz_c == 0:
        return topology.with_data(jnp.zeros((0, bs, bs), out_dtype))
    if nnz_s == 0:
        return topology.with_data(
            jnp.zeros((nnz_c, bs, bs), out_dtype)
        )

    if stream_transposed:
        m = stream.with_transpose_metadata()
        offs = m.offsets_t
    else:
        offs = stream.offsets
    _, dep, data_ids = stream.iteration_arrays(transposed=stream_transposed)

    if max_steps is None:
        hint = stream.max_col_nnz if stream_transposed else stream.max_row_nnz
        bound = stream.block_rows if stream_transposed else stream.block_cols
        max_steps = hint if hint is not None else bound
    max_steps = max(int(max_steps), 1)

    def _slot(b, s, group_of, c_other, offs, dep, data_ids):
        return jnp.minimum(offs[group_of[b]] + s, nnz_s - 1)

    def block_index(b, s, *sc):
        return (sc[4][_slot(b, s, *sc)], 0, 0)

    def dense_index(b, s, *sc):
        k = sc[3][_slot(b, s, *sc)]
        return panel_index(k, sc[1][b])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nnz_c, max_steps),
        in_specs=[
            pl.BlockSpec((1, bs, bs), block_index),
            pl.BlockSpec((bs, bs), dense_index),
        ],
        out_specs=pl.BlockSpec((1, bs, bs), lambda b, s, *sc: (b, 0, 0)),
        scratch_shapes=[pltpu.VMEM((bs, bs), jnp.float32)],
    )
    data = pl.pallas_call(
        functools.partial(
            _sparse_out_kernel,
            max_steps=max_steps,
            dims=dims,
            block_first=block_first,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nnz_c, bs, bs), out_dtype),
        compiler_params=compiler_params(("parallel", "arbitrary")),
        interpret=interpret,
    )(group_of, c_other, offs, dep, data_ids, stream.data, panel)
    return topology.with_data(data)


def ssd(
    a: BlockSparseMatrix,
    b: jax.Array,
    topology: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    max_steps: int | None = None,
    interpret: bool | None = None,
    **_,
) -> BlockSparseMatrix:
    """C_sparse = op(A_sparse) @ op(B_dense), masked to ``topology``.

    Reference: ``block/ssd/ssd.h:10-22``; oracle semantics
    ``ssd_test.cu:219-224`` (elementwise mask with the output topology).
    """
    interpret = use_interpret() if interpret is None else interpret
    out_dtype = out_dtype or topology.dtype
    bs = topology.block_size
    m_dim = a.cols if transpose_a else a.rows
    k_dim = a.rows if transpose_a else a.cols
    n_dim = b.shape[0] if transpose_b else b.shape[1]
    kb = b.shape[1] if transpose_b else b.shape[0]
    if kb != k_dim:
        raise ValueError(f"contraction mismatch: A gives k={k_dim}, B gives {kb}")
    if (m_dim, n_dim) != topology.shape:
        raise ValueError(f"output shape {(m_dim, n_dim)} != topology {topology.shape}")

    if transpose_b:  # B stored (N, K)
        panel_index = lambda k, other: (other, k)
    else:  # B stored (K, N)
        panel_index = lambda k, other: (k, other)
    return _sparse_out_call(
        stream=a,
        stream_transposed=transpose_a,
        group_of=topology.row_indices,
        c_other=topology.indices,
        panel=b,
        panel_index=panel_index,
        topology=topology,
        max_steps=max_steps,
        dims=dot_dims(transpose_a, transpose_b),
        block_first=True,
        out_dtype=out_dtype,
        interpret=interpret,
    )


def sds(
    a: jax.Array,
    b: BlockSparseMatrix,
    topology: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    max_steps: int | None = None,
    interpret: bool | None = None,
    **_,
) -> BlockSparseMatrix:
    """C_sparse = op(A_dense) @ op(B_sparse), masked to ``topology``.

    Reference: ``block/sds/sds.h``. The sparse operand streams grouped by
    op(B)'s *column* (the output block's column), which for non-transposed B
    uses the transpose metadata.
    """
    interpret = use_interpret() if interpret is None else interpret
    out_dtype = out_dtype or topology.dtype
    n_dim = b.rows if transpose_b else b.cols
    k_dim = b.cols if transpose_b else b.rows
    m_dim = a.shape[1] if transpose_a else a.shape[0]
    ka = a.shape[0] if transpose_a else a.shape[1]
    if ka != k_dim:
        raise ValueError(f"contraction mismatch: B gives k={k_dim}, A gives {ka}")
    if (m_dim, n_dim) != topology.shape:
        raise ValueError(f"output shape {(m_dim, n_dim)} != topology {topology.shape}")

    if transpose_a:  # A stored (K, M)
        panel_index = lambda k, other: (k, other)
    else:  # A stored (M, K)
        panel_index = lambda k, other: (other, k)
    return _sparse_out_call(
        stream=b,
        stream_transposed=not transpose_b,
        group_of=topology.indices,
        c_other=topology.row_indices,
        panel=a,
        panel_index=panel_index,
        topology=topology,
        max_steps=max_steps,
        dims=dot_dims(transpose_a, transpose_b),
        block_first=False,
        out_dtype=out_dtype,
        interpret=interpret,
    )
