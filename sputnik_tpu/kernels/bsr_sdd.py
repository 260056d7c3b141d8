"""BSR SDD Pallas kernel: sparse = dense @ dense (output-masked SDDMM).

TPU-native re-design of the reference SDD path (``block/sdd/sdd.h``,
``SparseOutputThreadblockSwizzle`` in ``block/cutlass/threadblock_swizzle.h:
14-19`` and ``OutputConfig::UpdateTileOffset`` in ``block_gemm.h:490-498``):
one program per nonzero output block — output-stationary, perfectly
load-balanced — which looks up its (row, col) tile via the prefetched
``row_indices`` / ``indices`` metadata and runs a full dense K loop,
accumulating in fp32 scratch and writing one packed block
(the analogue of ``block_tile_output_iterator.h``).

Semantics (verified against the reference test oracle,
``sdd_test.cu:190-196``): ``C.data = blocks of (op(A) @ op(B))`` at the
pre-existing output topology — topology is an *input*, only values are
produced.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
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

__all__ = ["sdd"]


def _sdd_kernel(rows, cols, a_ref, b_ref, out_ref, acc_ref, *, k_tiles, dims):
    del rows, cols
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:], dims, preferred_element_type=jnp.float32
    )

    @pl.when(k == k_tiles - 1)
    def _():
        out_ref[0] = acc_ref[:].astype(out_ref.dtype)


def sdd(
    a: jax.Array,
    b: jax.Array,
    topology: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    k_tile: int = 512,
    interpret: bool | None = None,
) -> BlockSparseMatrix:
    """C_sparse = op(A_dense) @ op(B_dense), masked to ``topology``.

    Returns a new :class:`BlockSparseMatrix` sharing ``topology``'s metadata
    with freshly computed block values.
    """
    interpret = use_interpret() if interpret is None else interpret
    out_dtype = out_dtype or topology.dtype
    bs = topology.block_size
    m_dim = a.shape[1] if transpose_a else a.shape[0]
    k_dim = a.shape[0] if transpose_a else a.shape[1]
    n_dim = b.shape[0] if transpose_b else b.shape[1]
    kb = b.shape[1] if transpose_b else b.shape[0]
    if kb != k_dim:
        raise ValueError(f"contraction mismatch: A gives k={k_dim}, B gives {kb}")
    if (m_dim, n_dim) != topology.shape:
        raise ValueError(f"output shape {(m_dim, n_dim)} != topology {topology.shape}")

    nnz = topology.nnz_blocks
    if nnz == 0:
        return topology.with_data(jnp.zeros((0, bs, bs), out_dtype))

    bk = pick_tile(k_dim, k_tile)
    k_tiles = cdiv(k_dim, bk)
    rows = topology.row_indices
    cols = topology.indices

    if transpose_a:  # A stored (K, M)
        a_spec = pl.BlockSpec((bk, bs), lambda i, k, rows, cols: (k, rows[i]))
    else:  # A stored (M, K)
        a_spec = pl.BlockSpec((bs, bk), lambda i, k, rows, cols: (rows[i], k))
    if transpose_b:  # B stored (N, K)
        b_spec = pl.BlockSpec((bs, bk), lambda i, k, rows, cols: (cols[i], k))
    else:  # B stored (K, N)
        b_spec = pl.BlockSpec((bk, bs), lambda i, k, rows, cols: (k, cols[i]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nnz, k_tiles),
        in_specs=[a_spec, b_spec],
        out_specs=pl.BlockSpec((1, bs, bs), lambda i, k, rows, cols: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((bs, bs), jnp.float32)],
    )
    data = pl.pallas_call(
        functools.partial(
            _sdd_kernel, k_tiles=k_tiles, dims=dot_dims(transpose_a, transpose_b)
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nnz, bs, bs), out_dtype),
        compiler_params=compiler_params(("parallel", "arbitrary")),
        interpret=interpret,
    )(rows, cols, a, b)
    return topology.with_data(data)
