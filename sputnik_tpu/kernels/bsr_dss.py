"""BSR DSS Pallas kernel: dense = sparse @ sparse.

TPU-native re-design of the reference DSS path (``block/dss/dss.h``,
``IndexMerge`` in ``block/cutlass/index_merge.h:90-227``): the reference
intersects per-tile k-bitmasks in shared memory with popcount-ranked
scatters. On TPU we instead:

  * stream op(A)'s row-m blocks (variable trip count, like SSD),
  * look op(B)'s matching block up in a dense int32 *position map*
    (``pos[k, n]`` = physical block or -1) — one structure subsuming the
    reference's bitmask (presence) + block_offsets (position), built as a
    cheap jitted scatter (vs. the reference's host-side bitmask build
    "TODO: cache", ``dss_*_tn_align8.cu:99-110``),
  * mask out steps where B has no block at (k, n); the clamped fetch
    repeats a block (Pallas skips the re-DMA) and contributes zero.

The step count per (m, n) tile is A's row extent rather than the
intersection size — the round-1 tradeoff vs. the reference's exact merge;
a work-list formulation slots into the registry later.

The reference's k <= 32768 limit (uint8 smem offsets, ``index_merge.h:
102-114``) does not apply: positions are int32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sputnik_tpu.formats import BlockSparseMatrix
from sputnik_tpu.kernels.common import compiler_params, dot_dims, use_interpret

__all__ = ["dss"]


def _dss_kernel(
    # scalar prefetch
    a_offs,  # (m_blocks + 1,)
    a_dep,  # (nnz_a,) k block ids, iteration order
    a_data,  # (nnz_a,) physical positions (index maps only)
    b_pos,  # (k_blocks * n_blocks,) physical position of op(B)[k, n] or -1
    # tensors
    a_ref,  # (1, bs, bs)
    b_ref,  # (1, bs, bs)
    out_ref,  # (bs, bs)
    acc_ref,  # (bs, bs) fp32
    *,
    max_steps: int,
    n_blocks: int,
    nnz_a: int,
    dims,
):
    del a_data
    m = pl.program_id(0)
    n = pl.program_id(1)
    s = pl.program_id(2)
    slot = jnp.minimum(a_offs[m] + s, nnz_a - 1)
    k = a_dep[slot]
    in_row = a_offs[m] + s < a_offs[m + 1]
    valid = jnp.logical_and(in_row, b_pos[k * n_blocks + n] >= 0)

    @pl.when(s == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    prod = jax.lax.dot_general(
        a_ref[0], b_ref[0], dims, preferred_element_type=jnp.float32
    )
    acc_ref[:] += jnp.where(valid, prod, jnp.zeros_like(prod))

    @pl.when(s == max_steps - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def dss(
    a: BlockSparseMatrix,
    b: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    max_steps: int | None = None,
    interpret: bool | None = None,
    **_,
) -> jax.Array:
    """C[M, N] = op(A_sparse) @ op(B_sparse).

    Reference: ``block/dss/dss.h:10-22``.
    """
    interpret = use_interpret() if interpret is None else interpret
    out_dtype = out_dtype or a.dtype
    bs = a.block_size
    if b.block_size != bs:
        raise ValueError(f"block size mismatch: {bs} vs {b.block_size}")
    m_dim = a.cols if transpose_a else a.rows
    k_dim = a.rows if transpose_a else a.cols
    n_dim = b.rows if transpose_b else b.cols
    kb = b.cols if transpose_b else b.rows
    if kb != k_dim:
        raise ValueError(f"contraction mismatch: A gives k={k_dim}, B gives {kb}")

    if a.nnz_blocks == 0 or b.nnz_blocks == 0:
        return jnp.zeros((m_dim, n_dim), out_dtype)

    m_blocks = m_dim // bs
    k_blocks = k_dim // bs
    n_blocks = n_dim // bs

    # op(A) row-major stream metadata.
    if transpose_a:
        am = a.with_transpose_metadata()
        a_offs = am.offsets_t
    else:
        a_offs = a.offsets
    _, a_dep, a_data = a.iteration_arrays(transposed=transpose_a)

    # op(B) position map (k, n) -> physical block or -1.
    pos = b.position_map()
    if transpose_b:
        pos = pos.T
    b_pos = pos.reshape(-1)

    if max_steps is None:
        hint = a.max_col_nnz if transpose_a else a.max_row_nnz
        max_steps = hint if hint is not None else k_blocks
    max_steps = max(int(max_steps), 1)

    def a_index(m, n, s, a_offs, a_dep, a_data, b_pos):
        return (a_data[jnp.minimum(a_offs[m] + s, a.nnz_blocks - 1)], 0, 0)

    def b_index(m, n, s, a_offs, a_dep, a_data, b_pos):
        k = a_dep[jnp.minimum(a_offs[m] + s, a.nnz_blocks - 1)]
        return (jnp.maximum(b_pos[k * n_blocks + n], 0), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(m_blocks, n_blocks, max_steps),
        in_specs=[
            pl.BlockSpec((1, bs, bs), a_index),
            pl.BlockSpec((1, bs, bs), b_index),
        ],
        out_specs=pl.BlockSpec((bs, bs), lambda m, n, s, *sc: (m, n)),
        scratch_shapes=[pltpu.VMEM((bs, bs), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(
            _dss_kernel,
            max_steps=max_steps,
            n_blocks=n_blocks,
            nnz_a=a.nnz_blocks,
            dims=dot_dims(transpose_a, transpose_b),
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_dim, n_dim), out_dtype),
        compiler_params=compiler_params(("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(a_offs, a_dep, a_data, b_pos, a.data, b.data)
