"""Standalone Pallas BSR sparse softmax (exact-nnz byte traffic).

The round-2 ``ops.bsr_softmax`` is a jnp segment-op chain: ~6 fp32 passes
over the packed data (max reduce, exp materialize, segment sum, divide).
This kernel pair does the structural minimum — 3 passes in the storage
dtype:

  pass A (stats):     stream the row's blocks once, online (m, l) in VMEM
                      (the flash rescaling update), write per-row stats on
                      row end;
  pass B (normalize): re-read each block once, write exp(s - m)/l to its
                      packed slot.

Masking/scale are recomputed in pass B (iota compare, free on the VPU)
instead of materializing masked scores. Semantics identical to the jnp
path, including its causal contract (diagonal blocks intra-masked, blocks
above the diagonal fully masked) and zero output for fully-masked rows.

Upstream Sputnik's CSR sparse softmax is the capability being re-expressed
(SURVEY.md north star / §2.6); the blocked layout is this fork's.
Differentiable via a softmax-Jacobian custom VJP (jnp backward over the
packed blocks: dx = scale * p * (g - rowsum(p g))).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sputnik_tpu.formats import BlockSparseMatrix
from sputnik_tpu.kernels.common import compiler_params, use_interpret

__all__ = ["bsr_softmax_pallas"]

_NEG_INF = -1e30


def _masked_scores(x, row, col, bs, scale, causal):
    s = x.astype(jnp.float32) * scale
    if causal:
        r = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
        on_diag = row == col
        below = row > col
        keep = jnp.logical_or(
            below, jnp.logical_and(on_diag, r >= c)
        )
        s = jnp.where(keep, s, _NEG_INF)
    return s


def _stats_kernel(rows, cols, blk_ref, m_out, l_out, m_scr, l_scr, *,
                  nnz: int, bs: int, scale: float, causal: bool):
    j = pl.program_id(0)
    cur = rows[j]
    prev = rows[jnp.maximum(j - 1, 0)]
    nxt = rows[jnp.minimum(j + 1, nnz - 1)]
    is_first = jnp.logical_or(j == 0, prev != cur)
    is_last = jnp.logical_or(j == nnz - 1, nxt != cur)

    @pl.when(is_first)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    s = _masked_scores(blk_ref[0], rows[j], cols[j], bs, scale, causal)
    m_prev = m_scr[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    p = jnp.where(s > 0.5 * _NEG_INF, p, 0.0)
    l_scr[:, 0:1] = l_scr[:, 0:1] * jnp.exp(m_prev - m_new) + jnp.sum(
        p, axis=1, keepdims=True
    )
    m_scr[:, 0:1] = m_new

    @pl.when(is_last)
    def _():
        m_out[:] = jnp.broadcast_to(m_scr[:, 0:1], m_out.shape)
        l_out[:] = jnp.broadcast_to(l_scr[:, 0:1], l_out.shape)


def _normalize_kernel(rows, cols, blk_ref, m_ref, l_ref, out_ref, *,
                      bs: int, scale: float, causal: bool):
    j = pl.program_id(0)
    s = _masked_scores(blk_ref[0], rows[j], cols[j], bs, scale, causal)
    e = jnp.exp(s - m_ref[:, 0:1])
    e = jnp.where(s > 0.5 * _NEG_INF, e, 0.0)
    out_ref[0] = (e / jnp.maximum(l_ref[:, 0:1], 1e-30)).astype(out_ref.dtype)


def _forward(m: BlockSparseMatrix, scale: float, causal: bool,
             interpret: bool) -> jax.Array:
    bs = m.block_size
    nnz = m.nnz_blocks
    rows = m.row_indices.astype(jnp.int32)
    cols = m.indices.astype(jnp.int32)
    t = m.block_rows * bs
    row_map = lambda j, r_, c_: (r_[j], 0)
    m_stat, l_stat = pl.pallas_call(
        functools.partial(_stats_kernel, nnz=nnz, bs=bs, scale=scale,
                          causal=causal),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nnz,),
            in_specs=[pl.BlockSpec((1, bs, bs), lambda j, r_, c_: (j, 0, 0))],
            out_specs=(
                pl.BlockSpec((bs, 128), row_map),
                pl.BlockSpec((bs, 128), row_map),
            ),
            scratch_shapes=[
                pltpu.VMEM((bs, 128), jnp.float32),
                pltpu.VMEM((bs, 128), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, 128), jnp.float32),
            jax.ShapeDtypeStruct((t, 128), jnp.float32),
        ),
        compiler_params=compiler_params(("arbitrary",)),
        interpret=interpret,
    )(rows, cols, m.data)
    return pl.pallas_call(
        functools.partial(_normalize_kernel, bs=bs, scale=scale,
                          causal=causal),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nnz,),
            in_specs=[
                pl.BlockSpec((1, bs, bs), lambda j, r_, c_: (j, 0, 0)),
                pl.BlockSpec((bs, 128), row_map),
                pl.BlockSpec((bs, 128), row_map),
            ],
            out_specs=pl.BlockSpec((1, bs, bs), lambda j, r_, c_: (j, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((nnz, bs, bs), m.dtype),
        compiler_params=compiler_params(("arbitrary",)),
        interpret=interpret,
    )(rows, cols, m.data, m_stat, l_stat)


def bsr_softmax_pallas(
    m: BlockSparseMatrix,
    *,
    scale: float | None = None,
    causal: bool = False,
    interpret: bool | None = None,
) -> BlockSparseMatrix:
    """Row-wise softmax over the nonzero blocks, Pallas two-pass kernel.

    Drop-in for the jnp ``ops.bsr_softmax`` (same causal contract); the
    data crosses HBM 3x in the storage dtype instead of ~6x in fp32.
    """
    if m.nnz_blocks == 0:
        return m
    interpret = use_interpret() if interpret is None else interpret
    sc = 1.0 if scale is None else float(scale)
    n_rows = m.block_rows

    # Metadata rides as EXPLICIT custom_vjp args with float0 cotangents:
    # closing over it leaks tracers out of grad scopes when the topology is
    # itself traced (the sell softmax learned the same lesson).
    def _forward_raw(data, rows, cols):
        mm = BlockSparseMatrix(
            data=data,
            offsets=m.offsets,
            indices=cols,
            row_indices=rows,
            offsets_t=None, indices_t=None, block_offsets=None,
            shape=m.shape, block_size=m.block_size,
            max_row_nnz=m.max_row_nnz, max_col_nnz=m.max_col_nnz,
            min_row_nnz=m.min_row_nnz, min_col_nnz=m.min_col_nnz,
        )
        return _forward(mm, sc, causal, interpret)

    @jax.custom_vjp
    def f(data, rows, cols):
        return _forward_raw(data, rows, cols)

    def fwd(data, rows, cols):
        p = f(data, rows, cols)
        return p, (p, rows)

    def _int_ct(x):
        import numpy as _np
        return _np.zeros(_np.shape(x), jax.dtypes.float0)

    def bwd(res, g):
        # Softmax Jacobian over block rows: dx = scale * p * (g - rowdot),
        # rowdot_r = sum_j p_rj g_rj across the row's stored blocks.
        p, rows = res
        pf = p.astype(jnp.float32)
        gf = g.astype(jnp.float32)
        per_block = jnp.sum(pf * gf, axis=2)  # (nnz, bs)
        rowdot = jax.ops.segment_sum(per_block, rows, num_segments=n_rows)
        dx = sc * pf * (gf - rowdot[rows][:, :, None])
        return dx.astype(p.dtype), _int_ct(rows), _int_ct(rows)

    f.defvjp(fwd, bwd)
    return m.with_data(
        f(m.data, m.row_indices.astype(jnp.int32), m.indices.astype(jnp.int32))
    )
