"""Sparse-saving DSD for small block sizes (16, 32, 64) — packed MXU tiles.

The reference reserves ``BlockSize`` {16, 32, 64} but never wires them
(``arguments.h:13-19``: only 128 dispatches); round 1 ran them through the
densifying jnp fallback — correct but with ZERO sparse compute savings.

The TPU-native answer: PACK ``128 // bs`` small blocks into every MXU
operation.

  * Within one block-row, ``pack`` consecutive blocks concatenate along
    the contraction dim: lhs = concat(A_blk...) is (bs, 128) and
    rhs = concat(B panels at each block's column) is (128, bn) — one
    full-depth MXU dot covers ``pack`` blocks.
  * ``pack`` block-rows share one (128, bn) output tile (a "super-row"):
    each step's contribution lands in its sub-row's sublane slice of the
    fp32 accumulator, which flushes once per super-row — the same
    revisit discipline as the 128-block stream kernel.

Work skipped = exactly the absent blocks (the sparse saving the reference
reserved the enum for). Padding steps point at one appended zero block,
so no masking is needed in-kernel.

Modes: NN / NT (the dense operand flips via its index map). Transposed
sparse operands fall back to the registry's jnp variant — the reference
wired no small-block mode at all, so this is strictly more coverage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sputnik_tpu.formats import BlockSparseMatrix
from sputnik_tpu.kernels.common import cdiv, compiler_params, pick_tile, use_interpret

__all__ = ["dsd_smallblock", "plan_smallblock"]

SUPER = 128  # MXU-aligned supertile edge


def plan_smallblock(a: BlockSparseMatrix):
    """(out_ids, subs, deps, data_ids, n_steps, row_counts) host-side.

    Step = up to ``pack`` consecutive blocks of ONE block-row, concatenated
    along k. ``out_ids`` (super-row per step) is non-decreasing. Padding
    slots point at block index ``nnz`` (an appended zero block).
    """
    bs = a.block_size
    pack = SUPER // bs
    offs = np.asarray(a.offsets)
    deps_all = np.asarray(a.indices)
    nnz = a.nnz_blocks
    n_rows = len(offs) - 1
    out_ids, subs, deps, datas = [], [], [], []
    row_counts = np.zeros(cdiv(n_rows, pack), np.int64)
    for row in range(n_rows):
        lo, hi = int(offs[row]), int(offs[row + 1])
        sup, sub = divmod(row, pack)
        for base in range(lo, hi, pack):
            chunkb = list(range(base, min(base + pack, hi)))
            pad = pack - len(chunkb)
            out_ids.append(sup)
            subs.append(sub)
            deps.extend([int(deps_all[b]) for b in chunkb] + [0] * pad)
            datas.extend(chunkb + [nnz] * pad)  # nnz -> appended zero block
            row_counts[sup] += 1
    as_i32 = lambda x: jnp.asarray(np.asarray(x, np.int32))
    return (
        as_i32(out_ids), as_i32(subs), as_i32(deps), as_i32(datas),
        len(out_ids), row_counts,
    )


def _small_kernel(
    out_ids, subs, deps, datas,
    *refs,
    pack: int,
    n_steps: int,
    bs: int,
    transpose_b: bool,
):
    a_refs = refs[:pack]
    b_refs = refs[pack : 2 * pack]
    out_ref = refs[2 * pack]
    acc_ref = refs[2 * pack + 1]
    j = pl.program_id(1)
    cur = out_ids[j]
    prev = out_ids[jnp.maximum(j - 1, 0)]
    nxt = out_ids[jnp.minimum(j + 1, n_steps - 1)]
    is_first = jnp.logical_or(j == 0, prev != cur)
    is_last = jnp.logical_or(j == n_steps - 1, nxt != cur)

    @pl.when(is_first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lhs = jnp.concatenate(
        [a_refs[g][0] for g in range(pack)], axis=1
    )  # (bs, pack*bs = 128)
    if transpose_b:  # panels stored (bn, bs): concat columns, contract them
        rhs = jnp.concatenate([b_refs[g][:] for g in range(pack)], axis=1)
        dims = (((1,), (1,)), ((), ()))
    else:  # panels (bs, bn): concat rows
        rhs = jnp.concatenate([b_refs[g][:] for g in range(pack)], axis=0)
        dims = (((1,), (0,)), ((), ()))
    prod = jax.lax.dot_general(
        lhs, rhs, dims, preferred_element_type=jnp.float32
    )  # (bs, bn)
    sub = subs[j]
    acc_ref[pl.ds(sub * bs, bs)] += prod

    @pl.when(is_last)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def dsd_smallblock(
    a: BlockSparseMatrix,
    b: jax.Array,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    n_tile: int = 2048,
    schedule=None,  # plan_smallblock(a) result (the MatmulEx discipline)
    interpret: bool | None = None,
) -> jax.Array:
    """C = A_smallblock @ op(B): sparse compute savings at bs in {16, 32, 64}."""
    if transpose_a:
        raise NotImplementedError("small-block DSD: transposed A falls back")
    interpret = use_interpret() if interpret is None else interpret
    out_dtype = out_dtype or a.dtype
    bs = a.block_size
    pack = SUPER // bs
    m_dim, k_dim = a.rows, a.cols
    n_dim = b.shape[0] if transpose_b else b.shape[1]
    out_ids, subs, deps, datas, n_steps, row_counts = (
        schedule if schedule is not None else plan_smallblock(a)
    )
    if n_steps == 0:
        return jnp.zeros((m_dim, n_dim), out_dtype)
    # One zero block appended: padding slots fetch it and contribute 0.
    data_pad = jnp.concatenate(
        [a.data, jnp.zeros((1, bs, bs), a.data.dtype)], axis=0
    )
    bn = pick_tile(n_dim, n_tile)
    if transpose_b:  # B stored (N, K)
        def p_map(g):
            return lambda p, j, out, su, de, da: (p, de[j * pack + g])
        panel_spec = [pl.BlockSpec((bn, bs), p_map(g)) for g in range(pack)]
    else:  # B stored (K, N)
        def p_map(g):
            return lambda p, j, out, su, de, da: (de[j * pack + g], p)
        panel_spec = [pl.BlockSpec((bs, bn), p_map(g)) for g in range(pack)]

    def a_map(g):
        return lambda p, j, out, su, de, da: (da[j * pack + g], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(cdiv(n_dim, bn), n_steps),
        in_specs=[pl.BlockSpec((1, bs, bs), a_map(g)) for g in range(pack)]
        + panel_spec,
        out_specs=pl.BlockSpec(
            (SUPER, bn), lambda p, j, out, su, de, da: (out[j], p)
        ),
        scratch_shapes=[pltpu.VMEM((SUPER, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _small_kernel, pack=pack, n_steps=n_steps, bs=bs,
            transpose_b=transpose_b,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (cdiv(m_dim, SUPER) * SUPER, n_dim), out_dtype
        ),
        compiler_params=compiler_params(("parallel", "arbitrary")),
        interpret=interpret,
    )(out_ids, subs, deps, datas, *([data_pad] * pack), *([b] * pack))
    # Super-rows never visited stay uninitialized: zero them.
    if (row_counts == 0).any():
        mask = jnp.repeat(jnp.asarray(row_counts > 0), SUPER)
        out = jnp.where(mask[:, None], out, jnp.zeros([], out.dtype))
    return out[:m_dim]
