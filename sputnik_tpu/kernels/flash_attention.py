"""Fused block-sparse attention (flash-style): SDD + softmax + DSD in ONE
Pallas kernel with online softmax — scores are never materialized.

The unfused chain (``models/attention.py``) runs three kernels and writes/
rereads the (nnz, bs, bs) score blocks twice. Here each query row-tile
streams its topology's (K, V) blocks once:

    s      = q_tile @ k_block^T * scale     (MXU)
    m'     = max(m, rowmax(s)); c = exp(m - m')
    p      = exp(s - m')
    l      = l * c + rowsum(p)
    acc    = acc * c + p @ v_block          (MXU)
    out    = acc / l                        (on the row's last block)

Memory: O(T * dh) instead of O(nnz_blocks * bs^2) — the long-context win;
compute: identical MACs, one pass over HBM. The structure is exactly the
reference's sparse-output decomposition (one program per nonzero block,
``kernel.h:86-90``) ridden in row-major order with an accumulator, the
same revisiting trick as the DSD stream kernel.

Causal masking mirrors ``ops/softmax.py::bsr_softmax``: blocks above the
diagonal are fully masked, diagonal blocks get the intra-block triangle —
with a block-lower-triangular topology this is exact causal attention.

Backward: recompute through the unfused ops (the standard flash trade:
save nothing but the inputs). Training still gets sparse backwards; the
fused kernel wins the forward pass and inference.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sputnik_tpu.formats import BlockSparseMatrix
from sputnik_tpu.kernels.bsr_flat import _batch_items
from sputnik_tpu.kernels.common import compiler_params, use_interpret

__all__ = ["flash_block_attention"]

_NEG_INF = -1e30


def _kernel(
    # scalar prefetch
    rows,  # (n_steps,) block-row id per step (non-decreasing)
    cols,  # (n_steps * group,) block-col id per sub-item
    flags,  # (n_steps * group,) 1 = real work, 0 = group padding
    *refs,  # q_ref, group k refs, group v refs, out_ref, acc, m, l
    group: int,
    n_steps: int,
    bs: int,
    scale: float,
    causal: bool,
):
    q_ref = refs[0]
    k_refs = refs[1 : 1 + group]
    v_refs = refs[1 + group : 1 + 2 * group]
    out_ref = refs[1 + 2 * group]
    acc_ref, m_ref, l_ref = refs[2 + 2 * group :]
    j = pl.program_id(0)
    cur = rows[j]
    prev = rows[jnp.maximum(j - 1, 0)]
    nxt = rows[jnp.minimum(j + 1, n_steps - 1)]
    is_first = jnp.logical_or(j == 0, prev != cur)
    is_last = jnp.logical_or(j == n_steps - 1, nxt != cur)

    @pl.when(is_first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # Build the (bs, group*bs) score STRIP: one MXU dot per block, then a
    # SINGLE online-softmax update for the whole strip — the exp/rescale
    # VPU work (which dominates: the dots are ~40 ns, the softmax ~500 ns
    # per block) amortizes over the group. Measured 2.4x vs per-block.
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
    strip = []
    for g in range(group):
        s = jax.lax.dot_general(
            q_ref[:],
            k_refs[g][:],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (bs, bs), f32 accumulate, native-dtype MXU inputs
        valid = flags[j * group + g] > 0
        if causal:
            on_diag = rows[j] == cols[j * group + g]
            below = rows[j] > cols[j * group + g]
            # Boolean algebra instead of a bool-vector select (Mosaic
            # cannot legalize arith.select on i1 vectors).
            keep = jnp.logical_or(
                jnp.logical_and(on_diag, r_iota >= c_iota),
                jnp.logical_and(jnp.logical_not(on_diag), below),
            )
            keep = jnp.logical_and(keep, valid)
        else:
            # Padding sub-items mask their whole block to -inf: rowmax
            # stays m_prev, corr = 1, p = 0 — the state is untouched.
            keep = jnp.logical_and(jnp.ones((bs, bs), bool), valid)
        strip.append(jnp.where(keep, s, _NEG_INF))
    s_strip = jnp.concatenate(strip, axis=1) if group > 1 else strip[0]

    m_prev = m_ref[:, 0:1]  # (bs, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s_strip, axis=1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(s_strip - m_new)  # (bs, group*bs)
    # Masked entries hold exactly _NEG_INF. While m_new is still _NEG_INF
    # (a row whose strips so far are fully masked — e.g. causal with all
    # topology blocks above the diagonal), exp(s - m_new) = exp(0) = 1
    # would average V into the row instead of leaving it zero; zero those
    # probabilities explicitly. Real scores cannot approach -1e30.
    p = jnp.where(s_strip > 0.5 * _NEG_INF, p, 0.0)
    l_ref[:, 0:1] = l_ref[:, 0:1] * corr + jnp.sum(p, axis=1, keepdims=True)
    v_strip = (
        jnp.concatenate([v_refs[g][:] for g in range(group)], axis=0)
        if group > 1
        else v_refs[0][:]
    )
    pv = jax.lax.dot_general(
        p.astype(v_strip.dtype),  # probs in operand dtype, f32 accumulate
        v_strip,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * corr + pv
    m_ref[:, 0:1] = m_new

    @pl.when(is_last)
    def _():
        denom = jnp.maximum(l_ref[:, 0:1], 1e-30)
        out_ref[:] = (acc_ref[:] / denom).astype(out_ref.dtype)


_GROUP = 4


def _plan(topology: BlockSparseMatrix):
    """(step rows, sub-item cols, flags, group, n_steps) — batched when the
    metadata is concrete, one item per step when traced."""
    ri, ci = topology.row_indices, topology.indices
    if not (isinstance(ri, jax.core.Tracer) or isinstance(ci, jax.core.Tracer)):
        sched = _batch_items(
            np.asarray(ri),
            (np.asarray(ci), np.asarray(ci), np.asarray(ci)),
            _GROUP,
            "ssd",
            topology.nnz_blocks,
            (),
        )
        # _batch_items keys by unique out id = block ROW here.
        return sched.out_ids, sched.dep_ids, sched.flags, sched.group, sched.n_steps
    nnz = topology.nnz_blocks
    return ri, ci, jnp.ones((nnz,), jnp.int32), 1, nnz


def _forward(q, k, v, topology: BlockSparseMatrix, scale, causal, interpret):
    bs = topology.block_size
    t, dh = q.shape
    rows, cols, flags, group, n_steps = _plan(topology)

    def k_map(g):
        return lambda j, rows_, cols_, fl_: (cols_[j * group + g], 0)

    in_specs = [pl.BlockSpec((bs, dh), lambda j, rows_, cols_, fl_: (rows_[j], 0))]
    in_specs += [pl.BlockSpec((bs, dh), k_map(g)) for g in range(group)]
    in_specs += [pl.BlockSpec((bs, dh), k_map(g)) for g in range(group)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bs, dh), lambda j, rows_, cols_, fl_: (rows_[j], 0)),
        scratch_shapes=[
            pltpu.VMEM((bs, dh), jnp.float32),
            pltpu.VMEM((bs, 128), jnp.float32),
            pltpu.VMEM((bs, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, group=group, n_steps=n_steps, bs=bs, scale=scale,
            causal=causal,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, dh), q.dtype),
        compiler_params=compiler_params(("arbitrary",)),
        interpret=interpret,
    )(rows, cols, flags, q, *([k] * group), *([v] * group))
    # Rows with no topology blocks never get written: zero them.
    return _zero_empty_rows(out, topology)


def _zero_empty_rows(out, topology: BlockSparseMatrix):
    offs = topology.offsets
    if not isinstance(offs, jax.core.Tracer):
        counts = np.asarray(offs)
        if (counts[1:] - counts[:-1] > 0).all():
            return out
    mask = (offs[1:] - offs[:-1]) > 0
    mask = jnp.repeat(mask, topology.block_size)
    return jnp.where(mask[:, None], out, jnp.zeros([], out.dtype))


def flash_block_attention(
    q: jax.Array,  # (T, dh)
    k: jax.Array,
    v: jax.Array,
    topology: BlockSparseMatrix,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jax.Array:
    """Fused single-head block-sparse attention (O(T * dh) memory).

    Semantics match ``models.attention.block_sparse_attention`` (absent
    blocks = -inf; stored zero blocks participate only as pattern).

    The custom VJP closes over the topology: passing the metadata pytree
    through ``jax.custom_vjp`` arguments measurably de-optimizes the primal
    (2.4x on v5e — the call boundary stops the scalar-prefetch arrays from
    folding), and the topology carries no gradient anyway (it is a
    pattern). Backward recomputes through the unfused sparse chain — the
    standard flash trade: residuals are just the inputs.
    """
    if scale is None:
        scale = 1.0 / float(np.sqrt(q.shape[-1]))
    scale = float(scale)
    causal = bool(causal)
    if topology.nnz_blocks == 0:
        return jnp.zeros_like(q)

    @jax.custom_vjp
    def _flash(q_, k_, v_):
        return _forward(q_, k_, v_, topology, scale, causal, use_interpret())

    def _fwd(q_, k_, v_):
        return _flash(q_, k_, v_), (q_, k_, v_)

    def _bwd(res, g):
        q_, k_, v_ = res
        from sputnik_tpu import ops as _ops
        from sputnik_tpu.ops.softmax import bsr_softmax

        def unfused(q2, k2, v2):
            scores = _ops.sdd(q2, k2, topology, transpose_b=True)
            probs = bsr_softmax(scores, scale=scale, causal=causal)
            return _ops.dsd(probs, v2, out_dtype=q2.dtype)

        _, vjp = jax.vjp(unfused, q_, k_, v_)
        return vjp(g)

    _flash.defvjp(_fwd, _bwd)
    return _flash(q, k, v)
