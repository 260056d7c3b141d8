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

__all__ = ["flash_block_attention", "flash_band_fold", "sdd_softmax_fused"]

_NEG_INF = -1e30


_POS_BIG = 1e30  # lse sentinel for rows with zero mass: exp(s - BIG) = 0


def _kernel(
    # scalar prefetch
    rows,  # (n_steps,) block-row id per step (non-decreasing)
    cols,  # (n_steps * group,) block-col id per sub-item
    flags,  # (n_steps * group,) 1 = real work, 0 = group padding
    *refs,  # q_ref, group k refs, group v refs, out_ref[, lse_ref], acc, m, l
    group: int,
    n_steps: int,
    bs: int,
    scale: float,
    causal: bool,
    with_lse: bool = False,
):
    q_ref = refs[0]
    k_refs = refs[1 : 1 + group]
    v_refs = refs[1 + group : 1 + 2 * group]
    out_ref = refs[1 + 2 * group]
    lse_ref = refs[2 + 2 * group] if with_lse else None
    acc_ref, m_ref, l_ref = refs[(3 if with_lse else 2) + 2 * group :]
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

    # Build the (bs, group*bs) score STRIP with ONE MXU dot against the
    # concatenated K blocks (round-4 shape law: bn = group*bs amortizes
    # the array's weight-load where `group` narrow (bs, dh, bs) dots each
    # pay it), then a SINGLE online-softmax update for the whole strip —
    # the exp/rescale VPU work (~500 ns per block vs ~40 ns of MXU)
    # amortizes over the group. Measured 2.4x vs per-block.
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
    k_strip = (
        jnp.concatenate([k_refs[g][:] for g in range(group)], axis=0)
        if group > 1 else k_refs[0][:]
    )  # (group*bs, dh)
    s_all = jax.lax.dot_general(
        q_ref[:], k_strip, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (bs, group*bs), f32 accumulate, native-dtype MXU inputs
    keeps = []
    for g in range(group):
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
        keeps.append(keep)
    keep_strip = jnp.concatenate(keeps, axis=1) if group > 1 else keeps[0]
    s_strip = jnp.where(keep_strip, s_all, _NEG_INF)

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
        if with_lse:
            l_val = l_ref[:, 0:1]
            lse = jnp.where(
                l_val > 0.0,
                m_ref[:, 0:1] + jnp.log(jnp.maximum(l_val, 1e-30)),
                _POS_BIG,  # zero-mass row: backward p = exp(s - BIG) = 0
            )
            lse_ref[:] = jnp.broadcast_to(lse, lse_ref.shape)


_GROUP = 4


def _plan(topology: BlockSparseMatrix, group: int = None):
    """(step rows, sub-item cols, flags, group, n_steps) — batched when the
    metadata is concrete, one item per step when traced."""
    group = _GROUP if group is None else group
    ri, ci = topology.row_indices, topology.indices
    if not (isinstance(ri, jax.core.Tracer) or isinstance(ci, jax.core.Tracer)):
        sched = _batch_items(
            np.asarray(ri),
            (np.asarray(ci), np.asarray(ci), np.asarray(ci)),
            group,
            "ssd",
            topology.nnz_blocks,
            (),
        )
        # _batch_items keys by unique out id = block ROW here.
        return sched.out_ids, sched.dep_ids, sched.flags, sched.group, sched.n_steps
    nnz = topology.nnz_blocks
    return ri, ci, jnp.ones((nnz,), jnp.int32), 1, nnz


def _forward(q, k, v, topology: BlockSparseMatrix, scale, causal, interpret,
             with_lse: bool = False, group: int = None):
    bs = topology.block_size
    t, dh = q.shape
    rows, cols, flags, group, n_steps = _plan(topology, group)

    def k_map(g):
        return lambda j, rows_, cols_, fl_: (cols_[j * group + g], 0)

    row_map = lambda j, rows_, cols_, fl_: (rows_[j], 0)
    in_specs = [pl.BlockSpec((bs, dh), row_map)]
    in_specs += [pl.BlockSpec((bs, dh), k_map(g)) for g in range(group)]
    in_specs += [pl.BlockSpec((bs, dh), k_map(g)) for g in range(group)]
    out_specs = pl.BlockSpec((bs, dh), row_map)
    out_shape = jax.ShapeDtypeStruct((t, dh), q.dtype)
    if with_lse:
        out_specs = (out_specs, pl.BlockSpec((bs, 128), row_map))
        out_shape = (out_shape, jax.ShapeDtypeStruct((t, 128), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((bs, dh), jnp.float32),
            pltpu.VMEM((bs, 128), jnp.float32),
            pltpu.VMEM((bs, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, group=group, n_steps=n_steps, bs=bs, scale=scale,
            causal=causal, with_lse=with_lse,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=compiler_params(("arbitrary",)),
        interpret=interpret,
    )(rows, cols, flags, q, *([k] * group), *([v] * group))
    # Rows with no topology blocks never get written: zero them.
    if with_lse:
        return _zero_empty_rows(out[0], topology), out[1]
    return _zero_empty_rows(out, topology)


def _zero_empty_groups(out, offs, bs: int):
    if not isinstance(offs, jax.core.Tracer):
        counts = np.asarray(offs)
        if (counts[1:] - counts[:-1] > 0).all():
            return out
    mask = (offs[1:] - offs[:-1]) > 0
    mask = jnp.repeat(mask, bs)
    return jnp.where(mask[:, None], out, jnp.zeros([], out.dtype))


def _zero_empty_rows(out, topology: BlockSparseMatrix):
    return _zero_empty_groups(out, topology.offsets, topology.block_size)


def _keep_mask(row_id, col_id, valid, bs: int, causal: bool):
    """(bs, bs) boolean keep mask for one topology block (True = real
    score). Mirrors the forward strip masking: causal keeps the lower
    triangle on diagonal blocks and whole blocks below the diagonal;
    ``valid`` masks group-padding duplicates. Boolean and/or algebra only
    (Mosaic cannot legalize arith.select on i1 vectors)."""
    if not causal:
        return jnp.logical_and(jnp.ones((bs, bs), bool), valid)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
    on_diag = row_id == col_id
    below = row_id > col_id
    keep = jnp.logical_or(
        jnp.logical_and(on_diag, r_iota >= c_iota),
        jnp.logical_and(jnp.logical_not(on_diag), below),
    )
    return jnp.logical_and(keep, valid)


def _sdd_softmax_kernel(
    rows,  # (n_steps,) block-row id per step (non-decreasing)
    cols,  # (n_steps * group,)
    flags,  # (n_steps * group,)
    q_ref, *refs,
    group: int,
    n_steps: int,
    bs: int,
    scale: float,
    causal: bool,
):
    k_refs = refs[:group]
    s_out = refs[group]        # (group, bs, bs) raw scaled+masked scores
    m_out = refs[group + 1]    # (bs, 128) row max (written on row end)
    l_out = refs[group + 2]    # (bs, 128) row sum of exp(s - m)
    m_ref, l_ref = refs[group + 3 :]
    j = pl.program_id(0)
    cur = rows[j]
    prev = rows[jnp.maximum(j - 1, 0)]
    nxt = rows[jnp.minimum(j + 1, n_steps - 1)]
    is_first = jnp.logical_or(j == 0, prev != cur)
    is_last = jnp.logical_or(j == n_steps - 1, nxt != cur)

    @pl.when(is_first)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    strip = []
    for g in range(group):
        s = jax.lax.dot_general(
            q_ref[:], k_refs[g][:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        keep = _keep_mask(rows[j], cols[j * group + g],
                          flags[j * group + g] > 0, bs, causal)
        s = jnp.where(keep, s, _NEG_INF)
        s_out[g] = s.astype(s_out.dtype)
        strip.append(s)
    s_strip = jnp.concatenate(strip, axis=1) if group > 1 else strip[0]
    m_prev = m_ref[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s_strip, axis=1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(s_strip - m_new)
    p = jnp.where(s_strip > 0.5 * _NEG_INF, p, 0.0)
    l_ref[:, 0:1] = l_ref[:, 0:1] * corr + jnp.sum(p, axis=1, keepdims=True)
    m_ref[:, 0:1] = m_new

    @pl.when(is_last)
    def _():
        m_out[:] = jnp.broadcast_to(m_ref[:, 0:1], m_out.shape)
        l_out[:] = jnp.broadcast_to(l_ref[:, 0:1], l_out.shape)


def sdd_softmax_fused(
    q: jax.Array,  # (T, dh)
    k: jax.Array,  # (Tk, dh)
    topology: BlockSparseMatrix,
    *,
    scale: Optional[float] = None,
    causal: bool = False,
    out_dtype=None,
    interpret: bool | None = None,
) -> BlockSparseMatrix:
    """probs = softmax(scale * q @ k^T at topology) in ONE score pass.

    Fuses the reference's SDDMM -> SparseSoftmax chain: the kernel streams
    (q, k) block pairs once (the flash strip plan), writes the raw masked
    scores and per-row (max, sum) stats, and a fused XLA epilogue
    normalizes — the scores cross HBM twice instead of the unfused
    chain's four passes (SDD write + softmax max/exp reads + write).
    Semantics identical to ``bsr_softmax(matmul_sdd(q, k, topology,
    transpose_b=True), scale=scale, causal=causal)``.
    """
    interpret = use_interpret() if interpret is None else interpret
    # NOTE: unlike the attention entry points, None means NO scaling here —
    # matching bsr_softmax (ops.sdd_softmax documents this contract).
    scale = 1.0 if scale is None else float(scale)
    out_dtype = out_dtype or topology.dtype
    bs = topology.block_size
    t = q.shape[0]
    if topology.nnz_blocks == 0:
        return topology
    rows, cols, flags, group, n_steps = _plan(topology)
    dh = q.shape[1]

    def k_map(g):
        return lambda j, rows_, cols_, fl_: (cols_[j * group + g], 0)

    row_map = lambda j, rows_, cols_, fl_: (rows_[j], 0)
    in_specs = [pl.BlockSpec((bs, dh), row_map)]
    in_specs += [pl.BlockSpec((bs, dh), k_map(g)) for g in range(group)]
    scores_pad, m_stat, l_stat = pl.pallas_call(
        functools.partial(
            _sdd_softmax_kernel, group=group, n_steps=n_steps, bs=bs,
            scale=scale, causal=causal,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_steps,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((group, bs, bs),
                             lambda j, rows_, cols_, fl_: (j, 0, 0)),
                pl.BlockSpec((bs, 128), row_map),
                pl.BlockSpec((bs, 128), row_map),
            ),
            scratch_shapes=[
                pltpu.VMEM((bs, 128), jnp.float32),
                pltpu.VMEM((bs, 128), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_steps * group, bs, bs), jnp.float32),
            jax.ShapeDtypeStruct((t, 128), jnp.float32),
            jax.ShapeDtypeStruct((t, 128), jnp.float32),
        ),
        compiler_params=compiler_params(("arbitrary",)),
        interpret=interpret,
    )(rows, cols, flags, q, *([k] * group))

    # Normalize epilogue in fused XLA (one exp/divide pass over the padded
    # slots + one gather to packed positions). A round-3 Pallas epilogue
    # existed and measured fine standalone, but composing the pass-1 +
    # epilogue PAIR with ANY further ops in one executable reproducibly
    # faults the device (round-4 isolation: each pass chains fine alone,
    # the pair + the timing harness's perturbation ops does not — a
    # Mosaic-level producer/consumer bug we cannot fix from here). The
    # XLA epilogue costs the scores one extra HBM crossing and composes
    # safely; the kernel-pair variant can return when the toolchain moves.
    nnz = topology.nnz_blocks
    n_items = n_steps * group
    # Branch-free slot bookkeeping: under jit even a CONCRETE topology's
    # plan arrives as tracers (constants become DynamicJaxprTracer inside
    # the trace), and the old tracer-keyed branch assumed group == 1 —
    # its n_steps-long rows array was then indexed up to n_items by the
    # round-3 Pallas epilogue's scalar prefetch: out-of-bounds reads that
    # FAULTED the device whenever the traced composition ran (the round-4
    # fault isolation's root cause). The stable-argsort trick keeps the
    # real slots' packed order with a static output size.
    rows_items = jnp.repeat(jnp.asarray(rows), group,
                            total_repeat_length=n_items)
    fl = jnp.asarray(flags)
    keys = jnp.where(fl > 0, 0, n_items) + jnp.arange(n_items, dtype=jnp.int32)
    real_src = jnp.argsort(keys)[:nnz]

    m3 = m_stat[:, 0].reshape(t // bs, bs)  # per block-row stats
    l3 = l_stat[:, 0].reshape(t // bs, bs)
    m_sel = m3[rows_items][:, :, None]  # (n_items, bs, 1)
    l_sel = l3[rows_items][:, :, None]
    e = jnp.exp(scores_pad - m_sel)
    e = jnp.where(scores_pad > 0.5 * _NEG_INF, e, 0.0)
    probs_pad = (e / jnp.maximum(l_sel, 1e-30)).astype(out_dtype)
    return topology.with_data(jnp.take(probs_pad, real_src, axis=0))


def _fold_kernel(
    rows,  # (p,) band-local block-row per slot, non-decreasing
    cols,  # (p,) band-local block-col per slot
    flags,  # (p,) 1 = real slot, 0 = cell padding (duplicate of last real)
    offs,  # (2,) global block offsets: [row_offset, col_offset]
    q_ref, k_ref, v_ref, acc_in, m_in, l_in,
    acc_out, m_out, l_out,
    acc_ref, m_ref, l_ref,
    *,
    n_steps: int,
    bs: int,
    scale: float,
    causal: bool,
):
    """One ring-attention band fold: stream this band's topology slots into
    the online-softmax state (UNnormalized acc, m, l) — the fused flash
    kernel with state threading instead of final normalization. Causal
    masking uses GLOBAL block ids (band-local id + scalar-prefetched
    offset), so intra-block triangles land on the true global diagonal."""
    j = pl.program_id(0)
    cur = rows[j]
    prev = rows[jnp.maximum(j - 1, 0)]
    nxt = rows[jnp.minimum(j + 1, n_steps - 1)]
    is_first = jnp.logical_or(j == 0, prev != cur)
    is_last = jnp.logical_or(j == n_steps - 1, nxt != cur)

    @pl.when(is_first)
    def _():
        acc_ref[:] = acc_in[:].astype(jnp.float32)
        m_ref[:] = m_in[:].astype(jnp.float32)
        l_ref[:] = l_in[:].astype(jnp.float32)

    s = jax.lax.dot_general(
        q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    keep = _keep_mask(rows[j] + offs[0], cols[j] + offs[1], flags[j] > 0,
                      bs, causal)
    s = jnp.where(keep, s, _NEG_INF)
    m_prev = m_ref[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    p = jnp.where(s > 0.5 * _NEG_INF, p, 0.0)  # masked lanes stay zero
    l_ref[:, 0:1] = l_ref[:, 0:1] * corr + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * corr + pv
    m_ref[:, 0:1] = m_new

    @pl.when(is_last)
    def _():
        acc_out[:] = acc_ref[:]
        m_out[:] = m_ref[:]
        l_out[:] = l_ref[:]


def flash_band_fold(
    q: jax.Array,  # (t_local, dh)
    k: jax.Array,  # (band, dh)
    v: jax.Array,
    rows: jax.Array,  # (p,) band-local block-row ids (non-decreasing)
    cols: jax.Array,  # (p,) band-local block-col ids
    flags: jax.Array,  # (p,) int 1 = real slot
    state,  # (acc f32 (t, dh), m f32 (t, 128), l f32 (t, 128))
    *,
    bs: int,
    scale: float,
    causal: bool = False,
    row_offset_blocks=0,  # global block offset of this query band
    col_offset_blocks=0,  # global block offset of the held kv band
    interpret: bool | None = None,
):
    """Fold one K/V band into a flash online-softmax state (ring attention's
    inner step). Metadata may be traced (ring cells are selected by the
    traced ring index). Rows untouched by this band keep their input state.
    Finalize with ``acc / max(l, eps)``.
    """
    interpret = use_interpret() if interpret is None else interpret
    acc, m, l = state
    t, dh = q.shape
    p = rows.shape[0]
    offs = jnp.stack(
        [jnp.asarray(row_offset_blocks, jnp.int32),
         jnp.asarray(col_offset_blocks, jnp.int32)]
    )
    row_map = lambda j, rows_, cols_, fl_, off_: (rows_[j], 0)
    col_map = lambda j, rows_, cols_, fl_, off_: (cols_[j], 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(p,),
        in_specs=[
            pl.BlockSpec((bs, dh), row_map),
            pl.BlockSpec((bs, dh), col_map),
            pl.BlockSpec((bs, dh), col_map),
            pl.BlockSpec((bs, dh), row_map),
            pl.BlockSpec((bs, 128), row_map),
            pl.BlockSpec((bs, 128), row_map),
        ],
        out_specs=(
            pl.BlockSpec((bs, dh), row_map),
            pl.BlockSpec((bs, 128), row_map),
            pl.BlockSpec((bs, 128), row_map),
        ),
        scratch_shapes=[
            pltpu.VMEM((bs, dh), jnp.float32),
            pltpu.VMEM((bs, 128), jnp.float32),
            pltpu.VMEM((bs, 128), jnp.float32),
        ],
    )
    acc2, m2, l2 = pl.pallas_call(
        functools.partial(
            _fold_kernel, n_steps=p, bs=bs, scale=scale, causal=causal,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((t, dh), jnp.float32),
            jax.ShapeDtypeStruct((t, 128), jnp.float32),
            jax.ShapeDtypeStruct((t, 128), jnp.float32),
        ),
        compiler_params=compiler_params(("arbitrary",)),
        interpret=interpret,
    )(rows, cols, flags, offs, q, k, v, acc, m, l)
    # Band rows with no real slots keep their input state (the kernel never
    # visits them, or visits them only through an empty cell's zero rows).
    visited = (
        jnp.zeros((t // bs,), jnp.int32).at[rows].add(flags) > 0
    )
    sel = jnp.repeat(visited, bs)[:, None]
    acc2 = jnp.where(sel, acc2, acc)
    m2 = jnp.where(sel, m2, m)
    l2 = jnp.where(sel, l2, l)
    return acc2, m2, l2


# ---------------------------------------------------------------------------
# Fused backward (flash-2 decomposition): one kernel for dQ (row-major
# iteration, the forward's plan) and one for dK/dV (column-major iteration).
# Residuals are (q, k, v, out, lse); D = rowsum(dO * out) is one fused XLA
# elementwise+reduce. The sparse-output structure is the reference's
# one-program-per-nonzero-block decomposition (kernel.h:86-90) ridden in
# row order (dQ) and column order (dK/dV) with revisiting accumulators.
# ---------------------------------------------------------------------------


def _plan_t(topology: BlockSparseMatrix):
    """Column-major plan: (step cols, sub-item rows, flags, group, n_steps)."""
    ri, ci = topology.row_indices, topology.indices
    if not (isinstance(ri, jax.core.Tracer) or isinstance(ci, jax.core.Tracer)):
        r, c = np.asarray(ri), np.asarray(ci)
        order = np.lexsort((r, c))
        sched = _batch_items(
            c[order], (r[order], r[order], r[order]), _GROUP, "ssd",
            topology.nnz_blocks, (),
        )
        return sched.out_ids, sched.dep_ids, sched.flags, sched.group, sched.n_steps
    m = topology.with_transpose_metadata()
    t_cols = m.indices[m.block_offsets]  # sorted original col ids
    nnz = topology.nnz_blocks
    return t_cols, m.indices_t, jnp.ones((nnz,), jnp.int32), 1, nnz


def _dq_kernel(
    rows, cols, flags, *refs,
    group: int, n_steps: int, bs: int, scale: float, causal: bool,
):
    q_ref, do_ref, lse_ref, dvec_ref = refs[:4]
    k_refs = refs[4 : 4 + group]
    v_refs = refs[4 + group : 4 + 2 * group]
    dq_ref = refs[4 + 2 * group]
    acc_ref = refs[5 + 2 * group]
    j = pl.program_id(0)
    cur = rows[j]
    prev = rows[jnp.maximum(j - 1, 0)]
    nxt = rows[jnp.minimum(j + 1, n_steps - 1)]
    is_first = jnp.logical_or(j == 0, prev != cur)
    is_last = jnp.logical_or(j == n_steps - 1, nxt != cur)

    @pl.when(is_first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    k_strip = (
        jnp.concatenate([k_refs[g][:] for g in range(group)], axis=0)
        if group > 1 else k_refs[0][:]
    )  # (group*bs, dh)
    v_strip = (
        jnp.concatenate([v_refs[g][:] for g in range(group)], axis=0)
        if group > 1 else v_refs[0][:]
    )
    s = jax.lax.dot_general(
        q_ref[:], k_strip, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (bs, group*bs)
    keeps = [
        _keep_mask(rows[j], cols[j * group + g], flags[j * group + g] > 0,
                   bs, causal)
        for g in range(group)
    ]
    keep_strip = jnp.concatenate(keeps, axis=1) if group > 1 else keeps[0]
    lse = lse_ref[:, 0:1]
    # Mask AFTER the exp: masked lanes may overflow to inf (lse can be the
    # +BIG zero-mass sentinel) and the where discards them.
    p = jnp.where(keep_strip, jnp.exp(s - lse), 0.0)
    dp = jax.lax.dot_general(
        do_ref[:].astype(jnp.float32), v_strip.astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )  # (bs, group*bs)
    ds = p * (dp - dvec_ref[:, 0:1])
    acc_ref[:] += jax.lax.dot_general(
        ds.astype(k_strip.dtype), k_strip, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(is_last)
    def _():
        dq_ref[:] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _dkv_kernel(
    cols, rows, flags, *refs,
    group: int, n_steps: int, bs: int, scale: float, causal: bool,
):
    k_ref, v_ref = refs[:2]
    q_refs = refs[2 : 2 + group]
    do_refs = refs[2 + group : 2 + 2 * group]
    lse_refs = refs[2 + 2 * group : 2 + 3 * group]
    dvec_refs = refs[2 + 3 * group : 2 + 4 * group]
    dk_ref = refs[2 + 4 * group]
    dv_ref = refs[3 + 4 * group]
    dk_acc, dv_acc = refs[4 + 4 * group :]
    j = pl.program_id(0)
    cur = cols[j]
    prev = cols[jnp.maximum(j - 1, 0)]
    nxt = cols[jnp.minimum(j + 1, n_steps - 1)]
    is_first = jnp.logical_or(j == 0, prev != cur)
    is_last = jnp.logical_or(j == n_steps - 1, nxt != cur)

    @pl.when(is_first)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q_strip = (
        jnp.concatenate([q_refs[g][:] for g in range(group)], axis=0)
        if group > 1 else q_refs[0][:]
    )  # (group*bs, dh)
    do_strip = (
        jnp.concatenate([do_refs[g][:] for g in range(group)], axis=0)
        if group > 1 else do_refs[0][:]
    )
    lse_strip = (
        jnp.concatenate([lse_refs[g][:, 0:1] for g in range(group)], axis=0)
        if group > 1 else lse_refs[0][:, 0:1]
    )  # (group*bs, 1)
    dvec_strip = (
        jnp.concatenate([dvec_refs[g][:, 0:1] for g in range(group)], axis=0)
        if group > 1 else dvec_refs[0][:, 0:1]
    )
    s = jax.lax.dot_general(
        q_strip, k_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (group*bs, bs)
    keeps = [
        _keep_mask(rows[j * group + g], cols[j], flags[j * group + g] > 0,
                   bs, causal)
        for g in range(group)
    ]
    keep_strip = jnp.concatenate(keeps, axis=0) if group > 1 else keeps[0]
    p = jnp.where(keep_strip, jnp.exp(s - lse_strip), 0.0)
    dp = jax.lax.dot_general(
        do_strip.astype(jnp.float32), v_ref[:].astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )  # (group*bs, bs)
    ds = p * (dp - dvec_strip)
    # dV_j += P^T @ dO  ;  dK_j += scale * dS^T @ Q  (contract the strip axis)
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do_strip.dtype), do_strip, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q_strip.dtype), q_strip, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(is_last)
    def _():
        dk_ref[:] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[:] = dv_acc[:].astype(dv_ref.dtype)


def _backward(q, k, v, out, lse, g, topology: BlockSparseMatrix, scale,
              causal, interpret):
    bs = topology.block_size
    t, dh = q.shape
    tk = k.shape[0]
    dvec = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
                   keepdims=True)  # (t, 1)
    dvec = jnp.broadcast_to(dvec, (t, 128))

    # --- dQ: row-major iteration (the forward plan) ---
    rows, cols, flags, group, n_steps = _plan(topology)
    row_map = lambda j, rows_, cols_, fl_: (rows_[j], 0)

    def col_map(gg):
        return lambda j, rows_, cols_, fl_: (cols_[j * group + gg], 0)

    in_specs = [pl.BlockSpec((bs, dh), row_map),
                pl.BlockSpec((bs, dh), row_map),
                pl.BlockSpec((bs, 128), row_map),
                pl.BlockSpec((bs, 128), row_map)]
    in_specs += [pl.BlockSpec((bs, dh), col_map(gg)) for gg in range(group)]
    in_specs += [pl.BlockSpec((bs, dh), col_map(gg)) for gg in range(group)]
    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, group=group, n_steps=n_steps, bs=bs, scale=scale,
            causal=causal,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_steps,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bs, dh), row_map),
            scratch_shapes=[pltpu.VMEM((bs, dh), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((t, dh), q.dtype),
        compiler_params=compiler_params(("arbitrary",)),
        interpret=interpret,
    )(rows, cols, flags, q, g, lse, dvec, *([k] * group), *([v] * group))
    dq = _zero_empty_rows(dq, topology)

    # --- dK/dV: column-major iteration (transpose metadata built once,
    # shared by the plan and the empty-column zeroing below) ---
    topo_t = topology.with_transpose_metadata()
    cols_t, rows_t, flags_t, group_t, n_steps_t = _plan_t(topo_t)
    colstep_map = lambda j, cols_, rows_, fl_: (cols_[j], 0)

    def row_map_t(gg):
        return lambda j, cols_, rows_, fl_: (rows_[j * group_t + gg], 0)

    in_specs_t = [pl.BlockSpec((bs, dh), colstep_map),
                  pl.BlockSpec((bs, dh), colstep_map)]
    in_specs_t += [pl.BlockSpec((bs, dh), row_map_t(gg)) for gg in range(group_t)]
    in_specs_t += [pl.BlockSpec((bs, dh), row_map_t(gg)) for gg in range(group_t)]
    in_specs_t += [pl.BlockSpec((bs, 128), row_map_t(gg)) for gg in range(group_t)]
    in_specs_t += [pl.BlockSpec((bs, 128), row_map_t(gg)) for gg in range(group_t)]
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, group=group_t, n_steps=n_steps_t, bs=bs,
            scale=scale, causal=causal,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_steps_t,),
            in_specs=in_specs_t,
            out_specs=(pl.BlockSpec((bs, dh), colstep_map),
                       pl.BlockSpec((bs, dh), colstep_map)),
            scratch_shapes=[pltpu.VMEM((bs, dh), jnp.float32),
                            pltpu.VMEM((bs, dh), jnp.float32)],
        ),
        out_shape=(jax.ShapeDtypeStruct((tk, dh), k.dtype),
                   jax.ShapeDtypeStruct((tk, dh), v.dtype)),
        compiler_params=compiler_params(("arbitrary",)),
        interpret=interpret,
    )(cols_t, rows_t, flags_t, k, v, *([q] * group_t), *([g] * group_t),
      *([lse] * group_t), *([dvec] * group_t))
    # Columns with no topology blocks never get written: zero them.
    offs_t = topo_t.offsets_t
    dk = _zero_empty_groups(dk, offs_t, bs)
    dv = _zero_empty_groups(dv, offs_t, bs)
    return dq, dk, dv


def flash_block_attention(
    q: jax.Array,  # (T, dh)
    k: jax.Array,
    v: jax.Array,
    topology: BlockSparseMatrix,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
    fused_backward: bool = True,
    group: int = None,
) -> jax.Array:
    """Fused single-head block-sparse attention (O(T * dh) memory).

    ``group`` sets the k/v blocks folded per strip step (default 4; wider
    strips amortize the per-step softmax bookkeeping at the cost of
    group-padding duplicates on ragged rows).

    Semantics match ``models.attention.block_sparse_attention`` (absent
    blocks = -inf; stored zero blocks participate only as pattern).

    The custom VJP closes over the topology: passing the metadata pytree
    through ``jax.custom_vjp`` arguments measurably de-optimizes the primal
    (2.4x on v5e — the call boundary stops the scalar-prefetch arrays from
    folding), and the topology carries no gradient anyway (it is a
    pattern).

    Backward (default): two fused Pallas kernels — dQ over the forward's
    row-major strip plan and dK/dV over the column-major plan — the
    standard flash-2 decomposition; residuals are (q, k, v, out, lse).
    ``fused_backward=False`` recomputes through the unfused sparse chain
    instead (residuals are just the inputs).
    """
    if scale is None:
        scale = 1.0 / float(np.sqrt(q.shape[-1]))
    scale = float(scale)
    causal = bool(causal)
    if topology.nnz_blocks == 0:
        return jnp.zeros_like(q)

    @jax.custom_vjp
    def _flash(q_, k_, v_):
        return _forward(q_, k_, v_, topology, scale, causal, use_interpret(),
                        group=group)

    if fused_backward:

        def _fwd(q_, k_, v_):
            out, lse = _forward(
                q_, k_, v_, topology, scale, causal, use_interpret(),
                with_lse=True, group=group,
            )
            return out, (q_, k_, v_, out, lse)

        def _bwd(res, g):
            q_, k_, v_, out, lse = res
            return _backward(
                q_, k_, v_, out, lse, g, topology, scale, causal,
                use_interpret(),
            )

    else:

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
