"""Multi-head fused block-sparse flash attention: head axis IN THE GRID
and TWO query row-blocks per step.

Round-2 shipped single-head flash (``flash_attention.py``) and vmapped it
over heads. This module is the round-3 rework:

  * the head dimension is grid dim 0 — one compiled kernel walks all
    heads with ("parallel", "arbitrary") semantics, no vmap batching rule
    in the way;
  * each step owns a PAIR of query row-blocks (a (2*bs, dh) q tile) and
    streams the UNION of the two rows' topology columns: adjacent rows of
    banded/causal topologies share almost all their columns, so the K/V
    bytes per score nearly halve (the kernel is bandwidth-bound — audit
    0.40 of SoL in round 2). Per-row membership is carried as two flag
    planes from the host plan; the causal triangle masks per half via the
    row-id vector.

Backward mirrors ``flash_attention._backward`` (flash-2 dQ + dK/dV
kernels, LSE residuals) with the head axis in the grid.

Reference anchor: the sparse-output decomposition one-program-per-block
(``/root/reference/sputnik/block/cutlass/kernel.h:86-90``) ridden in
row-PAIR-major order with an accumulator.
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
from sputnik_tpu.kernels.common import compiler_params, use_interpret
from sputnik_tpu.kernels.flash_attention import (
    _NEG_INF,
    _POS_BIG,
    _keep_mask,
    _plan,
    _plan_t,
)

__all__ = ["flash_mha", "plan_pairs"]

_GROUP = 4


def plan_pairs(topology: BlockSparseMatrix, group: int = _GROUP,
               rows_per_step: int = 2):
    """Row-group work plan: for each run of ``rows_per_step`` adjacent query
    block-rows, the UNION of the rows' topology columns, with per-row
    membership carried as a BITMASK per item (bit r = row ``step*R + r``
    holds this column). Concrete metadata only.

    ``rows_per_step`` is the round-4 MXU-shape-law lever: the score dot
    streams ``R*bs`` query rows per MXU fill, so R=4 issues (512, dh, ...)
    dots where R=2 issued (256, dh, ...) ones (``docs/mxu_probe.json``:
    bm >= 512 is where >= 0.8-of-peak dot shapes live)."""
    R = rows_per_step
    ri = np.asarray(topology.row_indices, np.int64)
    ci = np.asarray(topology.indices, np.int64)
    nb = topology.cols // topology.block_size
    keys = (ri // R) * nb + ci
    uniq = np.unique(keys)
    pairs_u = (uniq // nb).astype(np.int32)
    cols_u = (uniq % nb).astype(np.int32)
    fbits = np.zeros(len(uniq), np.int32)
    for r in range(R):
        fbits |= np.isin(uniq, np.unique(keys[ri % R == r])).astype(
            np.int32
        ) << r
    # Pure-numpy batching (same shape as bsr_flat._batch_items, whose jnp
    # outputs become TRACERS when the plan runs at trace time inside jit —
    # np.asarray on them then throws even for concrete topologies).
    uniq_p, counts = np.unique(pairs_u, return_counts=True)
    total = len(pairs_u)
    avg = total / max(len(uniq_p), 1)
    group = max(1, min(group, int(round(avg))))
    padded = (-(-counts // group)) * group
    total_p = int(padded.sum())
    cum_items = np.concatenate([[0], np.cumsum(counts)[:-1]])
    cum_p = np.concatenate([[0], np.cumsum(padded)[:-1]])
    local = np.arange(total_p, dtype=np.int64) - np.repeat(cum_p, padded)
    orig_local = np.minimum(local, np.repeat(counts, padded) - 1)
    item = np.repeat(cum_items, padded) + orig_local
    flags = (local < np.repeat(counts, padded)).astype(np.int32)
    step_out = np.repeat(uniq_p, padded // group).astype(np.int32)
    # Group padding duplicates the run's last item with bitmask 0, so
    # padded items mask fully.
    return (
        jnp.asarray(step_out),
        jnp.asarray(cols_u[item].astype(np.int32)),
        jnp.asarray(fbits[item] * flags),
        group,
        len(step_out),
    )


def _fwd_kernel(
    steps, cols, fbits, *refs,
    group: int, n_steps: int, bs: int, R: int, scale: float, causal: bool,
    with_lse: bool,
):
    q_ref = refs[0]
    k_refs = refs[1 : 1 + group]
    v_refs = refs[1 + group : 1 + 2 * group]
    out_ref = refs[1 + 2 * group]
    lse_ref = refs[2 + 2 * group] if with_lse else None
    acc_ref, m_ref, l_ref = refs[(3 if with_lse else 2) + 2 * group :]
    j = pl.program_id(1)
    cur = steps[j]
    prev = steps[jnp.maximum(j - 1, 0)]
    nxt = steps[jnp.minimum(j + 1, n_steps - 1)]
    is_first = jnp.logical_or(j == 0, prev != cur)
    is_last = jnp.logical_or(j == n_steps - 1, nxt != cur)

    @pl.when(is_first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (R * bs, bs), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (R * bs, bs), 1)
    sub = r_iota // bs  # which of the R rows this lane belongs to
    row_vec = cur * R + sub  # block-row id per lane
    r_local = r_iota - sub * bs
    # ONE score dot for the whole strip: (R*bs, dh) @ (dh, group*bs).
    # The round-4 MXU shape law (docs/mxu_probe.json): one wide dot beats
    # `group` narrow (R*bs, dh, bs) dots — the array streams R*bs rows per
    # fill either way, but bn = group*bs amortizes the weight-load better.
    k_strip = (
        jnp.concatenate([k_refs[g][0] for g in range(group)], axis=0)
        if group > 1 else k_refs[0][0]
    )  # (group*bs, dh)
    s_all = jax.lax.dot_general(
        q_ref[0], k_strip, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (R*bs, group*bs)
    keeps = []
    for g in range(group):
        c = cols[j * group + g]
        # Bit r of the item's mask says row cur*R + r holds this column.
        valid = jnp.bitwise_and(
            jnp.right_shift(fbits[j * group + g], sub), 1
        ) > 0
        if causal:
            keep = jnp.logical_or(
                row_vec > c,
                jnp.logical_and(row_vec == c, r_local >= c_iota),
            )
            keep = jnp.logical_and(keep, valid)
        else:
            keep = valid
        keeps.append(keep)
    keep_strip = jnp.concatenate(keeps, axis=1) if group > 1 else keeps[0]
    s_strip = jnp.where(keep_strip, s_all, _NEG_INF)

    m_prev = m_ref[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s_strip, axis=1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(s_strip - m_new)
    p = jnp.where(s_strip > 0.5 * _NEG_INF, p, 0.0)
    l_ref[:, 0:1] = l_ref[:, 0:1] * corr + jnp.sum(p, axis=1, keepdims=True)
    v_strip = (
        jnp.concatenate([v_refs[g][0] for g in range(group)], axis=0)
        if group > 1
        else v_refs[0][0]
    )
    pv = jax.lax.dot_general(
        p.astype(v_strip.dtype),
        v_strip,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * corr + pv
    m_ref[:, 0:1] = m_new

    @pl.when(is_last)
    def _():
        denom = jnp.maximum(l_ref[:, 0:1], 1e-30)
        out_ref[0] = (acc_ref[:] / denom).astype(out_ref.dtype)
        if with_lse:
            l_val = l_ref[:, 0:1]
            lse = jnp.where(
                l_val > 0.0,
                m_ref[:, 0:1] + jnp.log(jnp.maximum(l_val, 1e-30)),
                _POS_BIG,
            )
            lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _zero_empty_rows_mha(out, topology: BlockSparseMatrix):
    offs = topology.offsets
    if not isinstance(offs, jax.core.Tracer):
        counts = np.asarray(offs)
        if (counts[1:] - counts[:-1] > 0).all():
            return out
    mask = (offs[1:] - offs[:-1]) > 0
    mask = jnp.repeat(mask, topology.block_size)
    return jnp.where(mask[None, :, None], out, jnp.zeros([], out.dtype))


def _forward(q, k, v, topology, scale, causal, interpret, with_lse=False,
             group: int = _GROUP, rows_per_step: int = 2):
    h, t, dh = q.shape
    bs = topology.block_size
    R = rows_per_step
    steps, cols, fbits, group, n_steps = plan_pairs(
        topology, group=group, rows_per_step=R
    )

    def kv_map(g):
        return lambda hh, j, p_, c_, f_: (hh, c_[j * group + g], 0)

    step_map = lambda hh, j, p_, c_, f_: (hh, p_[j], 0)
    in_specs = [pl.BlockSpec((1, R * bs, dh), step_map)]
    in_specs += [pl.BlockSpec((1, bs, dh), kv_map(g)) for g in range(group)]
    in_specs += [pl.BlockSpec((1, bs, dh), kv_map(g)) for g in range(group)]
    out_specs = pl.BlockSpec((1, R * bs, dh), step_map)
    out_shape = jax.ShapeDtypeStruct((h, t, dh), q.dtype)
    if with_lse:
        out_specs = (out_specs, pl.BlockSpec((1, R * bs, 128), step_map))
        out_shape = (out_shape, jax.ShapeDtypeStruct((h, t, 128), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(h, n_steps),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((R * bs, dh), jnp.float32),
            pltpu.VMEM((R * bs, 128), jnp.float32),
            pltpu.VMEM((R * bs, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, group=group, n_steps=n_steps, bs=bs, R=R,
            scale=scale, causal=causal, with_lse=with_lse,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=compiler_params(("parallel", "arbitrary")),
        interpret=interpret,
    )(steps, cols, fbits, q, *([k] * group), *([v] * group))
    if with_lse:
        return _zero_empty_rows_mha(out[0], topology), out[1]
    return _zero_empty_rows_mha(out, topology)


# ---------------------------------------------------------------------------
# Backward: flash-2 dQ (row-major plan) + dK/dV (column-major plan) with
# the head axis as grid dim 0. Bodies mirror flash_attention._dq_kernel /
# _dkv_kernel with the leading head dim stripped off each ref.
# ---------------------------------------------------------------------------


def _dq_kernel(
    rows, cols, flags, *refs,
    group: int, n_steps: int, bs: int, scale: float, causal: bool,
):
    q_ref, do_ref, lse_ref, dvec_ref = refs[:4]
    k_refs = refs[4 : 4 + group]
    v_refs = refs[4 + group : 4 + 2 * group]
    dq_ref = refs[4 + 2 * group]
    acc_ref = refs[5 + 2 * group]
    j = pl.program_id(1)
    cur = rows[j]
    prev = rows[jnp.maximum(j - 1, 0)]
    nxt = rows[jnp.minimum(j + 1, n_steps - 1)]
    is_first = jnp.logical_or(j == 0, prev != cur)
    is_last = jnp.logical_or(j == n_steps - 1, nxt != cur)

    @pl.when(is_first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    k_strip = (
        jnp.concatenate([k_refs[g][0] for g in range(group)], axis=0)
        if group > 1 else k_refs[0][0]
    )
    v_strip = (
        jnp.concatenate([v_refs[g][0] for g in range(group)], axis=0)
        if group > 1 else v_refs[0][0]
    )
    s = jax.lax.dot_general(
        q_ref[0], k_strip, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    keeps = [
        _keep_mask(rows[j], cols[j * group + g], flags[j * group + g] > 0,
                   bs, causal)
        for g in range(group)
    ]
    keep_strip = jnp.concatenate(keeps, axis=1) if group > 1 else keeps[0]
    lse = lse_ref[0][:, 0:1]
    p = jnp.where(keep_strip, jnp.exp(s - lse), 0.0)
    dp = jax.lax.dot_general(
        do_ref[0].astype(jnp.float32), v_strip.astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dvec_ref[0][:, 0:1])
    acc_ref[:] += jax.lax.dot_general(
        ds.astype(k_strip.dtype), k_strip, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(is_last)
    def _():
        dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


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
    j = pl.program_id(1)
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
        jnp.concatenate([q_refs[g][0] for g in range(group)], axis=0)
        if group > 1 else q_refs[0][0]
    )
    do_strip = (
        jnp.concatenate([do_refs[g][0] for g in range(group)], axis=0)
        if group > 1 else do_refs[0][0]
    )
    lse_strip = (
        jnp.concatenate([lse_refs[g][0][:, 0:1] for g in range(group)], axis=0)
        if group > 1 else lse_refs[0][0][:, 0:1]
    )
    dvec_strip = (
        jnp.concatenate([dvec_refs[g][0][:, 0:1] for g in range(group)], axis=0)
        if group > 1 else dvec_refs[0][0][:, 0:1]
    )
    s = jax.lax.dot_general(
        q_strip, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    keeps = [
        _keep_mask(rows[j * group + g], cols[j], flags[j * group + g] > 0,
                   bs, causal)
        for g in range(group)
    ]
    keep_strip = jnp.concatenate(keeps, axis=0) if group > 1 else keeps[0]
    p = jnp.where(keep_strip, jnp.exp(s - lse_strip), 0.0)
    dp = jax.lax.dot_general(
        do_strip.astype(jnp.float32), v_ref[0].astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dvec_strip)
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
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _zero_empty_groups_mha(out, offs, bs: int):
    if not isinstance(offs, jax.core.Tracer):
        counts = np.asarray(offs)
        if (counts[1:] - counts[:-1] > 0).all():
            return out
    mask = (offs[1:] - offs[:-1]) > 0
    mask = jnp.repeat(mask, bs)
    return jnp.where(mask[None, :, None], out, jnp.zeros([], out.dtype))


def _backward(q, k, v, out, lse, g, topology, scale, causal, interpret):
    h, t, dh = q.shape
    bs = topology.block_size
    tk = k.shape[1]
    dvec = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True
    )  # (h, t, 1)
    dvec = jnp.broadcast_to(dvec, (h, t, 128))

    rows, cols, flags, group, n_steps = _plan(topology)
    row_map = lambda hh, j, rows_, cols_, fl_: (hh, rows_[j], 0)

    def col_map(gg):
        return lambda hh, j, rows_, cols_, fl_: (hh, cols_[j * group + gg], 0)

    in_specs = [pl.BlockSpec((1, bs, dh), row_map),
                pl.BlockSpec((1, bs, dh), row_map),
                pl.BlockSpec((1, bs, 128), row_map),
                pl.BlockSpec((1, bs, 128), row_map)]
    in_specs += [pl.BlockSpec((1, bs, dh), col_map(gg)) for gg in range(group)]
    in_specs += [pl.BlockSpec((1, bs, dh), col_map(gg)) for gg in range(group)]
    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, group=group, n_steps=n_steps, bs=bs, scale=scale,
            causal=causal,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(h, n_steps),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bs, dh), row_map),
            scratch_shapes=[pltpu.VMEM((bs, dh), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((h, t, dh), q.dtype),
        compiler_params=compiler_params(("parallel", "arbitrary")),
        interpret=interpret,
    )(rows, cols, flags, q, g, lse, dvec, *([k] * group), *([v] * group))
    dq = _zero_empty_rows_mha(dq, topology)

    topo_t = topology.with_transpose_metadata()
    cols_t, rows_t, flags_t, group_t, n_steps_t = _plan_t(topo_t)
    colstep_map = lambda hh, j, cols_, rows_, fl_: (hh, cols_[j], 0)

    def row_map_t(gg):
        return lambda hh, j, cols_, rows_, fl_: (hh, rows_[j * group_t + gg], 0)

    in_specs_t = [pl.BlockSpec((1, bs, dh), colstep_map),
                  pl.BlockSpec((1, bs, dh), colstep_map)]
    in_specs_t += [pl.BlockSpec((1, bs, dh), row_map_t(gg)) for gg in range(group_t)]
    in_specs_t += [pl.BlockSpec((1, bs, dh), row_map_t(gg)) for gg in range(group_t)]
    in_specs_t += [pl.BlockSpec((1, bs, 128), row_map_t(gg)) for gg in range(group_t)]
    in_specs_t += [pl.BlockSpec((1, bs, 128), row_map_t(gg)) for gg in range(group_t)]
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, group=group_t, n_steps=n_steps_t, bs=bs,
            scale=scale, causal=causal,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(h, n_steps_t),
            in_specs=in_specs_t,
            out_specs=(pl.BlockSpec((1, bs, dh), colstep_map),
                       pl.BlockSpec((1, bs, dh), colstep_map)),
            scratch_shapes=[pltpu.VMEM((bs, dh), jnp.float32),
                            pltpu.VMEM((bs, dh), jnp.float32)],
        ),
        out_shape=(jax.ShapeDtypeStruct((h, tk, dh), k.dtype),
                   jax.ShapeDtypeStruct((h, tk, dh), v.dtype)),
        compiler_params=compiler_params(("parallel", "arbitrary")),
        interpret=interpret,
    )(cols_t, rows_t, flags_t, k, v, *([q] * group_t), *([g] * group_t),
      *([lse] * group_t), *([dvec] * group_t))
    offs_t = topo_t.offsets_t
    dk = _zero_empty_groups_mha(dk, offs_t, bs)
    dv = _zero_empty_groups_mha(dv, offs_t, bs)
    return dq, dk, dv


def flash_mha(
    q: jax.Array,  # (H, T, dh)
    k: jax.Array,
    v: jax.Array,
    topology: BlockSparseMatrix,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
    group: int = 8,
    rows_per_step: Optional[int] = None,
) -> jax.Array:
    """Fused multi-head block-sparse attention, head axis in the grid.

    Requires concrete topology metadata (host pair plan) and a number of
    query block rows divisible by ``rows_per_step``; ``models.attention.
    multihead_block_sparse_attention`` falls back to the vmapped
    single-head kernel otherwise. Semantics match the single-head
    ``flash_block_attention`` per head.

    ``rows_per_step`` / ``group``: the forward strip shape — each grid step
    owns ``rows_per_step`` query block-rows and streams ``group`` union
    columns, issuing one (rows_per_step*bs, dh, group*bs) score dot
    (``bench.flash_sweep`` measures the grid of both; (8, 8) won the
    round-5 sweep at T=2048 — 130.2 us / 0.57 vs the old (2, 4)
    default's 154.5 / 0.48, train step 0.864 of SoL — exactly the MXU
    shape law's prediction: bm = rows*bs and bn = group*bs drive per-dot
    efficiency, and they must grow TOGETHER: r8_g2 collapses to 0.21).
    ``rows_per_step=None`` picks the largest of 8/4/2/1 that divides the
    query block-row count.
    """
    if scale is None:
        scale = 1.0 / float(np.sqrt(q.shape[-1]))
    scale = float(scale)
    causal = bool(causal)
    n_rows = topology.rows // topology.block_size
    if rows_per_step is None:
        rows_per_step = next(
            (r for r in (8, 4, 2) if n_rows % r == 0), 1
        )
    R = int(rows_per_step)
    if R < 1 or R > 8:
        raise ValueError(f"rows_per_step must be in 1..8, got {R}")
    if topology.nnz_blocks == 0:
        return jnp.zeros_like(q)
    if (topology.rows // topology.block_size) % R:
        raise ValueError(
            f"flash_mha needs query block rows divisible by "
            f"rows_per_step={R}"
        )

    @jax.custom_vjp
    def _flash(q_, k_, v_):
        return _forward(q_, k_, v_, topology, scale, causal, use_interpret(),
                        group=group, rows_per_step=R)

    def _fwd(q_, k_, v_):
        out, lse = _forward(
            q_, k_, v_, topology, scale, causal, use_interpret(),
            with_lse=True, group=group, rows_per_step=R,
        )
        return out, (q_, k_, v_, out, lse)

    def _bwd(res, g):
        q_, k_, v_, out, lse = res
        return _backward(
            q_, k_, v_, out, lse, g, topology, scale, causal, use_interpret()
        )

    _flash.defvjp(_fwd, _bwd)
    return _flash(q, k, v)
