"""Q-batched stream kernels: Q sparse blocks per grid step (DSD / DDS).

The plain stream kernel (``bsr_dsd.py``) pays the fixed Pallas per-grid-step
cost (~200-500 ns measured on v5e, see docs/PERFORMANCE.md) once per sparse
block: at d=4096 / 25% that is ~256 steps x ~270 ns = ~70 us on top of a
174 us MXU bound.  This variant processes ``q`` blocks of the SAME output
tile per step (q block specs + q dense-panel specs, q accumulating dots),
dividing the fixed per-step cost by q.

Schedule invariant: every output group's slot run is padded to a multiple
of q, so a grid step never straddles two output tiles — the first/last
flush logic stays per-step.  Padding slots are *fetch-free*: their block
and panel indices repeat the same spec lane's indices from the previous
step, so Mosaic's index-map-repeat elision skips the DMA, and their dots
are skipped via a per-step valid count.  With uniform rows (the reference
benchmark generator rounds nnz to uniform rows,
``sputnik/matrix_utils.h:244-284``) there is no padding at all.

The slot plan is built with static shapes only, so it works both with
concrete metadata (numpy, zero device work) and under ``jit`` with traced
metadata (jnp; the worst-case padded slot count is a static bound).

Reference analogue: the CUTLASS kernels amortize their per-tile metadata
cost over a 5-stage software pipeline per threadblock
(``block/cutlass/kernel.h:86-90``, ``default_block_gemm.h:58-61``); on TPU
the equivalent lever is fewer, fatter grid steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sputnik_tpu.formats import BlockSparseMatrix
from sputnik_tpu.kernels.bsr_dsd import _mask_empty_groups
from sputnik_tpu.kernels.common import (
    cdiv,
    compiler_params,
    dot_dims,
    pick_tile,
    use_interpret,
)

__all__ = ["dsd_q", "dds_q", "dds_ct", "dsd_bres", "dds_bres",
           "BRES_MAX_DENSE_BYTES"]


def _ffill_lane_np(vals, valid, q):
    """Forward-fill invalid slots from the same spec lane's previous step."""
    v = vals.reshape(-1, q)
    ok = valid.reshape(-1, q)
    idx = np.where(ok, np.arange(v.shape[0])[:, None], 0)
    ff = np.maximum.accumulate(idx, axis=0)
    return np.take_along_axis(v, ff, axis=0).reshape(-1)


def _ffill_lane_jnp(vals, valid, q):
    v = vals.reshape(-1, q)
    ok = valid.reshape(-1, q)
    idx = jnp.where(ok, jnp.arange(v.shape[0], dtype=jnp.int32)[:, None], 0)
    ff = jax.lax.cummax(idx, axis=0)
    return jnp.take_along_axis(v, ff, axis=0).reshape(-1)


def _plan(out_ids, dep_ids, data_ids, counts, q, *, concrete: bool):
    """Build the padded slot arrays.

    Returns (out_q, dep_q, data_q, nv, n_steps) where slot ``s`` of step
    ``j = s // q`` holds block ``data_q[s]`` contracting panel ``dep_q[s]``
    into output tile ``out_q[s]``; only the first ``nv[j]`` slots of each
    step are live.  ``n_steps`` is static.
    """
    xp = np if concrete else jnp
    counts = xp.asarray(counts, jnp.int32) if xp is jnp else np.asarray(counts)
    n_groups = counts.shape[0]
    nnz = out_ids.shape[0]
    if concrete:
        plen = -(-counts // q) * q
        starts = np.concatenate([np.zeros(1, counts.dtype), np.cumsum(plen)])
        total = int(starts[-1])
    else:
        plen = -(-counts // q) * q
        starts = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(plen).astype(jnp.int32)]
        )
        # Static worst case: every group padded by q-1, rounded up to q.
        total = -(-(nnz + n_groups * (q - 1)) // q) * q
    n_steps = max(total // q, 1)
    s = xp.arange(n_steps * q, dtype=xp.int32 if xp is jnp else np.int64)
    g = xp.clip(xp.searchsorted(starts, s, side="right") - 1, 0, n_groups - 1)
    w = s - starts[g]
    off = xp.concatenate(
        [
            (jnp.zeros(1, jnp.int32) if xp is jnp else np.zeros(1, np.int64)),
            xp.cumsum(counts),
        ]
    )
    valid = w < counts[g]
    src = xp.clip(off[g] + xp.minimum(w, counts[g] - 1), 0, nnz - 1)
    out_src = xp.asarray(out_ids)[src]
    dep_src = xp.asarray(dep_ids)[src]
    data_src = xp.asarray(data_ids)[src]
    # Output id: fill dead slots from the last live slot overall (keeps the
    # out index parked on the previous tile -> deferred-write elision).
    if concrete:
        idx = np.where(valid, np.arange(s.shape[0]), 0)
        ff = np.maximum.accumulate(idx)
        out_q = out_src[ff]
        dep_q = _ffill_lane_np(dep_src, valid, q)
        data_q = _ffill_lane_np(data_src, valid, q)
        nv = valid.reshape(-1, q).sum(1)
        to = lambda a: jnp.asarray(np.asarray(a, np.int32))
    else:
        idx = jnp.where(valid, jnp.arange(s.shape[0], dtype=jnp.int32), 0)
        ff = jax.lax.cummax(idx)
        out_q = out_src[ff]
        dep_q = _ffill_lane_jnp(dep_src, valid, q)
        data_q = _ffill_lane_jnp(data_src, valid, q)
        nv = valid.reshape(-1, q).sum(1)
        to = lambda a: jnp.asarray(a, jnp.int32)
    return to(out_q), to(dep_q), to(data_q), to(nv), n_steps


def _step_partial(block_refs, get_panel, *, q, n_valid, dims, block_first,
                  accum, acc_dtype=jnp.float32):
    """The q slots' fp32 partial sum for one step — kcat: ONE dot of
    contraction depth q*bs ([B0 B1] @ [P0; P1] = B0@P0 + B1@P1); value: q
    summed dots. Padding slots (qi >= n_valid) repeat real data and are
    masked by zeroing the cheap (bs, bs) block operand (shared by the
    q-stream and the dense-resident kernels — the masking subtlety lives
    in exactly one place)."""
    blocks, panels = [], []
    for qi in range(q):
        block = block_refs[qi][0]
        if q > 1:
            live = (qi < n_valid).astype(block.dtype)
            block = block * live
        blocks.append(block)
        panels.append(get_panel(qi))
    if accum == "kcat":
        lhs_parts, rhs_parts = (
            (blocks, panels) if block_first else (panels, blocks)
        )
        lhs = jnp.concatenate(lhs_parts, axis=dims[0][0][0])
        rhs = jnp.concatenate(rhs_parts, axis=dims[0][1][0])
        return jax.lax.dot_general(
            lhs, rhs, dims, preferred_element_type=acc_dtype
        )
    part = None
    for block, panel in zip(blocks, panels):
        lhs, rhs = (block, panel) if block_first else (panel, block)
        d = jax.lax.dot_general(
            lhs, rhs, dims, preferred_element_type=acc_dtype
        )
        part = d if part is None else part + d
    return part


def _qstream_kernel(
    out_q, dep_q, data_q, nv,  # scalar prefetch
    *refs,  # q block refs, q panel refs, out_ref, acc_ref
    n_steps: int,
    q: int,
    dims,
    block_first: bool,
    accum: str = "ref",
    acc_t: bool = False,
):
    del dep_q, data_q
    out_ref, acc_ref = refs[-2], refs[-1]
    j = pl.program_id(1)
    base = j * q
    cur = out_q[base]
    prev = out_q[jnp.maximum(base - 1, 0)]
    nxt = out_q[jnp.minimum(base + q, n_steps * q - 1)]
    is_first = jnp.logical_or(base == 0, prev != cur)
    is_last = jnp.logical_or(j == n_steps - 1, nxt != cur)

    n_valid = nv[j]
    if acc_t:
        # Transposed accumulate (round-4 dot-shape law, docs/mxu_probe.json):
        # the DDS output tile is (bm, bs) — a bs=128-wide dot result, the
        # shape Mosaic caps at ~0.35-0.5 of peak. Computing the TILE
        # TRANSPOSED flips each slot's dot to (bs, bs) @ (bs, bm) — the
        # (128-row, wide-streaming) shape that runs ~0.72 — at the cost of
        # ONE VPU transpose per output tile at flush.
        @pl.when(is_first)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        for qi in range(q):
            block_ref = refs[qi]
            panel_ref = refs[q + qi]

            @pl.when(qi < n_valid)
            def _(block_ref=block_ref, panel_ref=panel_ref):
                acc_ref[:] += jax.lax.dot_general(
                    block_ref[0], panel_ref[:], dims,
                    preferred_element_type=jnp.float32,
                )

        @pl.when(is_last)
        def _():
            out_ref[:] = acc_ref[:].T.astype(out_ref.dtype)

        return
    if accum in ("value", "kcat"):
        # One accumulator RMW per STEP.
        part = _step_partial(
            refs[:q], lambda qi: refs[q + qi][:], q=q, n_valid=n_valid,
            dims=dims, block_first=block_first, accum=accum,
        )

        @pl.when(is_first)
        def _():
            acc_ref[:] = part

        @pl.when(jnp.logical_not(is_first))
        def _():
            acc_ref[:] += part
    else:
        @pl.when(is_first)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        for qi in range(q):
            block_ref = refs[qi]
            panel_ref = refs[q + qi]

            @pl.when(qi < n_valid)
            def _(block_ref=block_ref, panel_ref=panel_ref):
                block = block_ref[0]
                panel = panel_ref[:]
                lhs, rhs = (block, panel) if block_first else (panel, block)
                acc_ref[:] += jax.lax.dot_general(
                    lhs, rhs, dims, preferred_element_type=jnp.float32
                )

    @pl.when(is_last)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _qstream_call(
    *,
    sparse_data,
    out_ids,
    dep_ids,
    data_ids,
    counts,
    panel,
    panel_index,  # (dep, p) -> block index tuple for the dense operand
    panel_block,
    out_rows: int,
    out_cols: int,
    out_block,
    out_is_row: bool,  # out tile index = (out, p) if True else (p, out)
    panel_tiles: int,
    q: int,
    dims,
    block_first: bool,
    out_dtype,
    interpret: bool,
    accum: str = "ref",
    acc_t: bool = False,
):
    bs = sparse_data.shape[-1]
    concrete = not any(
        isinstance(x, jax.core.Tracer) for x in (out_ids, dep_ids, data_ids, counts)
    )
    out_q, dep_q, data_q, nv, n_steps = _plan(
        np.asarray(out_ids) if concrete else out_ids,
        np.asarray(dep_ids) if concrete else dep_ids,
        np.asarray(data_ids) if concrete else data_ids,
        np.asarray(counts) if concrete else counts,
        q,
        concrete=concrete,
    )
    grid = (panel_tiles, n_steps)

    def block_spec(qi):
        return pl.BlockSpec(
            (1, bs, bs),
            lambda p, j, out_q, dep_q, data_q, nv, qi=qi: (data_q[j * q + qi], 0, 0),
        )

    def panel_spec(qi):
        return pl.BlockSpec(
            panel_block,
            lambda p, j, out_q, dep_q, data_q, nv, qi=qi: panel_index(
                dep_q[j * q + qi], p
            ),
        )

    if out_is_row:
        out_index = lambda p, j, out_q, dep_q, data_q, nv: (out_q[j * q], p)
    else:
        out_index = lambda p, j, out_q, dep_q, data_q, nv: (p, out_q[j * q])

    kernel = functools.partial(
        _qstream_kernel, n_steps=n_steps, q=q, dims=dims,
        block_first=block_first, accum=accum, acc_t=acc_t,
    )
    acc_block = (out_block[1], out_block[0]) if acc_t else out_block
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[block_spec(i) for i in range(q)]
        + [panel_spec(i) for i in range(q)],
        out_specs=pl.BlockSpec(out_block, out_index),
        scratch_shapes=[pltpu.VMEM(acc_block, jnp.float32)],
    )
    panel_bytes = panel_block[0] * panel_block[1] * jnp.dtype(panel.dtype).itemsize
    vmem_limit = min(
        110 << 20,
        2 * q * (panel_bytes + bs * bs * sparse_data.dtype.itemsize)
        + 8 * out_block[0] * out_block[1]
        + (8 << 20),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, out_cols), out_dtype),
        compiler_params=compiler_params(
            ("parallel", "arbitrary"), vmem_limit_bytes=vmem_limit
        ),
        interpret=interpret,
    )(out_q, dep_q, data_q, nv, *([sparse_data] * q), *([panel] * q))


def dsd_q(
    a: BlockSparseMatrix,
    b: jax.Array,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    n_tile: int = 4096,
    q: int = 4,
    accum: str = "ref",
    interpret: bool | None = None,
) -> jax.Array:
    """C[M, N] = op(A_sparse) @ op(B_dense), q blocks per grid step.

    Semantics identical to :func:`bsr_dsd.dsd` (``block/dsd/dsd.h:10-22``);
    only the step batching differs.
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
    counts = group_offsets[1:] - group_offsets[:-1]
    min_hint = a.min_col_nnz if transpose_a else a.min_row_nnz
    bn = pick_tile(n_dim, n_tile)
    if transpose_b:  # B stored (N, K)
        panel_index = lambda dep, p: (p, dep)
        panel_block = (bn, bs)
    else:  # B stored (K, N)
        panel_index = lambda dep, p: (dep, p)
        panel_block = (bs, bn)
    out = _qstream_call(
        sparse_data=a.data,
        out_ids=out_ids,
        dep_ids=dep_ids,
        data_ids=data_ids,
        counts=counts,
        panel=b,
        panel_index=panel_index,
        panel_block=panel_block,
        out_rows=m_dim,
        out_cols=n_dim,
        out_block=(bs, bn),
        out_is_row=True,
        panel_tiles=cdiv(n_dim, bn),
        q=q,
        dims=dot_dims(transpose_a, transpose_b),
        block_first=True,
        out_dtype=out_dtype,
        interpret=interpret,
        accum=accum,
    )
    return _mask_empty_groups(out, group_offsets, bs, axis=0, min_hint=min_hint)


def dds_q(
    a: jax.Array,
    b: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    m_tile: int = 4096,
    q: int = 4,
    accum: str = "ref",
    interpret: bool | None = None,
) -> jax.Array:
    """C[M, N] = op(A_dense) @ op(B_sparse), q blocks per grid step.

    Semantics identical to :func:`bsr_dsd.dds` (``block/dds/dds.h``).
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

    out_ids, dep_ids, data_ids = b.iteration_arrays(transposed=not transpose_b)
    group_offsets = (
        b.offsets if transpose_b else b.with_transpose_metadata().offsets_t
    )
    counts = group_offsets[1:] - group_offsets[:-1]
    min_hint = b.min_row_nnz if transpose_b else b.min_col_nnz
    bm = pick_tile(m_dim, m_tile)
    if transpose_a:  # A stored (K, M)
        panel_index = lambda dep, p: (dep, p)
        panel_block = (bs, bm)
    else:  # A stored (M, K)
        panel_index = lambda dep, p: (p, dep)
        panel_block = (bm, bs)
    out = _qstream_call(
        sparse_data=b.data,
        out_ids=out_ids,
        dep_ids=dep_ids,
        data_ids=data_ids,
        counts=counts,
        panel=a,
        panel_index=panel_index,
        panel_block=panel_block,
        out_rows=m_dim,
        out_cols=n_dim,
        out_block=(bm, bs),
        out_is_row=False,
        panel_tiles=cdiv(m_dim, bm),
        q=q,
        dims=dot_dims(transpose_a, transpose_b),
        block_first=False,
        out_dtype=out_dtype,
        interpret=interpret,
        accum=accum,
    )
    return _mask_empty_groups(out, group_offsets, bs, axis=1, min_hint=min_hint)


def dds_ct(
    a: jax.Array,
    b: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    m_tile: int = 4096,
    q: int = 4,
    interpret: bool | None = None,
    **_,
) -> jax.Array:
    """DDS with a TRANSPOSED accumulator (round-4 mirror-parity fix).

    ``dds_q``'s per-slot dot is (bm, bs) @ (bs, bs) — a 128-wide result,
    which the round-4 dot-shape probes (docs/mxu_probe.json) cap at
    ~0.35-0.5 of peak; DSD's (bs, bs) @ (bs, bn) runs ~0.72. Computing the
    output tile transposed — acc (bs, bm) += block' x panel' — gives the
    mirror the SAME wide-streaming dot shape, then pays one VPU transpose
    per output tile at flush (M x N elements total per pass: ~4 us at
    d=4096, amortized over the whole k reduction).

    Semantics identical to :func:`bsr_dsd.dds` (``block/dds/dds.h``); the
    reference's mirrors are shape-symmetric so it never faced this
    (CUTLASS epilogues write either orientation at equal cost).
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

    out_ids, dep_ids, data_ids = b.iteration_arrays(transposed=not transpose_b)
    group_offsets = (
        b.offsets if transpose_b else b.with_transpose_metadata().offsets_t
    )
    counts = group_offsets[1:] - group_offsets[:-1]
    min_hint = b.min_row_nnz if transpose_b else b.min_col_nnz
    bm = pick_tile(m_dim, m_tile)
    if transpose_a:  # A stored (K, M): panel (bs, bm), k axis 0
        panel_index = lambda dep, p: (dep, p)
        panel_block = (bs, bm)
        panel_k = 0
    else:  # A stored (M, K): panel (bm, bs), k axis 1
        panel_index = lambda dep, p: (p, dep)
        panel_block = (bm, bs)
        panel_k = 1
    block_k = 1 if transpose_b else 0  # block (bs_n, bs_k) if tb else (bs_k, bs_n)
    dims_t = (((block_k,), (panel_k,)), ((), ()))  # -> (bs_n, bm)
    out = _qstream_call(
        sparse_data=b.data,
        out_ids=out_ids,
        dep_ids=dep_ids,
        data_ids=data_ids,
        counts=counts,
        panel=a,
        panel_index=panel_index,
        panel_block=panel_block,
        out_rows=m_dim,
        out_cols=n_dim,
        out_block=(bm, bs),
        out_is_row=False,
        panel_tiles=cdiv(m_dim, bm),
        q=q,
        dims=dims_t,
        block_first=True,
        out_dtype=out_dtype,
        interpret=interpret,
        acc_t=True,
    )
    return _mask_empty_groups(out, group_offsets, bs, axis=1, min_hint=min_hint)


# ---------------------------------------------------------------------------
# Dense-operand-RESIDENT q-stream ("bres"): the whole dense operand lives in
# VMEM for the kernel's lifetime.
#
# The q-stream above still re-fetches a (bs, n) dense panel from HBM per
# sparse block: total dense traffic = nnz_blocks * bs * n * isz (256 MB at
# d=4096/25% bf16 — 3.4x the compute-bound time at 819 GB/s; the chip hides
# part of it behind the MXU, the measured 0.72-of-SoL headline is the rest).
# When the dense operand FITS in VMEM (<= ~96 MB on v5e), fetch it ONCE: a
# single constant-index-map BlockSpec over the whole k-major-reshaped
# operand (the same index-map-repeat elision that made the W-resident MoE
# FFN 1.8x, kernels/bsr_ffn.py), and read each (bs, width) contraction
# panel in-kernel by a major-dim dynamic index. Dense HBM traffic drops
# nnz_blocks*bs*n -> k*n, which is below the compute bound for every
# density >= bs/k — the kernel becomes MXU-bound by construction.
#
# Requires the dense operand stored K-major (dsd: transpose_b=False;
# dds: transpose_a=True) — the other orientations would need a (bs)-minor
# dynamic slice, which Mosaic lowers poorly; they keep the streaming
# kernels. Reference analogue: the CUTLASS kernels' persistent smem tiles
# (default_block_gemm.h:58-61), scaled to VMEM's 128 MB.
# ---------------------------------------------------------------------------


def _bres_kernel(
    out_q, dep_q, data_q, nv,  # scalar prefetch
    *refs,  # q block refs, dense_ref, out_ref, acc_ref
    n_steps: int,
    q: int,
    bs: int,
    dims,
    block_first: bool,
    accum: str,
    out_scale: float | None,
    panel_mode: str,  # "major": dense_ref[(kb, bs, w)][dep]; "lane":
    #                   dense_ref[(w, k)][:, dep*bs : +bs] (128-aligned
    #                   dynamic lane offset — viability measured by
    #                   /tmp-probe before any registration relies on it)
):
    dense_ref = refs[q]
    out_ref, acc_ref = refs[q + 1], refs[q + 2]
    j = pl.program_id(0)
    base = j * q
    cur = out_q[base]
    prev = out_q[jnp.maximum(base - 1, 0)]
    nxt = out_q[jnp.minimum(base + q, n_steps * q - 1)]
    is_first = jnp.logical_or(base == 0, prev != cur)
    is_last = jnp.logical_or(j == n_steps - 1, nxt != cur)

    if panel_mode == "major":
        get_panel = lambda qi: dense_ref[dep_q[base + qi]]
    else:
        get_panel = lambda qi: dense_ref[:, pl.ds(dep_q[base + qi] * bs, bs)]
    n_valid = nv[j]
    part = _step_partial(
        refs[:q], get_panel, q=q,
        n_valid=n_valid, dims=dims, block_first=block_first, accum=accum,
        acc_dtype=acc_ref.dtype,
    )

    @pl.when(is_first)
    def _():
        acc_ref[:] = part

    @pl.when(jnp.logical_not(is_first))
    def _():
        acc_ref[:] += part

    @pl.when(is_last)
    def _():
        acc = acc_ref[:]
        if out_scale is not None:
            acc = acc.astype(jnp.float32) * out_scale
        out_ref[:] = acc.astype(out_ref.dtype)


def _bres_call(
    *,
    sparse_data,
    out_ids,
    dep_ids,
    data_ids,
    counts,
    dense_res,  # "major": (k_blocks, bs, width) K-major reshape; "lane":
    #             the raw (width, k) array, panels dynamic-lane-sliced
    out_rows: int,
    out_cols: int,
    out_block,
    out_is_row: bool,
    q: int,
    dims,
    block_first: bool,
    out_dtype,
    interpret: bool,
    accum: str = "kcat",
    out_scale: float | None = None,
    panel_mode: str = "major",
):
    bs = sparse_data.shape[-1]
    concrete = not any(
        isinstance(x, jax.core.Tracer) for x in (out_ids, dep_ids, data_ids, counts)
    )
    out_q, dep_q, data_q, nv, n_steps = _plan(
        np.asarray(out_ids) if concrete else out_ids,
        np.asarray(dep_ids) if concrete else dep_ids,
        np.asarray(data_ids) if concrete else data_ids,
        np.asarray(counts) if concrete else counts,
        q,
        concrete=concrete,
    )

    def block_spec(qi):
        return pl.BlockSpec(
            (1, bs, bs),
            lambda j, out_q, dep_q, data_q, nv, qi=qi: (data_q[j * q + qi], 0, 0),
        )

    dense_spec = pl.BlockSpec(
        dense_res.shape,
        (lambda j, out_q, dep_q, data_q, nv: (0,) * dense_res.ndim),
    )
    if out_is_row:
        out_index = lambda j, out_q, dep_q, data_q, nv: (out_q[j * q], 0)
    else:
        out_index = lambda j, out_q, dep_q, data_q, nv: (0, out_q[j * q])

    kernel = functools.partial(
        _bres_kernel, n_steps=n_steps, q=q, bs=bs, dims=dims,
        block_first=block_first, accum=accum, out_scale=out_scale,
        panel_mode=panel_mode,
    )
    acc_dtype = (
        jnp.int32 if jnp.issubdtype(sparse_data.dtype, jnp.integer)
        else jnp.float32
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_steps,),
        in_specs=[block_spec(i) for i in range(q)] + [dense_spec],
        out_specs=pl.BlockSpec(out_block, out_index),
        scratch_shapes=[pltpu.VMEM(out_block, acc_dtype)],
    )
    isz = jnp.dtype(dense_res.dtype).itemsize
    vmem_limit = min(
        120 << 20,
        int(np.prod(dense_res.shape)) * isz
        + 2 * q * bs * bs * sparse_data.dtype.itemsize
        + 12 * out_block[0] * out_block[1]
        + (8 << 20),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, out_cols), out_dtype),
        compiler_params=compiler_params(
            ("arbitrary",), vmem_limit_bytes=vmem_limit
        ),
        interpret=interpret,
    )(out_q, dep_q, data_q, nv, *([sparse_data] * q), dense_res)


# The dense operand must fit in VMEM next to the accumulator, the output
# tile, and the staged sparse blocks (v5e: 128 MB physical).
BRES_MAX_DENSE_BYTES = 96 << 20


def dsd_bres(
    a: BlockSparseMatrix,
    b: jax.Array,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    q: int = 8,
    accum: str = "kcat",
    interpret: bool | None = None,
    out_scale: float | None = None,
) -> jax.Array:
    """C = op(A_sparse) @ op(B) with the WHOLE of B VMEM-resident (fetched
    once); ``B.nbytes <= BRES_MAX_DENSE_BYTES``. K-major B
    (transpose_b=False) reads contraction panels by a major-dim dynamic
    index; transposed B falls back to 128-aligned dynamic LANE slices
    ("lane" mode — registry-gated until the probe proves the lowering)."""
    interpret = use_interpret() if interpret is None else interpret
    out_dtype = out_dtype or a.dtype
    bs = a.block_size
    m_dim = a.cols if transpose_a else a.rows
    k_dim = a.rows if transpose_a else a.cols
    bk = b.shape[1] if transpose_b else b.shape[0]
    if bk != k_dim:
        raise ValueError(f"contraction mismatch: A gives k={k_dim}, B gives {bk}")
    n_dim = b.shape[0] if transpose_b else b.shape[1]
    if a.nnz_blocks == 0:
        return jnp.zeros((m_dim, n_dim), out_dtype)
    out_ids, dep_ids, data_ids = a.iteration_arrays(transposed=transpose_a)
    group_offsets = (
        a.with_transpose_metadata().offsets_t if transpose_a else a.offsets
    )
    counts = group_offsets[1:] - group_offsets[:-1]
    min_hint = a.min_col_nnz if transpose_a else a.min_row_nnz
    out = _bres_call(
        sparse_data=a.data,
        out_ids=out_ids,
        dep_ids=dep_ids,
        data_ids=data_ids,
        counts=counts,
        dense_res=(b if transpose_b else b.reshape(k_dim // bs, bs, n_dim)),
        out_rows=m_dim,
        out_cols=n_dim,
        out_block=(bs, n_dim),
        out_is_row=True,
        q=q,
        dims=dot_dims(transpose_a, transpose_b),
        block_first=True,
        out_dtype=out_dtype,
        interpret=interpret,
        accum=accum,
        out_scale=out_scale,
        panel_mode="lane" if transpose_b else "major",
    )
    return _mask_empty_groups(out, group_offsets, bs, axis=0, min_hint=min_hint)


def dds_bres(
    a: jax.Array,
    b: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    q: int = 8,
    accum: str = "kcat",
    interpret: bool | None = None,
    out_scale: float | None = None,
) -> jax.Array:
    """C = op(A) @ op(B_sparse) with the WHOLE of A VMEM-resident.
    K-major A (transpose_a=True) uses major-dim panel reads; natural A
    falls back to dynamic LANE slices ("lane" mode, probe-gated)."""
    interpret = use_interpret() if interpret is None else interpret
    out_dtype = out_dtype or b.dtype
    bs = b.block_size
    n_dim = b.rows if transpose_b else b.cols
    k_dim = b.cols if transpose_b else b.rows
    ak = a.shape[0] if transpose_a else a.shape[1]
    if ak != k_dim:
        raise ValueError(f"contraction mismatch: B gives k={k_dim}, A gives {ak}")
    m_dim = a.shape[1] if transpose_a else a.shape[0]
    if b.nnz_blocks == 0:
        return jnp.zeros((m_dim, n_dim), out_dtype)
    out_ids, dep_ids, data_ids = b.iteration_arrays(transposed=not transpose_b)
    group_offsets = (
        b.offsets if transpose_b else b.with_transpose_metadata().offsets_t
    )
    counts = group_offsets[1:] - group_offsets[:-1]
    min_hint = b.min_row_nnz if transpose_b else b.min_col_nnz
    out = _bres_call(
        sparse_data=b.data,
        out_ids=out_ids,
        dep_ids=dep_ids,
        data_ids=data_ids,
        counts=counts,
        dense_res=(a.reshape(k_dim // bs, bs, m_dim) if transpose_a else a),
        out_rows=m_dim,
        out_cols=n_dim,
        out_block=(m_dim, bs),
        out_is_row=False,
        q=q,
        dims=dot_dims(transpose_a, transpose_b),
        block_first=False,
        out_dtype=out_dtype,
        interpret=interpret,
        accum=accum,
        out_scale=out_scale,
        panel_mode="major" if transpose_a else "lane",
    )
    return _mask_empty_groups(out, group_offsets, bs, axis=1, min_hint=min_hint)
