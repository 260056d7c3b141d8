"""Public BSR matmul API — the six dense/sparse layout combinations.

The TPU-native analogue of the reference's op front-ends
(``sputnik/sputnik.h:18-25`` re-exporting ``block/{dsd,dds,sdd,ssd,sds,
dss}``): shape validation at trace time (the reference's ``ValidMatmul``,
``arguments.h:217-231``) then registry first-fit dispatch. There is no
``MatmulEx`` distinction here — metadata builds are jit-safe device compute
and callers can pre-attach them with
``BlockSparseMatrix.with_transpose_metadata()`` to amortize.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sputnik_tpu.formats import BlockSparseMatrix
from sputnik_tpu.kernels import (
    bsr_cstack,
    xla_gather,
    bsr_dsd,
    bsr_cres,
    bsr_dsd_pipelined,
    bsr_qstream,
    bsr_flat,
    bsr_panel,
    bsr_sdd,
    bsr_small,
    bsr_ssd,
    bsr_dss,
    reference,
    via_dense,
)
from sputnik_tpu.kernels.bsr_flat import (  # re-exported planning API
    FlatSchedule,
    plan_dss,
    plan_sparse_out,
    plan_sss,
)
from sputnik_tpu.ops import registry

__all__ = [
    "matmul_dsd",
    "matmul_dds",
    "matmul_sdd",
    "matmul_ssd",
    "matmul_sds",
    "matmul_dss",
    "matmul_sss",
    "matmul",
    "FlatSchedule",
    "plan_ssd",
    "plan_sds",
    "plan_dss",
    "plan_sss",
    "plan_sdd",
]


def plan_ssd(a: BlockSparseMatrix, topology: BlockSparseMatrix, *, transpose_a: bool = False) -> FlatSchedule:
    """Precompute the exact SSD work list (call outside jit; pass the result
    to ``matmul_ssd(..., schedule=)`` — the ``MatmulEx`` discipline)."""
    return plan_sparse_out(a, topology, kind="ssd", stream_transposed=transpose_a)


def plan_sds(b: BlockSparseMatrix, topology: BlockSparseMatrix, *, transpose_b: bool = False) -> FlatSchedule:
    """Precompute the exact SDS work list (call outside jit)."""
    return plan_sparse_out(b, topology, kind="sds", stream_transposed=not transpose_b)


def _concrete(*arrays) -> bool:
    return not any(isinstance(x, jax.core.Tracer) for x in arrays if x is not None)

_PALLAS_DTYPES = (jnp.bfloat16, jnp.float32)


def _pallas_ok(*sparse_operands, dense_dims=(), dtypes=()):
    """Common Pallas `can_implement` conditions: MXU-aligned 128-multiple
    blocks and dims, supported dtypes (reference analogue: the per-file
    alignment + block_size==128 + mode checks, ``dsd_*_nt_align8.cu:45-65``)."""
    for m in sparse_operands:
        if m.block_size % 128 != 0:
            return False
    for d in dense_dims:
        if d % 128 != 0:
            return False
    for dt in dtypes:
        if jnp.dtype(dt) not in (jnp.dtype(d) for d in _PALLAS_DTYPES):
            return False
    return True


# ---------------------------------------------------------------------------
# DSD: dense = sparse @ dense
# ---------------------------------------------------------------------------


def _dsd_can(a, b, transpose_a=False, transpose_b=False, out_dtype=None, **kw):
    n_dim = b.shape[0] if transpose_b else b.shape[1]
    return _pallas_ok(
        a, dense_dims=(n_dim,), dtypes=(a.dtype, b.dtype, out_dtype or a.dtype)
    ) and a.nnz_blocks > 0


def _dsd_panel_can(a, b, transpose_a=False, transpose_b=False, out_dtype=None,
                   schedule=None, **kw):
    """Panel-resident DSD: needs concrete metadata (host-batched stream)
    or a prebuilt schedule, plus a full-K dense panel within VMEM budget."""
    if not _dsd_can(a, b, transpose_a=transpose_a, transpose_b=transpose_b,
                    out_dtype=out_dtype):
        return False
    k_dim = a.rows if transpose_a else a.cols
    if not bsr_panel.panel_fits(k_dim, jnp.dtype(b.dtype).itemsize):
        return False
    if schedule is not None:
        return True
    # Base metadata must be concrete (transpose metadata derives from it
    # eagerly when absent; _concrete skips None leaves).
    return _concrete(a.offsets, a.indices, a.offsets_t, a.indices_t,
                     a.block_offsets)


def _dsd_cres_can(a, b, transpose_a=False, transpose_b=False, out_dtype=None, **kw):
    """C-resident schedule: every operand moves once; needs the fp32
    accumulator (m x n) + dense strips to fit VMEM."""
    if not _dsd_can(a, b, transpose_a=transpose_a, transpose_b=transpose_b,
                    out_dtype=out_dtype):
        return False
    m_dim = a.cols if transpose_a else a.rows
    n_dim = b.shape[0] if transpose_b else b.shape[1]
    strip = n_dim * a.block_size * jnp.dtype(b.dtype).itemsize
    return bsr_cres.fits_vmem(m_dim, n_dim, strip)


def _dsd_densify_can(a, b, transpose_a=False, transpose_b=False,
                     out_dtype=None, schedule=None, plan=None, **kw):
    """Near-dense sparse operand: densify + one XLA dot beats the stream
    kernels (<= 20% MXU work saved at ~0.6-0.7 relative efficiency).
    An explicit schedule/plan is a caller's opt-in to a planned kernel —
    never swallow it."""
    return (schedule is None and plan is None
            and a.density >= via_dense.DENSIFY_THRESHOLD)


registry.register("dsd", "xla_dense_detour", _dsd_densify_can, reference.dsd)
registry.register("dsd", "pallas_stream", _dsd_can, bsr_dsd.dsd)
# Q-batched stream: q blocks per grid step divides the fixed per-step
# Pallas cost (the stream kernel's measured overhead at d=4096) by q.
registry.register("dsd", "pallas_qstream", _dsd_can, bsr_qstream.dsd_q)
# q=2: the round-4 headline shootout's best point (235.2 us / 0.742 at
# d=4096 25% — within 4% of the measured bm=128 per-dot ceiling).
registry.register(
    "dsd", "pallas_qstream_q2", _dsd_can,
    functools.partial(bsr_qstream.dsd_q, q=2),
)
# Value-accumulate q-stream: sums the q dots in registers and touches the
# fp32 accumulator once per step (one RMW instead of q) — the candidate
# fix if the accumulator read-modify-write is the stream schedule's
# residual cost (bench/mxu_probe.py isolates it).
registry.register(
    "dsd", "pallas_qstream_vacc", _dsd_can,
    functools.partial(bsr_qstream.dsd_q, accum="value"),
)
# Depth-concat q-stream: ONE dot of contraction depth q*128 per step
# ([B0 B1] @ [P0; P1] = B0@P0 + B1@P1) — attacks the measured per-dot
# MXU cost at k=128 that every round-3 schedule converged to. The _q8
# registration exposes the deeper-contraction point to autotune (which
# calls each launch with its registered defaults).
registry.register(
    "dsd", "pallas_qstream_kcat", _dsd_can,
    functools.partial(bsr_qstream.dsd_q, accum="kcat"),
)
registry.register(
    "dsd", "pallas_qstream_kcat_q8", _dsd_can,
    functools.partial(bsr_qstream.dsd_q, accum="kcat", q=8),
)


def _dsd_bres_can(a, b, transpose_a=False, transpose_b=False, out_dtype=None,
                  **kw):
    """Whole-B-resident q-stream: B K-major (transpose_b=False) and small
    enough to live in VMEM beside the accumulator and the output tile —
    dense HBM traffic drops nnz_blocks*bs*n -> k*n (fetched once)."""
    if transpose_b:
        return False
    if not _dsd_can(a, b, transpose_a=transpose_a, transpose_b=transpose_b,
                    out_dtype=out_dtype):
        return False
    n_dim = b.shape[1]
    dense_bytes = b.size * jnp.dtype(b.dtype).itemsize
    return (dense_bytes + 6 * a.block_size * n_dim
            <= bsr_qstream.BRES_MAX_DENSE_BYTES)


registry.register("dsd", "pallas_bres", _dsd_bres_can, bsr_qstream.dsd_bres)
registry.register(
    "dsd", "pallas_bres_q4", _dsd_bres_can,
    functools.partial(bsr_qstream.dsd_bres, q=4),
)
# C-resident schedule: measured v5e @25% bf16 40.0 vs stream's 38.3 us
# (d=2048) and 307.8 vs 243.3 (d=4096) — the per-step dynamic-indexed
# fp32 accumulate doesn't overlap the MXU well enough to beat streaming
# for DSD, so it stays autotune-selectable here; the DDS mirror is where
# it WINS (dds registration below puts it first).
registry.register("dsd", "pallas_cres", _dsd_cres_can, bsr_cres.dsd_cres)


def _dsd_cstack_can(a, b, transpose_a=False, transpose_b=False,
                    out_dtype=None, **kw):
    """Column-stacked C-resident schedule: q same-k blocks in ONE
    (q*bs, bs) @ (bs, nt) dot — m streams q*128 rows per MXU fill (the
    round-4 m-tile probe's lever). No transposed-A (the stacked lhs would
    need per-block transposes); accumulator must fit VMEM at nt >= 128."""
    if transpose_a:
        return False
    if not _dsd_can(a, b, transpose_a=transpose_a, transpose_b=transpose_b,
                    out_dtype=out_dtype):
        return False
    return bsr_cstack.cstack_fits(a.rows, 128)


registry.register("dsd", "pallas_cstack", _dsd_cstack_can,
                  bsr_cstack.dsd_cstack)
registry.register(
    "dsd", "pallas_cstack_q4", _dsd_cstack_can,
    functools.partial(bsr_cstack.dsd_cstack, q=4),
)


def _dsd_gather_can(a, b, transpose_a=False, transpose_b=False,
                    out_dtype=None, **kw):
    """Pure-XLA gather + one batched deep dot: concrete metadata only
    (slot maps are planned host-side); ragged rows pad to the max width.
    Registered after the Pallas schedules — it pays a measured HBM
    materialization for XLA's deeper MXU schedule, so it reaches dispatch
    via variant=/autotune, not first-fit."""
    if transpose_a:
        return False
    if not _dsd_can(a, b, transpose_a=transpose_a, transpose_b=transpose_b,
                    out_dtype=out_dtype):
        return False
    return _concrete(a.offsets, a.indices)


registry.register("dsd", "xla_gather_bmm", _dsd_gather_can,
                  xla_gather.dsd_gather_bmm)


def _dsd_gres_can(a, b, transpose_a=False, transpose_b=False, out_dtype=None,
                  plan=None, **kw):
    """Group-resident schedule (host-planned): concrete metadata or a
    prebuilt plan; any problem size (the accumulator group adapts)."""
    if not _dsd_can(a, b, transpose_a=transpose_a, transpose_b=transpose_b,
                    out_dtype=out_dtype):
        return False
    return plan is not None or _concrete(a.offsets, a.indices)


registry.register("dsd", "pallas_gres", _dsd_gres_can, bsr_cres.dsd_gres)
# Alternative kernels registered AFTER the streamed default so first-fit
# keeps the measured winner (stream 38.3 us vs panel 46.7 us at the
# d=2048/25%/bf16 audit config) while autotune can still time and promote
# them per problem.
registry.register("dsd", "pallas_panel", _dsd_panel_can, bsr_panel.dsd_panel)
registry.register("dsd", "pallas_pipelined", _dsd_can, bsr_dsd_pipelined.dsd)


def _dsd_small_can(a, b, transpose_a=False, transpose_b=False, out_dtype=None, **kw):
    """Packed small-block DSD (bs 16/32/64): the sparse-saving path for the
    block sizes the reference reserved but never wired (arguments.h:13-19).
    Needs concrete metadata (host-planned packing) and MXU-aligned dims."""
    n_dim = b.shape[0] if transpose_b else b.shape[1]
    k_dim = b.shape[1] if transpose_b else b.shape[0]
    return (
        a.block_size in (16, 32, 64)
        and a.nnz_blocks > 0
        and n_dim % 128 == 0
        and k_dim % a.block_size == 0
        and _concrete(a.offsets, a.indices)
        and all(
            jnp.dtype(dt) in (jnp.dtype(d) for d in _PALLAS_DTYPES)
            for dt in (a.dtype, b.dtype, out_dtype or a.dtype)
        )
    )


registry.register("dsd", "pallas_smallblock", _dsd_small_can, bsr_small.dsd_smallblock)
registry.register("dsd", "jnp_fallback", lambda *a, **k: True, reference.dsd)


def _dds_small_can(a, b, transpose_a=False, transpose_b=False, out_dtype=None, **kw):
    m_dim = a.shape[1] if transpose_a else a.shape[0]
    k_dim = a.shape[0] if transpose_a else a.shape[1]
    return (
        b.block_size in (16, 32, 64)
        and b.nnz_blocks > 0
        and m_dim % 128 == 0
        and k_dim % b.block_size == 0
        and _concrete(b.offsets, b.indices)
        and all(
            jnp.dtype(dt) in (jnp.dtype(d) for d in _PALLAS_DTYPES)
            for dt in (a.dtype, b.dtype, out_dtype or b.dtype)
        )
    )


def _sdd_small_can(a, b, topology, transpose_a=False, transpose_b=False,
                   out_dtype=None, **kw):
    return (
        topology.block_size in (16, 32, 64)
        and topology.nnz_blocks > 0
        and _concrete(topology.offsets, topology.indices)
        and all(
            jnp.dtype(dt) in (jnp.dtype(d) for d in _PALLAS_DTYPES)
            for dt in (a.dtype, b.dtype, out_dtype or topology.dtype)
        )
    )


def matmul_dsd(
    a: BlockSparseMatrix,
    b: jax.Array,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    **options,
) -> jax.Array:
    """C[M, N] = op(A_sparse) @ op(B_dense)   (reference ``block/dsd/dsd.h``)."""
    k_a = a.rows if transpose_a else a.cols
    k_b = b.shape[1] if transpose_b else b.shape[0]
    if k_a != k_b:
        # Trace-time ValidMatmul (reference arguments.h:217-231): every
        # variant — including the jnp fallback — must fail with the same
        # labeled error, not a backend TypeError.
        raise ValueError(
            f"dsd contraction mismatch: op(A) gives k={k_a}, op(B) gives "
            f"k={k_b} (A {a.shape} ta={transpose_a}, B {b.shape} "
            f"tb={transpose_b})"
        )
    return registry.dispatch(
        "dsd",
        a,
        b,
        transpose_a=transpose_a,
        transpose_b=transpose_b,
        out_dtype=out_dtype,
        **options,
    )


# ---------------------------------------------------------------------------
# DDS: dense = dense @ sparse
# ---------------------------------------------------------------------------


def _dds_can(a, b, transpose_a=False, transpose_b=False, out_dtype=None, **kw):
    m_dim = a.shape[1] if transpose_a else a.shape[0]
    return _pallas_ok(
        b, dense_dims=(m_dim,), dtypes=(a.dtype, b.dtype, out_dtype or b.dtype)
    ) and b.nnz_blocks > 0


def _dds_panel_can(a, b, transpose_a=False, transpose_b=False, out_dtype=None,
                   schedule=None, **kw):
    if not _dds_can(a, b, transpose_a=transpose_a, transpose_b=transpose_b,
                    out_dtype=out_dtype):
        return False
    k_dim = b.cols if transpose_b else b.rows
    if not bsr_panel.panel_fits(k_dim, jnp.dtype(a.dtype).itemsize):
        return False
    if schedule is not None:
        return True
    return _concrete(b.offsets, b.indices, b.offsets_t, b.indices_t,
                     b.block_offsets)


def _dds_cres_can(a, b, transpose_a=False, transpose_b=False, out_dtype=None, **kw):
    if not _dds_can(a, b, transpose_a=transpose_a, transpose_b=transpose_b,
                    out_dtype=out_dtype):
        return False
    m_dim = a.shape[1] if transpose_a else a.shape[0]
    n_dim = b.rows if transpose_b else b.cols
    strip = m_dim * b.block_size * jnp.dtype(a.dtype).itemsize
    return bsr_cres.fits_vmem(m_dim, n_dim, strip)


def _dds_stream_at(a, b, transpose_a=False, transpose_b=False, **kw):
    """Restage A once (one XLA transpose) so the kernel's per-block dense
    panels become (bs, bm) contiguous rows instead of thousands of 256-byte
    strided chunks. Measured v5e @25% bf16: neutral at d=2048 (53.4 vs
    52.3 us), 13% faster at d=4096 (306.7 vs 351.8) — the restage
    amortizes as d grows. Autotune promotes it where it wins."""
    a_t = a if transpose_a else a.T
    return bsr_dsd.dds(
        a_t, b, transpose_a=True, transpose_b=transpose_b, **kw
    )


# C-resident first for DDS: measured v5e @25% bf16 46.0 vs the streamed
# kernel's 52.3 us (d=2048) and 301.2 vs 351.7 (d=4096) — dep-major
# natural-order blocks + once-fetched A strips beat the tile-stationary
# schedule on the mirror side (where streaming pays strided panels).
def _dds_densify_can(a, b, transpose_a=False, transpose_b=False,
                     out_dtype=None, schedule=None, plan=None, **kw):
    return (schedule is None and plan is None
            and b.density >= via_dense.DENSIFY_THRESHOLD)


registry.register("dds", "xla_dense_detour", _dds_densify_can, reference.dds)
registry.register("dds", "pallas_cres", _dds_cres_can, bsr_cres.dds_cres)


def _dds_gres_can(a, b, transpose_a=False, transpose_b=False, out_dtype=None,
                  plan=None, **kw):
    if not _dds_can(a, b, transpose_a=transpose_a, transpose_b=transpose_b,
                    out_dtype=out_dtype):
        return False
    return plan is not None or _concrete(b.offsets, b.indices)


registry.register("dds", "pallas_gres", _dds_gres_can, bsr_cres.dds_gres)
registry.register("dds", "pallas_stream", _dds_can, bsr_dsd.dds)
registry.register("dds", "pallas_qstream", _dds_can, bsr_qstream.dds_q)
# Transposed-accumulator mirror (round-4 parity fix): per-slot dots become
# (bs, bs) @ (bs, bm) — DSD's wide-streaming shape — instead of the
# 128-wide (bm, bs) result the dot-shape probes cap at ~0.35-0.5; one VPU
# tile transpose per flush pays for it.
registry.register("dds", "pallas_ct", _dds_can, bsr_qstream.dds_ct)
registry.register(
    "dds", "pallas_qstream_vacc", _dds_can,
    functools.partial(bsr_qstream.dds_q, accum="value"),
)
registry.register(
    "dds", "pallas_qstream_kcat", _dds_can,
    functools.partial(bsr_qstream.dds_q, accum="kcat"),
)
registry.register(
    "dds", "pallas_qstream_kcat_q8", _dds_can,
    functools.partial(bsr_qstream.dds_q, accum="kcat", q=8),
)


def _dds_bres_can(a, b, transpose_a=False, transpose_b=False, out_dtype=None,
                  **kw):
    """Whole-A-resident q-stream mirror: A K-major (transpose_a=True)."""
    if not transpose_a:
        return False
    if not _dds_can(a, b, transpose_a=transpose_a, transpose_b=transpose_b,
                    out_dtype=out_dtype):
        return False
    m_dim = a.shape[1]
    dense_bytes = a.size * jnp.dtype(a.dtype).itemsize
    return (dense_bytes + 6 * b.block_size * m_dim
            <= bsr_qstream.BRES_MAX_DENSE_BYTES)


registry.register("dds", "pallas_bres", _dds_bres_can, bsr_qstream.dds_bres)


def _dds_gather_can(a, b, transpose_a=False, transpose_b=False,
                    out_dtype=None, **kw):
    """Mirror of xla_gather_bmm: uniform block-COLUMNS of B, concrete
    metadata, no transpose_b (B^T's columns are B's rows)."""
    if transpose_b:
        return False
    if not _dds_can(a, b, transpose_a=transpose_a, transpose_b=transpose_b,
                    out_dtype=out_dtype):
        return False
    return xla_gather.uniform_col_width(b) is not None


registry.register("dds", "xla_gather_bmm", _dds_gather_can,
                  xla_gather.dds_gather_bmm)
registry.register("dds", "pallas_stream_at", _dds_can, _dds_stream_at)
registry.register("dds", "pallas_panel", _dds_panel_can, bsr_panel.dds_panel)
registry.register("dds", "pallas_pipelined", _dds_can, bsr_dsd_pipelined.dds)
registry.register("dds", "pallas_smallblock", _dds_small_can, bsr_small.dds_smallblock)
registry.register("dds", "jnp_fallback", lambda *a, **k: True, reference.dds)


def matmul_dds(
    a: jax.Array,
    b: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    **options,
) -> jax.Array:
    """C[M, N] = op(A_dense) @ op(B_sparse)   (reference ``block/dds/dds.h``)."""
    k_a = a.shape[0] if transpose_a else a.shape[1]
    k_b = b.cols if transpose_b else b.rows
    if k_a != k_b:
        raise ValueError(
            f"dds contraction mismatch: op(A) gives k={k_a}, op(B) gives "
            f"k={k_b} (A {a.shape} ta={transpose_a}, B {b.shape} "
            f"tb={transpose_b})"
        )
    return registry.dispatch(
        "dds",
        a,
        b,
        transpose_a=transpose_a,
        transpose_b=transpose_b,
        out_dtype=out_dtype,
        **options,
    )


# ---------------------------------------------------------------------------
# SDD: sparse = dense @ dense (output-masked)
# ---------------------------------------------------------------------------


def _sdd_can(a, b, topology, transpose_a=False, transpose_b=False, out_dtype=None, **kw):
    k_dim = a.shape[0] if transpose_a else a.shape[1]
    return _pallas_ok(
        topology,
        dense_dims=(k_dim,),
        dtypes=(a.dtype, b.dtype, out_dtype or topology.dtype),
    )


def _sdd_panel_can(a, b, topology, transpose_a=False, transpose_b=False,
                   out_dtype=None, schedule=None, **kw):
    if not _sdd_can(a, b, topology, transpose_a=transpose_a,
                    transpose_b=transpose_b, out_dtype=out_dtype):
        return False
    if schedule is not None:
        return True
    if transpose_a:
        # k-minor A defeats the resident-panel slicing (sublane-misaligned
        # dynamic slices / 2x padding — measured dead ends); the k-tiled
        # output-stationary kernel keeps TN/TT.
        return False
    k_dim = a.shape[1]
    if k_dim > 8192:
        # Round-5 evidence at k=16384 (v5e): the full-K resident panel
        # never completed a remote compile (>10-minute compiles observed
        # before the attempt was killed), while the k-tiled
        # output-stationary kernel compiles and measures equal-or-better
        # at this scale (0.15-0.33 of SoL across densities,
        # bsr_grid_results.json). Cap first-fit at the largest VERIFIED
        # K so an untuned dispatch never risks the pathological compile;
        # explicit variant= still reaches the panel kernel.
        return False
    # Needs concrete metadata (host plan) and a valid A row-group panel
    # within the VMEM budget; larger K falls back to the k-tiled kernel.
    return (
        _concrete(topology.row_indices, topology.indices)
        and bsr_sdd._pick_group_rows(
            topology.rows // topology.block_size,
            topology.block_size,
            k_dim,
            jnp.dtype(a.dtype).itemsize,
        )
        > 0
        and topology.nnz_blocks > 0
    )


def plan_sdd(topology: BlockSparseMatrix, k_dim: int, *, itemsize: int = 2):
    """Precompute the panel-resident SDD work list (call outside jit; pass
    to ``matmul_sdd(..., schedule=)`` — the ``MatmulEx`` discipline)."""
    return bsr_sdd.plan_sdd_panel(topology, k_dim, itemsize=itemsize)


def _sdd_densify_can(a, b, topology, transpose_a=False, transpose_b=False,
                     out_dtype=None, schedule=None, plan=None, **kw):
    return (schedule is None and plan is None
            and topology.density >= via_dense.DENSIFY_THRESHOLD)


registry.register("sdd", "xla_dense_detour", _sdd_densify_can, reference.sdd)
registry.register("sdd", "pallas_panel", _sdd_panel_can, bsr_sdd.sdd_panel)
registry.register("sdd", "pallas_output_stationary", _sdd_can, bsr_sdd.sdd)


def _sdd_bres_can(a, b, topology, transpose_a=False, transpose_b=False,
                  out_dtype=None, schedule=None, **kw):
    """Input-resident SDD: both dense operands whole in VMEM (each fetched
    once — the fix for the output-stationary kernel's 2*nnz*bs*k
    re-stream). Needs concrete topology metadata (host-packed plan)."""
    if not _sdd_can(a, b, topology, transpose_a=transpose_a,
                    transpose_b=transpose_b, out_dtype=out_dtype):
        return False
    if schedule is None and not _concrete(topology.offsets, topology.indices):
        return False
    m_dim = a.shape[1] if transpose_a else a.shape[0]
    k_dim = a.shape[0] if transpose_a else a.shape[1]
    n_dim = b.shape[0] if transpose_b else b.shape[1]
    bs = topology.block_size
    isz = jnp.dtype(a.dtype).itemsize
    return (m_dim % bs == 0 and n_dim % bs == 0
            and (m_dim + n_dim) * k_dim * isz <= bsr_sdd.SDD_BRES_MAX_BYTES)


registry.register("sdd", "pallas_bres", _sdd_bres_can, bsr_sdd.sdd_bres)
registry.register("sdd", "pallas_smallblock", _sdd_small_can, bsr_small.sdd_smallblock)
registry.register("sdd", "jnp_fallback", lambda *a, **k: True, reference.sdd)


def matmul_sdd(
    a: jax.Array,
    b: jax.Array,
    topology: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    **options,
) -> BlockSparseMatrix:
    """C_sparse = op(A) @ op(B) masked to ``topology``
    (reference ``block/sdd/sdd.h``; SDDMM / attention-score shape)."""
    return registry.dispatch(
        "sdd",
        a,
        b,
        topology,
        transpose_a=transpose_a,
        transpose_b=transpose_b,
        out_dtype=out_dtype,
        **options,
    )


# ---------------------------------------------------------------------------
# SSD: sparse = sparse @ dense
# ---------------------------------------------------------------------------


def _ssd_can(a, b, topology, transpose_a=False, transpose_b=False, out_dtype=None, **kw):
    return (
        _pallas_ok(
            a, topology, dtypes=(a.dtype, b.dtype, out_dtype or topology.dtype)
        )
        and a.block_size == topology.block_size
    )


def _ssd_dense_detour_can(a, b, topology, transpose_a=False, transpose_b=False, out_dtype=None, **kw):
    n_dim = b.shape[0] if transpose_b else b.shape[1]
    return (
        _dsd_can(a, b, transpose_a=transpose_a, transpose_b=transpose_b, out_dtype=out_dtype)
        and topology.density >= via_dense.DENSITY_THRESHOLD
    )


def _ssd_flat_can(a, b, topology, transpose_a=False, transpose_b=False,
                  out_dtype=None, schedule=None, **kw):
    if not _ssd_can(a, b, topology, transpose_a=transpose_a,
                    transpose_b=transpose_b, out_dtype=out_dtype):
        return False
    if schedule is not None:
        return True
    # Eager + concrete metadata: plan on the fly when the exact work list
    # beats both the extract detour and the masked-step kernel (measured
    # crossover vs the extract detour is ~25% topology density on v5e).
    return (
        topology.density < 0.25
        and _concrete(a.offsets, a.indices, topology.row_indices, topology.indices)
    )


# First fit order: explicit schedule -> exact flat work list; else at
# moderate density the at-SoL DSD + block extract beats the direct
# (128,128)-tile output-stationary kernels ~2-5x (docs/PERFORMANCE.md);
# the masked-step kernel keeps the traced-metadata extreme-sparsity regime.
registry.register("ssd", "pallas_flat_schedule", _ssd_flat_can, bsr_flat.ssd_flat)
# Depth-concat flat schedule: the group's dots fused into ONE dot of
# contraction depth group*bs (see bsr_qstream accum="kcat").
registry.register(
    "ssd", "pallas_flat_kcat", _ssd_flat_can,
    functools.partial(bsr_flat.ssd_flat, kcat=True),
)
registry.register("ssd", "pallas_dsd_extract", _ssd_dense_detour_can, via_dense.ssd)
registry.register("ssd", "pallas_output_stationary", _ssd_can, bsr_ssd.ssd)


def _ssd_small_can(a, b, topology, transpose_a=False, transpose_b=False,
                   out_dtype=None, schedule=None, **kw):
    """Small-block SSD (bs 16/32/64): packed sparse-saving DSD + block
    extract (the reserved-enum sizes, arguments.h:13-19). An explicit
    ``schedule`` is the 128-block flat path's plan format — reject it."""
    return (
        schedule is None
        and topology.block_size == a.block_size
        and _dsd_small_can(a, b, transpose_a=transpose_a,
                           transpose_b=transpose_b,
                           out_dtype=out_dtype or topology.dtype)
    )


registry.register("ssd", "pallas_smallblock", _ssd_small_can,
                  via_dense.ssd_smallblock)
registry.register("ssd", "jnp_fallback", lambda *a, **k: True, reference.ssd)


def matmul_ssd(
    a: BlockSparseMatrix,
    b: jax.Array,
    topology: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    **options,
) -> BlockSparseMatrix:
    """C_sparse = op(A_sparse) @ op(B_dense) masked to ``topology``
    (reference ``block/ssd/ssd.h``)."""
    return registry.dispatch(
        "ssd",
        a,
        b,
        topology,
        transpose_a=transpose_a,
        transpose_b=transpose_b,
        out_dtype=out_dtype,
        **options,
    )


# ---------------------------------------------------------------------------
# SDS: sparse = dense @ sparse
# ---------------------------------------------------------------------------


def _sds_can(a, b, topology, transpose_a=False, transpose_b=False, out_dtype=None, **kw):
    return (
        _pallas_ok(
            b, topology, dtypes=(a.dtype, b.dtype, out_dtype or topology.dtype)
        )
        and b.block_size == topology.block_size
    )


def _sds_dense_detour_can(a, b, topology, transpose_a=False, transpose_b=False, out_dtype=None, **kw):
    return (
        _dds_can(a, b, transpose_a=transpose_a, transpose_b=transpose_b, out_dtype=out_dtype)
        and topology.density >= via_dense.DENSITY_THRESHOLD
    )


def _sds_flat_can(a, b, topology, transpose_a=False, transpose_b=False,
                  out_dtype=None, schedule=None, **kw):
    if not _sds_can(a, b, topology, transpose_a=transpose_a,
                    transpose_b=transpose_b, out_dtype=out_dtype):
        return False
    if schedule is not None:
        return True
    return (
        topology.density < 0.25
        and _concrete(b.offsets, b.indices, topology.row_indices, topology.indices)
    )


registry.register("sds", "pallas_flat_schedule", _sds_flat_can, bsr_flat.sds_flat)
registry.register(
    "sds", "pallas_flat_kcat", _sds_flat_can,
    functools.partial(bsr_flat.sds_flat, kcat=True),
)
registry.register("sds", "pallas_dds_extract", _sds_dense_detour_can, via_dense.sds)
registry.register("sds", "pallas_output_stationary", _sds_can, bsr_ssd.sds)


def _sds_small_can(a, b, topology, transpose_a=False, transpose_b=False,
                   out_dtype=None, schedule=None, **kw):
    """Small-block SDS: packed sparse-saving DDS mirror + block extract."""
    return (
        schedule is None
        and topology.block_size == b.block_size
        and _dds_small_can(a, b, transpose_a=transpose_a,
                           transpose_b=transpose_b,
                           out_dtype=out_dtype or topology.dtype)
    )


registry.register("sds", "pallas_smallblock", _sds_small_can,
                  via_dense.sds_smallblock)
registry.register("sds", "jnp_fallback", lambda *a, **k: True, reference.sds)


def matmul_sds(
    a: jax.Array,
    b: BlockSparseMatrix,
    topology: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    **options,
) -> BlockSparseMatrix:
    """C_sparse = op(A_dense) @ op(B_sparse) masked to ``topology``
    (reference ``block/sds/sds.h``)."""
    return registry.dispatch(
        "sds",
        a,
        b,
        topology,
        transpose_a=transpose_a,
        transpose_b=transpose_b,
        out_dtype=out_dtype,
        **options,
    )


# ---------------------------------------------------------------------------
# DSS: dense = sparse @ sparse
# ---------------------------------------------------------------------------


def _dss_can(a, b, transpose_a=False, transpose_b=False, out_dtype=None, **kw):
    return (
        _pallas_ok(a, b, dtypes=(a.dtype, b.dtype, out_dtype or a.dtype))
        and a.block_size == b.block_size
        and a.nnz_blocks > 0
        and b.nnz_blocks > 0
    )


def _dss_densify_can(a, b, transpose_a=False, transpose_b=False, out_dtype=None, **kw):
    denser = a if a.nnz <= b.nnz else b
    return (
        _dss_can(a, b, transpose_a=transpose_a, transpose_b=transpose_b, out_dtype=out_dtype)
        and denser.density >= via_dense.DENSITY_THRESHOLD
    )


def _dss_flat_can(a, b, transpose_a=False, transpose_b=False, out_dtype=None,
                  schedule=None, **kw):
    if not _dss_can(a, b, transpose_a=transpose_a, transpose_b=transpose_b,
                    out_dtype=out_dtype):
        return False
    if schedule is not None:
        return True
    # Work items scale with density_a * density_b; measured crossover vs
    # the densify detour on v5e sits near a 0.1 product (~32% per side).
    return (
        a.density * b.density < 0.1
        and _concrete(a.offsets, a.indices, b.offsets, b.indices)
    )


def _dss_worklist_can(a, b, transpose_a=False, transpose_b=False,
                      out_dtype=None, work_budget=None, **kw):
    """Exact-intersection work list for TRACED metadata: wins over the
    masked stream whenever its static step bound (from the nnz hints)
    undercuts the masked kernel's full-row-extent grid."""
    if not _dss_can(a, b, transpose_a=transpose_a, transpose_b=transpose_b,
                    out_dtype=out_dtype):
        return False
    if _concrete(a.offsets, a.indices, b.offsets, b.indices):
        return False  # the planned flat schedule is strictly better
    budget = work_budget if work_budget is not None else bsr_dss.worklist_budget(
        a, b, transpose_a=transpose_a, transpose_b=transpose_b
    )
    if budget is None:
        return False
    bs = a.block_size
    m_blocks = (a.cols if transpose_a else a.rows) // bs
    n_blocks = (b.rows if transpose_b else b.cols) // bs
    row_hint = a.max_col_nnz if transpose_a else a.max_row_nnz
    k_blocks = (a.rows if transpose_a else a.cols) // bs
    masked_steps = m_blocks * n_blocks * (row_hint or k_blocks)
    return budget < masked_steps


registry.register("dss", "pallas_flat_schedule", _dss_flat_can, bsr_flat.dss_flat)
registry.register(
    "dss", "pallas_flat_kcat", _dss_flat_can,
    functools.partial(bsr_flat.dss_flat, kcat=True),
)
registry.register("dss", "pallas_densify_stream", _dss_densify_can, via_dense.dss)
registry.register("dss", "pallas_worklist", _dss_worklist_can, bsr_dss.dss_worklist)
registry.register("dss", "pallas_masked_stream", _dss_can, bsr_dss.dss)


def _dss_small_can(a, b, transpose_a=False, transpose_b=False,
                   out_dtype=None, schedule=None, **kw):
    """Small-block DSS: densify the smaller side (a static nnz choice, like
    ``via_dense.dss``), run the packed small-block kernel on the other.
    Kernel-side conditions delegate to the packed predicates (a
    BlockSparseMatrix exposes ``.shape``, so the dense-operand dimension
    checks read through unchanged)."""
    if (schedule is not None or a.block_size != b.block_size
            or a.block_size not in (16, 32, 64)):
        return False
    if a.nnz <= b.nnz:  # densify a; b rides dds_smallblock
        return _dds_small_can(a, b, transpose_a=transpose_a,
                              transpose_b=transpose_b,
                              out_dtype=out_dtype or a.dtype)
    return _dsd_small_can(a, b, transpose_a=transpose_a,  # densify b
                          transpose_b=transpose_b,
                          out_dtype=out_dtype or a.dtype)


registry.register("dss", "pallas_smallblock", _dss_small_can,
                  via_dense.dss_smallblock)
registry.register("dss", "jnp_fallback", lambda *a, **k: True, reference.dss)


def matmul_dss(
    a: BlockSparseMatrix,
    b: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    **options,
) -> jax.Array:
    """C[M, N] = op(A_sparse) @ op(B_sparse)   (reference ``block/dss/dss.h``)."""
    return registry.dispatch(
        "dss",
        a,
        b,
        transpose_a=transpose_a,
        transpose_b=transpose_b,
        out_dtype=out_dtype,
        **options,
    )


# ---------------------------------------------------------------------------
# SSS: sparse = sparse @ sparse — BEYOND the reference's surface. The
# reference rejects this operand combination outright (no block/sss
# directory; its dispatcher covers six ops). Here the DSS engine computes
# the product through its own registry (exact flat merge via plan_dss, the
# on-device worklist under jit, or the densify detour by density — incl.
# the small-block paths) and the output topology's blocks are gathered in
# one fused XLA pass.
# ---------------------------------------------------------------------------


def _sss_via_dss(a, b, topology, *, transpose_a=False, transpose_b=False,
                 out_dtype=None, **options):
    out_dtype = out_dtype or topology.dtype
    full = matmul_dss(a, b, transpose_a=transpose_a, transpose_b=transpose_b,
                      out_dtype=out_dtype, **options)
    return topology.with_data(reference.extract_blocks(full, topology))


def _sss_can(a, b, topology, transpose_a=False, transpose_b=False,
             out_dtype=None, **kw):
    m_dim = a.cols if transpose_a else a.rows
    n_dim = b.rows if transpose_b else b.cols
    return topology.rows == m_dim and topology.cols == n_dim


def _sss_flat_can(a, b, topology, transpose_a=False, transpose_b=False,
                  out_dtype=None, schedule=None, **kw):
    if not (_sss_can(a, b, topology, transpose_a=transpose_a,
                     transpose_b=transpose_b)
            and a.block_size == b.block_size == topology.block_size
            and _pallas_ok(a, b, topology,
                           dtypes=(a.dtype, b.dtype,
                                   out_dtype or topology.dtype))):
        return False
    if schedule is not None:
        return True
    # Same crossover discipline as the other flat paths: below ~25%
    # topology density the exact intersection beats the dense-product
    # detour; plan on the fly only with concrete metadata.
    return (
        topology.density < 0.25
        and _concrete(a.offsets, a.indices, b.offsets, b.indices,
                      topology.row_indices, topology.indices)
    )


registry.register("sss", "pallas_flat_schedule", _sss_flat_can,
                  bsr_flat.sss_flat)
registry.register(
    "sss", "pallas_flat_kcat", _sss_flat_can,
    functools.partial(bsr_flat.sss_flat, kcat=True),
)
registry.register("sss", "dss_extract", _sss_can, _sss_via_dss)
registry.register("sss", "jnp_fallback", lambda *a, **k: True, reference.sss)


def matmul_sss(
    a: BlockSparseMatrix,
    b: BlockSparseMatrix,
    topology: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    **options,
) -> BlockSparseMatrix:
    """C_sparse = op(A_sparse) @ op(B_sparse) masked to ``topology``.

    No reference analogue — its dispatcher stops at six ops; this completes
    the 2x2x2 operand/output sparsity cube."""
    m_dim = a.cols if transpose_a else a.rows
    k_a = a.rows if transpose_a else a.cols
    k_b = b.cols if transpose_b else b.rows
    n_dim = b.rows if transpose_b else b.cols
    if k_a != k_b:
        raise ValueError(
            f"contraction mismatch: op(A) gives k={k_a}, op(B) gives {k_b}"
        )
    if (topology.rows, topology.cols) != (m_dim, n_dim):
        raise ValueError(
            f"topology is {topology.rows}x{topology.cols}, product is "
            f"{m_dim}x{n_dim}"
        )
    return registry.dispatch(
        "sss", a, b, topology,
        transpose_a=transpose_a, transpose_b=transpose_b,
        out_dtype=out_dtype, **options,
    )


# ---------------------------------------------------------------------------
# Generic entry point
# ---------------------------------------------------------------------------


def matmul(a, b, *, topology: BlockSparseMatrix | None = None, **kw):
    """Type-dispatching matmul: picks the op from operand/output sparsity,
    the way users of the reference pick a header."""
    a_sp = isinstance(a, BlockSparseMatrix)
    b_sp = isinstance(b, BlockSparseMatrix)
    if topology is None:
        if a_sp and b_sp:
            return matmul_dss(a, b, **kw)
        if a_sp:
            return matmul_dsd(a, b, **kw)
        if b_sp:
            return matmul_dds(a, b, **kw)
        return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(
            kw.get("out_dtype") or a.dtype
        )
    if a_sp and b_sp:
        return matmul_sss(a, b, topology, **kw)
    if a_sp:
        return matmul_ssd(a, b, topology, **kw)
    if b_sp:
        return matmul_sds(a, b, topology, **kw)
    return matmul_sdd(a, b, topology, **kw)
