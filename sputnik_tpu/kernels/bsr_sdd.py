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

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
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

__all__ = ["sdd", "sdd_panel", "plan_sdd_panel", "sdd_bres", "plan_sdd_bres", "SDD_BRES_MAX_BYTES"]


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
    **_,
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


# ---------------------------------------------------------------------------
# Panel-resident SDD (round 3): the 0.28-of-SoL fix.
#
# The (nnz, k_tiles) grid above re-fetches BOTH input strips for every
# nonzero block (at d=2048/25% that is ~64 MB of traffic for 18 MB of
# compulsory bytes — the measured 81 us / 0.28). This kernel restructures
# the reference's one-program-per-nonzero-block decomposition
# (``kernel.h:86-90``, ``block_gemm.h:490-498``) around VMEM residency:
#
#   * A is reshaped to expose block rows; a (G, bs, K) ROW-GROUP PANEL
#     stays resident across all blocks of G consecutive block rows
#     (index-map repeat elision): A is fetched once per group, not once
#     per block.
#   * work items are sorted by (row group, column, row), so a column
#     repeated across the group's rows re-uses its (K, bs) B strip via
#     consecutive-step index-map elision;
#   * each item computes its whole output block in ONE full-K MXU dot
#     (no k grid, no accumulator revisit, no flags — the grid is exactly
#     nnz steps) and writes straight to its packed position.
#
# Measured on v5e @ d=2048/25%/bf16: 81 us (above) -> 46 us (G=4) ->
# 38.8 us at G=8 (0.58 of the 22.5 us reuse-aware SoL; ~9 us is fixed
# per-step cost on the 64-step grid).
# ---------------------------------------------------------------------------

_PANEL_BUDGET = 4 << 20  # resident A-panel bytes (x2 for double buffering)


def _pick_group_rows(m_blocks: int, bs: int, k_dim: int, itemsize: int) -> int:
    """Largest divisor of m_blocks whose (G*bs, K) panel fits the budget."""
    cap = max(int(_PANEL_BUDGET // (bs * k_dim * itemsize)), 0)
    if cap < 1:
        return 0  # one row strip doesn't fit; caller falls back
    best = 0
    for g in range(1, m_blocks + 1):
        if m_blocks % g == 0 and g <= cap:
            best = g
    return best


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["g_ids", "c_ids", "r_locs", "positions"],
    meta_fields=["group_rows", "n_steps", "total"],
)
@dataclasses.dataclass(frozen=True)
class SddPanelSchedule:
    """Host-planned work list for :func:`sdd_panel` (pytree; shapes static).

    One work item per nonzero output block, sorted by (row group, column,
    row): ``g_ids`` selects the resident A panel, ``c_ids`` the B column
    strip, ``r_locs`` the row inside the panel, and ``positions`` the
    block's slot in the topology's packed data order.
    """

    g_ids: jax.Array  # (nnz,) int32, non-decreasing
    c_ids: jax.Array  # (nnz,) int32
    r_locs: jax.Array  # (nnz,) int32 (row within the row group)
    positions: jax.Array  # (nnz,) int32
    group_rows: int
    n_steps: int
    total: int


def plan_sdd_panel(
    topology: BlockSparseMatrix,
    k_dim: int,
    *,
    itemsize: int = 2,
) -> SddPanelSchedule | None:
    """Plan the panel-resident SDD work list (host side, concrete metadata).

    Returns None when no valid A row-group panel fits the VMEM budget
    (the k-tiled output-stationary kernel handles that regime).
    """
    if isinstance(topology.row_indices, jax.core.Tracer) or isinstance(
        topology.indices, jax.core.Tracer
    ):
        raise ValueError(
            "plan_sdd_panel needs concrete topology metadata; plan outside "
            "jit (the output-stationary kernel handles traced metadata)"
        )
    bs = topology.block_size
    m_blocks = topology.rows // bs
    G = _pick_group_rows(m_blocks, bs, k_dim, itemsize)
    if G == 0:
        return None
    rows = np.asarray(topology.row_indices, np.int64)
    cols = np.asarray(topology.indices, np.int64)
    nnz = rows.shape[0]
    if nnz == 0:
        return None
    g = rows // G
    order = np.lexsort((rows, cols, g))
    return SddPanelSchedule(
        g_ids=jnp.asarray(g[order].astype(np.int32)),
        c_ids=jnp.asarray(cols[order].astype(np.int32)),
        r_locs=jnp.asarray((rows - g * G)[order].astype(np.int32)),
        positions=jnp.asarray(order.astype(np.int32)),
        group_rows=G,
        n_steps=int(nnz),
        total=int(nnz),
    )


def _sdd_panel_kernel(g_ids, c_ids, r_locs, positions, a_ref, b_ref, out_ref,
                      *, dims):
    del g_ids, c_ids, positions
    j = pl.program_id(0)
    r = r_locs[j]
    a_slice = a_ref[r]
    prod = jax.lax.dot_general(
        a_slice, b_ref[:], dims, preferred_element_type=jnp.float32
    )
    out_ref[0] = prod.astype(out_ref.dtype)


def sdd_panel(
    a: jax.Array,
    b: jax.Array,
    topology: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    schedule: SddPanelSchedule | None = None,
    interpret: bool | None = None,
    **_,
) -> BlockSparseMatrix:
    """Panel-resident C_sparse = op(A) @ op(B) masked to ``topology``."""
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
    if transpose_a:
        # A stored k-minor: the row-group panel cannot be sliced per item
        # without sublane-misaligned dynamic slices or 2x padding (measured
        # dead ends); the k-tiled output-stationary kernel keeps TN/TT.
        raise ValueError("sdd_panel supports transpose_a=False only")
    if schedule is None:
        schedule = plan_sdd_panel(
            topology, k_dim, itemsize=jnp.dtype(a.dtype).itemsize
        )
    if schedule is None:
        raise ValueError("sdd_panel: no A row-group panel fits the VMEM budget")
    G = schedule.group_rows
    m_blocks = m_dim // bs

    # A stored (M, K) -> (m_blocks, bs, K)
    a3 = a.reshape(m_blocks, bs, k_dim)
    a_spec = pl.BlockSpec((G, bs, k_dim), lambda j, g, c, r, o: (g[j], 0, 0))
    if transpose_b:  # B stored (N, K)
        b_spec = pl.BlockSpec((bs, k_dim), lambda j, g, c, r, o: (c[j], 0))
    else:  # B stored (K, N)
        b_spec = pl.BlockSpec((k_dim, bs), lambda j, g, c, r, o: (0, c[j]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(schedule.n_steps,),
        in_specs=[a_spec, b_spec],
        out_specs=pl.BlockSpec(
            (1, bs, bs), lambda j, g, c, r, o: (o[j], 0, 0)
        ),
    )
    data = pl.pallas_call(
        functools.partial(
            _sdd_panel_kernel, dims=dot_dims(transpose_a, transpose_b)
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nnz, bs, bs), out_dtype),
        compiler_params=compiler_params(("arbitrary",)),
        interpret=interpret,
    )(
        schedule.g_ids,
        schedule.c_ids,
        schedule.r_locs,
        schedule.positions,
        a3,
        b,
    )
    return topology.with_data(data)


# ---------------------------------------------------------------------------
# Input-resident SDD ("bres"): both operands live WHOLE in VMEM.
#
# The output-stationary kernel above re-fetches a (bs, K) strip of A and of
# B per nonzero output block: dense traffic = 2 * nnz_blocks * bs * k * isz
# (537 MB at d=4096/25% bf16 — 3.8x the compute-bound time; the measured
# 0.28-of-SoL audit row is that re-stream). When m*k + n*k bytes fit VMEM
# (<= ~96 MB), fetch each operand ONCE through a constant-index BlockSpec
# over its (blocks, bs, k) row-strip reshape and read the strips in-kernel
# by major-dim dynamic index — traffic drops to (m + n) * k * isz and the
# kernel becomes MXU-bound by construction. ``pack`` output blocks of one
# block-row share the A-strip read per step (the same packing as
# ``bsr_small.plan_sdd_smallblock``, at full block size).
# Reference analogue: the persistent-smem output-stationary decomposition
# (``kernel.h:86-90``), scaled to VMEM.
# ---------------------------------------------------------------------------


def plan_sdd_bres(topology: BlockSparseMatrix, pack: int = 4):
    """(rows, cols, src, n_steps): step = up to ``pack`` consecutive nonzero
    output blocks of ONE block-row; ``src[i]`` maps packed output block i to
    its step-major slot (the gather that drops padding). Planned by the
    native toolkit (vectorized numpy fallback) — no per-row Python loop."""
    from sputnik_tpu import native

    rows, cols, src, n_steps = native.pack_rows(
        np.asarray(topology.offsets), np.asarray(topology.indices), pack
    )
    as_i32 = lambda x: jnp.asarray(np.asarray(x, np.int32))
    return as_i32(rows), as_i32(cols), as_i32(src), n_steps


def _sdd_bres_kernel(rows, cols, src, a3_ref, b3_ref, out_ref, *,
                     pack: int, out_dims):
    del src
    j = pl.program_id(0)
    a_strip = a3_ref[rows[j]]  # (bs, k), resident read
    outs = []
    for g in range(pack):
        b_strip = b3_ref[cols[j * pack + g]]  # (bs, k)
        outs.append(jax.lax.dot_general(
            a_strip, b_strip, out_dims, preferred_element_type=jnp.float32,
        ))
    prod = jnp.concatenate(outs, axis=1) if pack > 1 else outs[0]
    out_ref[0] = prod.astype(out_ref.dtype)


# Both resident operands + the packed output must fit beside Mosaic's
# working set (v5e VMEM 128 MB physical).
SDD_BRES_MAX_BYTES = 96 << 20


def sdd_bres(
    a: jax.Array,
    b: jax.Array,
    topology: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    pack: int = 4,
    schedule=None,  # plan_sdd_bres(topology, pack) result
    interpret: bool | None = None,
) -> BlockSparseMatrix:
    """C_sparse = op(A) @ op(B) at ``topology`` with BOTH dense operands
    VMEM-resident (each fetched once).

    Operands are normalized to ROW-strip layout — op(A) rows / op(B)
    columns as (blocks, bs, k) with k minor — so strips are major-dim
    dynamic reads. ``transpose_a=False`` and ``transpose_b=True`` (the
    attention q @ k^T layout) are native; the other orientations pay one
    XLA transpose restage, which the registry's byte-aware ordering (and
    autotune) weighs against the streaming kernels."""
    interpret = use_interpret() if interpret is None else interpret
    out_dtype = out_dtype or topology.dtype
    bs = topology.block_size
    nnz = topology.nnz_blocks
    if nnz == 0:
        return topology
    k_dim = a.shape[0] if transpose_a else a.shape[1]
    if transpose_a:  # A stored (K, M) -> (M, K)
        a = a.T
    if not transpose_b:  # B stored (K, N) -> (N, K)
        b = b.T
    m_dim, n_dim = a.shape[0], b.shape[0]
    rows, cols, src, n_steps = (
        schedule if schedule is not None else plan_sdd_bres(topology, pack)
    )
    a3 = a.reshape(m_dim // bs, bs, k_dim)
    b3 = b.reshape(n_dim // bs, bs, k_dim)
    isz = jnp.dtype(a.dtype).itemsize
    vmem_limit = min(
        120 << 20,
        (m_dim + n_dim) * k_dim * isz
        + 8 * n_steps_bytes(bs, pack)
        + (8 << 20),
    )
    out = pl.pallas_call(
        functools.partial(
            _sdd_bres_kernel, pack=pack,
            out_dims=(((1,), (1,)), ((), ())),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec(a3.shape, lambda j, r_, c_, s_: (0, 0, 0)),
                pl.BlockSpec(b3.shape, lambda j, r_, c_, s_: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, bs, pack * bs), lambda j, r_, c_, s_: (j, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((n_steps, bs, pack * bs), out_dtype),
        compiler_params=compiler_params(
            ("arbitrary",), vmem_limit_bytes=vmem_limit
        ),
        interpret=interpret,
    )(rows, cols, src, a3, b3)
    # Step-major (n_steps, bs, pack*bs) -> packed (nnz, bs, bs): split the
    # lane axis and gather the real slots (pads dropped) — one fused XLA
    # pass (the same epilogue as bsr_small.sdd_smallblock).
    slots = out.reshape(n_steps, bs, pack, bs).transpose(0, 2, 1, 3)
    data = slots.reshape(n_steps * pack, bs, bs)[src]
    return topology.with_data(data)


def n_steps_bytes(bs: int, pack: int) -> int:
    """Per-step output-tile bytes (double-buffered f32 upper bound)."""
    return bs * pack * bs * 4
