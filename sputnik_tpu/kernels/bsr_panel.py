"""Panel-resident BSR SpMM kernels: DSD and DDS with the dense operand
held in VMEM across a whole output panel.

The streamed kernels (``bsr_dsd.py``) re-fetch a (bs, bn) dense tile per
nonzero block — the literal analogue of the reference's gather iterator
(``dependent_tile_access_iterator.h:119-133``), which on a GPU rides the
L2 cache. TPUs have no shared cache below HBM, so that design pays the
dense bytes ``nnz`` times (at d=2048/25%: 32 MB of panel traffic against
8 MB compulsory — bsr_dsd measures 0.59 of SoL, and the DDS mirror's
column-slab fetches are strided on top of that, 0.44).

This module replaces the cache with explicit residency, keeping the
reference's variable-trip-count semantics (``block_gemm.h:129-192``):

  * the DENSE operand is reshaped to expose contraction blocks and a
    FULL-K panel — (k_blocks, bs, bn) — is pinned per output-panel tile
    (its index map depends only on the panel grid dim, so Pallas fetches
    it once per tile and elides it across all sparse-block steps);
  * each work item dynamic-indexes its (bs, bn) contraction slab out of
    the resident panel (leading/middle-dim index only — Mosaic-friendly)
    and feeds one MXU dot;
  * sparse blocks stream in group-major order batched ``group`` per step
    through the flat-schedule machinery (``bsr_flat._batch_items``),
    flag-masking the padding, with the fp32 accumulator revisit pattern
    flushing once per output tile.

Traffic: dense operand once per output-panel tile + sparse blocks once
per tile + output once — vs once per nonzero block for the streamed pair.
Both transpose modes of both ops reuse one kernel body, as in bsr_dsd.

Measured v5e @ d=2048/25%/bf16 (vs the streamed kernels): dsd NN panel
46.7 us vs stream 38.3; dds NN panel 92.7 vs stream 54.5 — the k-minor
("klast") restage dominates, and even the k-major path's per-item slab
reads plus the panel-fetch stall outweigh the traffic saved at this
size. The panel kernels are therefore registered AFTER the streamed
defaults (autotune-selectable; they win when the dense operand is tall
relative to nnz). sdd_panel (bsr_sdd.py), which shares the residency
idea with an output-stationary grid, DOES win: 81 -> 38.8 us.
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
from sputnik_tpu.kernels.bsr_flat import FlatSchedule, _batch_items, _ragged_positions, _stream_np
from sputnik_tpu.kernels.common import cdiv, compiler_params, dot_dims, use_interpret

__all__ = ["dsd_panel", "dds_panel", "plan_stream", "panel_fits"]

_PANEL_BUDGET = 4 << 20  # resident dense-panel bytes (x2 double buffering)
# k-minor layouts additionally hold a k-major restage of the panel in
# scratch (see _panel_kernel), so their panel gets half the budget:
# 2x2 MB buffers + 2 MB stage stays well under the 16 MB VMEM.
_PANEL_BUDGET_STAGED = 2 << 20
_GROUP = 4  # sparse blocks per grid step


def panel_fits(k_dim: int, itemsize: int, lanes: int = 128) -> bool:
    """Can a full-K panel of minimum width fit the (staged) VMEM budget?"""
    return k_dim * lanes * itemsize <= _PANEL_BUDGET_STAGED


def _pick_panel_tile(
    n_dim: int, k_dim: int, itemsize: int, bs: int, staged: bool
) -> int:
    """Largest 128-multiple divisor of n_dim whose (K, bn) panel fits."""
    budget = _PANEL_BUDGET_STAGED if staged else _PANEL_BUDGET
    cap = int(budget // (k_dim * itemsize))
    best = 0
    t = bs
    while t <= n_dim:
        if n_dim % t == 0 and t <= cap:
            best = t
        t += bs
    return best


def plan_stream(
    sparse: BlockSparseMatrix, *, transposed: bool, group: int = _GROUP
) -> FlatSchedule:
    """Batch the sparse operand's group-major block stream for the panel
    kernels (concrete metadata required; the streamed kernels cover traced
    metadata)."""
    offs, dep, data = _stream_np(sparse, transposed)
    counts = offs[1:] - offs[:-1]
    total = int(counts.sum())
    unvisited = np.nonzero(counts == 0)[0].astype(np.int32)
    out_ids = np.repeat(np.arange(len(counts), dtype=np.int32), counts)
    pos = _ragged_positions(offs[:-1], counts)
    return _batch_items(
        out_ids,
        (dep[pos], data[pos], np.zeros_like(out_ids)),
        group,
        "stream",
        total,
        unvisited,
    )


def _panel_kernel(
    out_ids, dep_ids, data_ids, flags,
    *refs,  # group block refs, panel ref, out ref, acc ref [, stage ref]
    group: int,
    n_steps: int,
    dims,
    block_first: bool,
    panel_layout: str,  # "kfirst" (k_blocks, bs, bn) | "klast" (bn, k_blocks, bs)
    k_blocks: int,
):
    block_refs = refs[:group]
    panel_ref = refs[group]
    out_ref = refs[group + 1]
    acc_ref = refs[group + 2]
    j = pl.program_id(1)

    if panel_layout == "klast":
        # Mosaic cannot dynamic-slice one sublane of a (x, k_blocks, bs)
        # panel (k-minor storage); restage the panel k-major into scratch
        # ONCE per output-panel tile (static slices, ~2 us for a 4 MB
        # panel) so items use supported leading-dim indexing.
        stage_ref = refs[group + 3]

        @pl.when(j == 0)
        def _():
            for kk in range(k_blocks):
                stage_ref[kk] = panel_ref[:, kk, :]

        def get_panel(k):
            return stage_ref[k]
    else:
        def get_panel(k):
            return panel_ref[k]

    cur = out_ids[j]
    prev = out_ids[jnp.maximum(j - 1, 0)]
    nxt = out_ids[jnp.minimum(j + 1, n_steps - 1)]
    is_first = jnp.logical_or(j == 0, prev != cur)
    is_last = jnp.logical_or(j == n_steps - 1, nxt != cur)

    @pl.when(is_first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    accum = jnp.zeros(acc_ref.shape, jnp.float32)
    for g in range(group):
        k = dep_ids[j * group + g]
        panel = get_panel(k)
        block = block_refs[g][0]
        lhs, rhs = (block, panel) if block_first else (panel, block)
        prod = jax.lax.dot_general(
            lhs, rhs, dims, preferred_element_type=jnp.float32
        )
        accum = accum + jnp.where(
            flags[j * group + g] > 0, prod, jnp.zeros_like(prod)
        )
    acc_ref[:] += accum

    @pl.when(is_last)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _panel_call(
    *,
    schedule: FlatSchedule,
    sparse_data,
    panel3,  # dense operand reshaped to expose contraction blocks
    panel_block,  # VMEM block shape of the resident panel
    panel_index,  # p -> panel block index tuple
    panel_layout: str,
    out_rows: int,
    out_cols: int,
    out_block,
    out_index,  # (p, out_id) -> output block index
    panel_tiles: int,
    dims,
    block_first: bool,
    out_dtype,
    interpret: bool,
):
    group = schedule.group
    bs = sparse_data.shape[-1]
    k_blocks = (
        panel_block[1] if panel_layout == "klast" else panel_block[0]
    )

    def block_map(g):
        return lambda p, j, out, dep, dat, fl: (dat[j * group + g], 0, 0)

    scratch = [pltpu.VMEM(out_block, jnp.float32)]
    if panel_layout == "klast":
        # k-major restage of the resident panel (see _panel_kernel).
        scratch.append(
            pltpu.VMEM((k_blocks, panel_block[0], bs), panel3.dtype)
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(panel_tiles, schedule.n_steps),
        in_specs=[
            *[pl.BlockSpec((1, bs, bs), block_map(g)) for g in range(group)],
            pl.BlockSpec(
                panel_block, lambda p, j, out, dep, dat, fl: panel_index(p)
            ),
        ],
        out_specs=pl.BlockSpec(
            out_block, lambda p, j, out, dep, dat, fl: out_index(p, out[j])
        ),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        functools.partial(
            _panel_kernel,
            group=group,
            n_steps=schedule.n_steps,
            dims=dims,
            block_first=block_first,
            panel_layout=panel_layout,
            k_blocks=k_blocks,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, out_cols), out_dtype),
        compiler_params=compiler_params(("parallel", "arbitrary")),
        interpret=interpret,
    )(
        schedule.out_ids,
        schedule.dep_ids,
        schedule.data_ids,
        schedule.flags,
        *([sparse_data] * group),
        panel3,
    )


def dsd_panel(
    a: BlockSparseMatrix,
    b: jax.Array,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    schedule: FlatSchedule | None = None,
    interpret: bool | None = None,
    **_,
) -> jax.Array:
    """C[M, N] = op(A_sparse) @ op(B_dense), B panel-resident."""
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
    if schedule is None:
        schedule = plan_stream(a, transposed=transpose_a)
    bn = _pick_panel_tile(
        n_dim, k_dim, jnp.dtype(b.dtype).itemsize, bs, staged=transpose_b
    )
    if bn == 0:
        raise ValueError("dsd_panel: no panel tile fits the VMEM budget")
    k_blocks = k_dim // bs
    if transpose_b:  # B stored (N, K) -> (bn-tiles of N, k_blocks, bs)
        panel3 = b.reshape(n_dim, k_blocks, bs)
        panel_block, panel_layout = (bn, k_blocks, bs), "klast"
        panel_index = lambda p: (p, 0, 0)
    else:  # B stored (K, N) -> (k_blocks, bs, N)
        panel3 = b.reshape(k_blocks, bs, n_dim)
        panel_block, panel_layout = (k_blocks, bs, bn), "kfirst"
        panel_index = lambda p: (0, 0, p)
    group_offsets = (
        a.with_transpose_metadata().offsets_t if transpose_a else a.offsets
    )
    min_hint = a.min_col_nnz if transpose_a else a.min_row_nnz
    out = _panel_call(
        schedule=schedule,
        sparse_data=a.data,
        panel3=panel3,
        panel_block=panel_block,
        panel_index=panel_index,
        panel_layout=panel_layout,
        out_rows=m_dim,
        out_cols=n_dim,
        out_block=(bs, bn),
        out_index=lambda p, out_id: (out_id, p),
        panel_tiles=cdiv(n_dim, bn),
        dims=dot_dims(transpose_a, transpose_b),
        block_first=True,
        out_dtype=out_dtype,
        interpret=interpret,
    )
    return _mask_empty_groups(out, group_offsets, bs, axis=0, min_hint=min_hint)


def dds_panel(
    a: jax.Array,
    b: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    schedule: FlatSchedule | None = None,
    interpret: bool | None = None,
    **_,
) -> jax.Array:
    """C[M, N] = op(A_dense) @ op(B_sparse), A panel-resident.

    Fixes the streamed mirror's strided column-slab DMAs: the resident
    (bm, K) row panel of A is CONTIGUOUS rows, fetched once per output
    panel tile instead of one strided (bm, bs) slab per nonzero block.
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
    if schedule is None:
        schedule = plan_stream(b, transposed=not transpose_b)
    bm = _pick_panel_tile(
        m_dim, k_dim, jnp.dtype(a.dtype).itemsize, bs, staged=not transpose_a
    )
    if bm == 0:
        raise ValueError("dds_panel: no panel tile fits the VMEM budget")
    k_blocks = k_dim // bs
    if transpose_a:  # A stored (K, M) -> (k_blocks, bs, M)
        panel3 = a.reshape(k_blocks, bs, m_dim)
        panel_block, panel_layout = (k_blocks, bs, bm), "kfirst"
        panel_index = lambda p: (0, 0, p)
    else:  # A stored (M, K) -> (M, k_blocks, bs)
        panel3 = a.reshape(m_dim, k_blocks, bs)
        panel_block, panel_layout = (bm, k_blocks, bs), "klast"
        panel_index = lambda p: (p, 0, 0)
    group_offsets = (
        b.offsets if transpose_b else b.with_transpose_metadata().offsets_t
    )
    min_hint = b.min_row_nnz if transpose_b else b.min_col_nnz
    out = _panel_call(
        schedule=schedule,
        sparse_data=b.data,
        panel3=panel3,
        panel_block=panel_block,
        panel_index=panel_index,
        panel_layout=panel_layout,
        out_rows=m_dim,
        out_cols=n_dim,
        out_block=(bm, bs),
        out_index=lambda p, out_id: (p, out_id),
        panel_tiles=cdiv(m_dim, bm),
        dims=dot_dims(transpose_a, transpose_b),
        block_first=False,
        out_dtype=out_dtype,
        interpret=interpret,
    )
    return _mask_empty_groups(out, group_offsets, bs, axis=1, min_hint=min_hint)
