"""Exact work-list ("flat schedule") Pallas kernels for SSD / SDS / DSS.

The direct output-stationary kernels (``bsr_ssd.py``, ``bsr_dss.py``) bound
their per-output-tile trip count by the *worst* row extent and mask the
excess steps — correct, but at uneven sparsity a large fraction of grid
steps fetch tiles only to multiply them by zero. The reference has the same
structural problem and solves it with data-dependent trip counts read from
metadata inside the kernel (``block_gemm.h:129-192`` ``StepsK()``,
``index_merge.h:163-169`` popcount); XLA's static grids rule that out.

The TPU-native answer: precompute the EXACT flattened work list once, at
plan time, on the host —

    work item  =  (output block, sparse operand block, dense/k tile)

ordered by output block — and stream it over a 1-D grid: the accumulator
carries partial sums across consecutive items of one output block and
flushes on the last. Work items are batched ``group`` (default 4) per grid
step — each step fetches ``group`` blocks + ``group`` panels through
separate block specs and issues ``group`` MXU dots — which amortizes the
fixed per-step cost (~230 ns on v5e) over 4x the work (measured 1.5x).
Groups are padded to a multiple of ``group`` with flag-0 duplicates of the
last item (the fetch is cached, the contribution masked to zero).

This is the analogue of the reference's ``MatmulEx`` / pre-built-metadata
discipline (``block/dsd/dsd.cu:20-27``: build buffers once, skip on the hot
path) — and of its DSS "TODO: cache" bitmask wart
(``dss_*_tn_align8.cu:99-110``), fixed by construction: the intersection is
merged once per topology pair instead of per call per threadblock.

Plan with :func:`plan_sparse_out` / :func:`plan_dss` OUTSIDE jit (metadata
must be concrete; inside jit the arrays are tracers and there is no static
work count — the masked-step kernels remain the fallback there). The
returned :class:`FlatSchedule` is a pytree: pass it through jit boundaries
freely; only its shapes must stay fixed, its contents may be device arrays.
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
from sputnik_tpu.kernels.common import compiler_params, dot_dims, use_interpret

__all__ = [
    "FlatSchedule",
    "plan_sparse_out",
    "plan_dss",
    "ssd_flat",
    "sds_flat",
    "dss_flat",
]

DEFAULT_GROUP = 4  # work items per grid step (measured best on v5e)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "out_ids", "dep_ids", "data_ids", "other_ids", "flags",
        "unvisited_ids", "slab_ids",
    ],
    meta_fields=["kind", "total", "group", "n_steps", "all_visited", "slab"],
)
@dataclasses.dataclass(frozen=True)
class FlatSchedule:
    """Flattened matmul work list (pytree; shapes static, contents arrays).

    ``out_ids`` is PER STEP (length ``n_steps``, non-decreasing); the
    sub-item arrays (``dep_ids/data_ids/other_ids/flags``) have length
    ``n_steps * group``. ``data_ids`` index the sparse stream operand's
    physical blocks; ``dep_ids`` are contraction-dimension block ids
    (SSD/SDS) or the second operand's physical blocks (DSS); ``other_ids``
    carry the output block's other coordinate. ``flags`` mask group-padding
    duplicates. ``unvisited_ids`` lists output blocks with no work (zeroed
    after the kernel) — a DATA field: for sparse DSS outputs most tiles are
    unvisited and a static tuple would be hashed on every trace.
    ``total`` counts REAL work items (for flop accounting).
    """

    out_ids: jax.Array  # (n_steps,) int32, non-decreasing
    dep_ids: jax.Array  # (n_steps * group,) int32
    data_ids: jax.Array  # (n_steps * group,) int32
    other_ids: jax.Array  # (n_steps * group,) int32
    flags: jax.Array  # (n_steps * group,) int32 in {0, 1}
    unvisited_ids: jax.Array  # (n_unvisited,) int32 output-block ids
    slab_ids: jax.Array  # (n_steps,) stream slab block index (slab mode)
    kind: str  # "ssd" | "sds" | "dss"
    total: int  # real (unpadded) work items
    group: int
    n_steps: int
    all_visited: bool
    slab: bool  # stream blocks fetched as one contiguous (group,bs,bs) DMA


def _np(x, what: str) -> np.ndarray:
    if isinstance(x, jax.core.Tracer):
        raise ValueError(
            f"flat-schedule planning needs concrete {what}; call plan_* "
            "outside jit (the masked-step kernels handle traced metadata)"
        )
    return np.asarray(x)


def _stream_np(stream: BlockSparseMatrix, transposed: bool):
    """(offsets, dep, data) of the stream operand in group-major order, np."""
    if transposed:
        m = stream.with_transpose_metadata()
        offs = _np(m.offsets_t, "transpose metadata")
        data = _np(m.block_offsets, "transpose metadata")
        dep = _np(m.indices_t, "transpose metadata")
    else:
        offs = _np(stream.offsets, "offsets")
        dep = _np(stream.indices, "indices")
        data = np.arange(stream.nnz_blocks, dtype=np.int32)
    return offs, dep.astype(np.int32), data.astype(np.int32)


def _ragged_positions(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenate [starts[i], starts[i]+counts[i]) ranges (vectorized)."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros((0,), np.int32)
    cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return (
        np.arange(total, dtype=np.int64)
        - np.repeat(cum, counts)
        + np.repeat(starts.astype(np.int64), counts)
    ).astype(np.int32)


def _batch_items(
    out_ids: np.ndarray,
    sub_arrays,
    group: int,
    kind: str,
    total: int,
    unvisited: np.ndarray,
) -> FlatSchedule:
    """Group consecutive same-output items ``group`` per step; pad each
    output block's run with flag-0 duplicates of its last item."""
    unvisited = np.asarray(unvisited, np.int32)
    if total == 0:
        z = jnp.zeros((0,), jnp.int32)
        return FlatSchedule(
            out_ids=z, dep_ids=z, data_ids=z, other_ids=z, flags=z,
            unvisited_ids=jnp.asarray(unvisited), slab_ids=z,
            kind=kind, total=0, group=group, n_steps=0,
            all_visited=unvisited.size == 0, slab=False,
        )
    uniq, counts = np.unique(out_ids, return_counts=True)
    # Adaptive group: batching only pays when output blocks average at
    # least ~group items; otherwise the padding duplicates dominate
    # (e.g. DSS intersections at moderate density average 1 item/tile).
    avg = total / max(len(uniq), 1)
    group = max(1, min(group, int(round(avg))))
    padded = (-(-counts // group)) * group
    total_p = int(padded.sum())
    cum_items = np.concatenate([[0], np.cumsum(counts)[:-1]])
    cum_p = np.concatenate([[0], np.cumsum(padded)[:-1]])
    local = np.arange(total_p, dtype=np.int64) - np.repeat(cum_p, padded)
    orig_local = np.minimum(local, np.repeat(counts, padded) - 1)
    item = np.repeat(cum_items, padded) + orig_local
    flags = (local < np.repeat(counts, padded)).astype(np.int32)
    step_out = np.repeat(uniq, padded // group).astype(np.int32)
    dep, data, other = (np.asarray(s)[item].astype(np.int32) for s in sub_arrays)
    return FlatSchedule(
        out_ids=jnp.asarray(step_out),
        dep_ids=jnp.asarray(dep),
        data_ids=jnp.asarray(data),
        other_ids=jnp.asarray(other),
        flags=jnp.asarray(flags),
        unvisited_ids=jnp.asarray(unvisited),
        slab_ids=jnp.zeros((0,), jnp.int32),
        kind=kind,
        total=total,
        group=group,
        n_steps=len(step_out),
        all_visited=unvisited.size == 0,
        slab=False,
    )


def plan_sparse_out(
    stream: BlockSparseMatrix,
    topology: BlockSparseMatrix,
    *,
    kind: str,  # "ssd" (stream = A, grouped by out row) | "sds" (stream = B)
    stream_transposed: bool,
    group: int = DEFAULT_GROUP,
    slab: bool = False,
) -> FlatSchedule:
    """Exact schedule for a sparse-output matmul with one sparse operand.

    For each output block (in topology order) enumerate the stream
    operand's blocks in that output block's group (row for SSD, column for
    SDS) — the host-side equivalent of the reference kernel's per-tile
    ``offsets[m], offsets[m+1]`` reads (``block_gemm.h:129-137``).

    ``slab=True`` (natural-order streams only, where a group's blocks are
    physically consecutive): each step's stream blocks come from ONE
    group-aligned contiguous (group, bs, bs) slab — one DMA instead of
    ``group`` — padding the run out to slab boundaries with flag-0 slots.
    """
    offs, dep, data = _stream_np(stream, stream_transposed)
    if kind == "ssd":
        group_of = _np(topology.row_indices, "topology.row_indices")
        other_of = _np(topology.indices, "topology.indices")
    elif kind == "sds":
        group_of = _np(topology.indices, "topology.indices")
        other_of = _np(topology.row_indices, "topology.row_indices")
    else:
        raise ValueError(f"kind must be 'ssd' or 'sds', got {kind!r}")

    counts = (offs[1:] - offs[:-1])[group_of]
    total = int(counts.sum())
    unvisited = np.nonzero(counts == 0)[0].astype(np.int32)
    if slab:
        if stream_transposed:
            raise ValueError("slab schedules need a natural-order stream")
        g = group
        starts, ends = offs[group_of], offs[group_of] + counts
        a_starts = (starts // g) * g
        a_ends = -(-ends // g) * g
        spans = np.maximum(a_ends - a_starts, 0)
        n_sub = spans // g  # slabs per output block
        step_out = np.repeat(
            np.arange(len(group_of), dtype=np.int32), n_sub
        )
        slab_ids = (
            _ragged_positions(a_starts // g, n_sub)
        )
        # Per-slot stream positions (clamped into range for dep lookups).
        pos = (
            np.repeat(slab_ids.astype(np.int64), g) * g
            + np.tile(np.arange(g, dtype=np.int64), len(slab_ids))
        )
        flags = (
            (pos >= np.repeat(starts, n_sub * g))
            & (pos < np.repeat(ends, n_sub * g))
        ).astype(np.int32)
        pos_c = np.clip(pos, 0, max(len(dep) - 1, 0))
        out_rep = np.repeat(step_out, g)
        return FlatSchedule(
            out_ids=jnp.asarray(step_out),
            dep_ids=jnp.asarray(dep[pos_c].astype(np.int32)),
            data_ids=jnp.asarray(pos_c.astype(np.int32)),
            other_ids=jnp.asarray(other_of[out_rep].astype(np.int32)),
            flags=jnp.asarray(flags),
            unvisited_ids=jnp.asarray(unvisited),
            slab_ids=jnp.asarray(slab_ids.astype(np.int32)),
            kind=kind,
            total=total,
            group=g,
            n_steps=len(step_out),
            all_visited=unvisited.size == 0,
            slab=True,
        )
    out_ids = np.repeat(np.arange(len(group_of), dtype=np.int32), counts)
    pos = _ragged_positions(offs[group_of], counts)
    return _batch_items(
        out_ids,
        (dep[pos], data[pos], other_of[out_ids]),
        group,
        kind,
        total,
        unvisited,
    )


def plan_dss(
    a: BlockSparseMatrix,
    b: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    group: int = DEFAULT_GROUP,
) -> FlatSchedule:
    """Exact intersection schedule for dense = sparse @ sparse.

    The host-side replacement for the reference's in-kernel ``IndexMerge``
    (bitmask AND + popcount-ranked smem scatter, ``index_merge.h:90-227``):
    for every output tile (m, n), the work items are the k-blocks present in
    BOTH op(A) row m and op(B) column n. Merged once per operand pair; the
    reference rebuilds its bitmasks every call ("TODO: cache").
    No k <= 32768 limit (int32 ids vs the reference's uint8 smem offsets).
    """
    a_offs, a_dep, a_data = _stream_np(a, transpose_a)
    # op(B) iterated k-major: natural order when B is (K, N), transposed
    # metadata when op(B) = B^T (mirrors dss_test.cu:215-218's buffer rule).
    b_offs, b_dep, b_data = _stream_np(b, transpose_b)

    n_blocks = (b.rows if transpose_b else b.cols) // b.block_size
    m_blocks = len(a_offs) - 1
    outs, aposs, bposs = [], [], []
    for m in range(m_blocks):
        ks = a_dep[a_offs[m] : a_offs[m + 1]]
        apos_m = a_data[a_offs[m] : a_offs[m + 1]]
        bcounts = b_offs[ks + 1] - b_offs[ks]
        if bcounts.sum() == 0:
            continue
        pos = _ragged_positions(b_offs[ks], bcounts)
        ns = b_dep[pos]
        order = np.argsort(ns, kind="stable")
        outs.append(m * n_blocks + ns[order])
        aposs.append(np.repeat(apos_m, bcounts)[order])
        bposs.append(b_data[pos][order])

    if outs:
        out_ids = np.concatenate(outs).astype(np.int32)
        a_ids = np.concatenate(aposs).astype(np.int32)
        b_ids = np.concatenate(bposs).astype(np.int32)
    else:
        out_ids = a_ids = b_ids = np.zeros((0,), np.int32)
    n_tiles = m_blocks * n_blocks
    visited = np.zeros((n_tiles,), bool)
    visited[out_ids] = True
    unvisited = np.nonzero(~visited)[0].astype(np.int32)
    return _batch_items(
        out_ids,
        (b_ids, a_ids, np.zeros_like(out_ids)),  # dep = B blocks, data = A
        group,
        "dss",
        int(out_ids.shape[0]),
        unvisited,
    )


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _flat_kernel(
    out_ids,  # scalar prefetch: (n_steps,)
    dep_ids,  # (n_steps * group,)
    data_ids,
    other_ids,
    flags,
    slab_ids,  # (n_steps,) in slab mode, dummy otherwise
    *refs,  # stream refs (group, or 1 slab), group panel refs, out_ref, acc_ref
    group: int,
    n_steps: int,
    dims,
    block_first: bool,
    panel_is_block: bool,
    out_is_block: bool,
    slab: bool = False,
    kcat: bool = False,
):
    del dep_ids, data_ids, other_ids, slab_ids
    if slab:
        slab_ref = refs[0]
        get_block = lambda g: slab_ref[g]  # one (group,bs,bs) slab DMA
        panels = refs[1 : 1 + group]
        out_ref = refs[1 + group]
        acc_ref = refs[2 + group]
    else:
        stream_refs = refs[:group]
        get_block = lambda g: stream_refs[g][0]
        panels = refs[group : 2 * group]
        out_ref = refs[2 * group]
        acc_ref = refs[2 * group + 1]
    j = pl.program_id(0)
    cur = out_ids[j]
    prev = out_ids[jnp.maximum(j - 1, 0)]
    nxt = out_ids[jnp.minimum(j + 1, n_steps - 1)]
    is_first = jnp.logical_or(j == 0, prev != cur)
    is_last = jnp.logical_or(j == n_steps - 1, nxt != cur)

    @pl.when(is_first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if kcat and group > 1:
        # ONE dot of contraction depth group*bs: [B0 B1] @ [P0; P1] =
        # B0@P0 + B1@P1 once the padding slots' stream blocks are zeroed
        # (zeroing one operand kills the product) — same per-dot-MXU-cost
        # attack as bsr_qstream's accum="kcat".
        blocks, panel_list = [], []
        for g in range(group):
            block = get_block(g)
            live = (flags[j * group + g] > 0).astype(block.dtype)
            blocks.append(block * live)
            panel_list.append(panels[g][0] if panel_is_block else panels[g][:])
        lhs_parts, rhs_parts = (
            (blocks, panel_list) if block_first else (panel_list, blocks)
        )
        lhs = jnp.concatenate(lhs_parts, axis=dims[0][0][0])
        rhs = jnp.concatenate(rhs_parts, axis=dims[0][1][0])
        accum = jax.lax.dot_general(
            lhs, rhs, dims, preferred_element_type=jnp.float32
        )
    else:
        accum = jnp.zeros(acc_ref.shape, jnp.float32)
        for g in range(group):
            block = get_block(g)
            panel = panels[g][0] if panel_is_block else panels[g][:]
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
        if out_is_block:
            out_ref[0] = acc_ref[:].astype(out_ref.dtype)
        else:
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _zero_unvisited_blocks(data, schedule: FlatSchedule):
    if schedule.all_visited:
        return data
    return data.at[schedule.unvisited_ids].set(0)


def _flat_call(
    *,
    schedule: FlatSchedule,
    stream_data,
    panel_operand,  # dense panel array OR sparse block data (dss)
    panel_index,  # (k, other) -> dense block index; None for dss
    out_shape,
    out_block,
    out_index,
    dims,
    block_first: bool,
    panel_is_block: bool,
    out_is_block: bool,
    bs: int,
    interpret: bool,
    kcat: bool = False,
):
    group = schedule.group

    def block_map(g):
        return lambda j, out, dep, dat, oth, fl, sl: (dat[j * group + g], 0, 0)

    def panel_map(g):
        if panel_is_block:
            return lambda j, out, dep, dat, oth, fl, sl: (
                dep[j * group + g], 0, 0
            )
        return lambda j, out, dep, dat, oth, fl, sl: panel_index(
            dep[j * group + g], oth[j * group + g]
        )

    if schedule.slab:
        stream_specs = [
            pl.BlockSpec(
                (group, bs, bs),
                lambda j, out, dep, dat, oth, fl, sl: (sl[j], 0, 0),
            )
        ]
        stream_args = [stream_data]
        slab_ids = schedule.slab_ids
    else:
        stream_specs = [
            pl.BlockSpec((1, bs, bs), block_map(g)) for g in range(group)
        ]
        stream_args = [stream_data] * group
        slab_ids = jnp.zeros((1,), jnp.int32)  # dummy, never indexed
    in_specs = stream_specs + [
        pl.BlockSpec(
            (1, bs, bs) if panel_is_block else (bs, bs), panel_map(g)
        )
        for g in range(group)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(schedule.n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(out_block, out_index),
        scratch_shapes=[
            pltpu.VMEM((bs, bs), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _flat_kernel,
            group=group,
            n_steps=schedule.n_steps,
            dims=dims,
            block_first=block_first,
            panel_is_block=panel_is_block,
            out_is_block=out_is_block,
            slab=schedule.slab,
            kcat=kcat,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=compiler_params(("arbitrary",)),
        interpret=interpret,
    )(
        schedule.out_ids,
        schedule.dep_ids,
        schedule.data_ids,
        schedule.other_ids,
        schedule.flags,
        slab_ids,
        *stream_args,
        *([panel_operand] * group),
    )


def _flat_sparse_out_call(
    *,
    schedule: FlatSchedule,
    stream_data,
    panel,
    panel_index,
    topology: BlockSparseMatrix,
    dims,
    block_first: bool,
    out_dtype,
    interpret: bool,
    kcat: bool = False,
):
    bs = topology.block_size
    nnz_c = topology.nnz_blocks
    if nnz_c == 0 or schedule.n_steps == 0:
        return topology.with_data(jnp.zeros((nnz_c, bs, bs), out_dtype))
    data = _flat_call(
        schedule=schedule,
        stream_data=stream_data,
        panel_operand=panel,
        panel_index=panel_index,
        out_shape=jax.ShapeDtypeStruct((nnz_c, bs, bs), out_dtype),
        out_block=(1, bs, bs),
        out_index=lambda j, out, dep, dat, oth, fl, sl: (out[j], 0, 0),
        dims=dims,
        block_first=block_first,
        panel_is_block=False,
        out_is_block=True,
        bs=bs,
        interpret=interpret,
        kcat=kcat,
    )
    return topology.with_data(_zero_unvisited_blocks(data, schedule))


def ssd_flat(
    a: BlockSparseMatrix,
    b: jax.Array,
    topology: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    schedule: FlatSchedule | None = None,
    interpret: bool | None = None,
    kcat: bool = False,
    **_,
) -> BlockSparseMatrix:
    """C_sparse = op(A_sparse) @ op(B_dense) via an exact work list."""
    interpret = use_interpret() if interpret is None else interpret
    out_dtype = out_dtype or topology.dtype
    if schedule is None:
        schedule = plan_sparse_out(
            a, topology, kind="ssd", stream_transposed=transpose_a
        )
    if schedule.kind != "ssd":
        raise ValueError(f"schedule kind {schedule.kind!r} != 'ssd'")
    if transpose_b:  # B stored (N, K)
        panel_index = lambda k, other: (other, k)
    else:  # B stored (K, N)
        panel_index = lambda k, other: (k, other)
    return _flat_sparse_out_call(
        schedule=schedule,
        stream_data=a.data,
        panel=b,
        panel_index=panel_index,
        topology=topology,
        dims=dot_dims(transpose_a, transpose_b),
        block_first=True,
        out_dtype=out_dtype,
        interpret=interpret,
        kcat=kcat,
    )


def sds_flat(
    a: jax.Array,
    b: BlockSparseMatrix,
    topology: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    schedule: FlatSchedule | None = None,
    interpret: bool | None = None,
    kcat: bool = False,
    **_,
) -> BlockSparseMatrix:
    """C_sparse = op(A_dense) @ op(B_sparse) via an exact work list."""
    interpret = use_interpret() if interpret is None else interpret
    out_dtype = out_dtype or topology.dtype
    if schedule is None:
        # B streams grouped by op(B) column = output column; non-transposed
        # B therefore iterates through its transpose metadata.
        schedule = plan_sparse_out(
            b, topology, kind="sds", stream_transposed=not transpose_b
        )
    if schedule.kind != "sds":
        raise ValueError(f"schedule kind {schedule.kind!r} != 'sds'")
    if transpose_a:  # A stored (K, M)
        panel_index = lambda k, other: (k, other)
    else:  # A stored (M, K)
        panel_index = lambda k, other: (other, k)
    return _flat_sparse_out_call(
        schedule=schedule,
        stream_data=b.data,
        panel=a,
        panel_index=panel_index,
        topology=topology,
        dims=dot_dims(transpose_a, transpose_b),
        block_first=False,
        out_dtype=out_dtype,
        interpret=interpret,
        kcat=kcat,
    )


def dss_flat(
    a: BlockSparseMatrix,
    b: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    schedule: FlatSchedule | None = None,
    interpret: bool | None = None,
    kcat: bool = False,
    **_,
) -> jax.Array:
    """C[M, N] = op(A_sparse) @ op(B_sparse) via the exact merged work list."""
    interpret = use_interpret() if interpret is None else interpret
    out_dtype = out_dtype or a.dtype
    bs = a.block_size
    if b.block_size != bs:
        raise ValueError(f"block size mismatch: {bs} vs {b.block_size}")
    m_dim = a.cols if transpose_a else a.rows
    n_dim = b.rows if transpose_b else b.cols
    if schedule is None:
        schedule = plan_dss(a, b, transpose_a=transpose_a, transpose_b=transpose_b)
    if schedule.kind != "dss":
        raise ValueError(f"schedule kind {schedule.kind!r} != 'dss'")

    n_blocks = n_dim // bs
    m_blocks = m_dim // bs
    if schedule.n_steps == 0:
        return jnp.zeros((m_dim, n_dim), out_dtype)

    out = _flat_call(
        schedule=schedule,
        stream_data=a.data,
        panel_operand=b.data,
        panel_index=None,
        out_shape=jax.ShapeDtypeStruct((m_dim, n_dim), out_dtype),
        out_block=(bs, bs),
        out_index=lambda j, out_, dep, dat, oth, fl, sl: (
            out_[j] // n_blocks,
            out_[j] % n_blocks,
        ),
        dims=dot_dims(transpose_a, transpose_b),
        block_first=True,
        panel_is_block=True,
        out_is_block=False,
        bs=bs,
        interpret=interpret,
        kcat=kcat,
    )
    if not schedule.all_visited:
        flat = jnp.ones((m_blocks * n_blocks,), jnp.bool_)
        flat = flat.at[schedule.unvisited_ids].set(False)
        mask = jnp.repeat(
            jnp.repeat(flat.reshape(m_blocks, n_blocks), bs, 0), bs, 1
        )
        out = jnp.where(mask, out, jnp.zeros([], out_dtype))
    return out


def plan_sss(
    a: BlockSparseMatrix,
    b: BlockSparseMatrix,
    topology: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    group: int = DEFAULT_GROUP,
) -> FlatSchedule:
    """Exact schedule for sparse = sparse @ sparse (no reference analogue;
    its IndexMerge stops at dense outputs, ``index_merge.h:90-227``).

    For each topology block ``t = (m, n)`` the work items are the k-blocks
    present in BOTH op(A) row ``m`` and op(B) column ``n`` — op(A)'s row
    stream intersected against op(B)'s dense position map, fully
    vectorized on the host. Output blocks with an empty intersection are
    zeroed after the kernel (``unvisited_ids``)."""
    a_offs, a_dep, a_data = _stream_np(a, transpose_a)
    pos_b = _np(b.position_map(), "b.position_map")  # B data index or -1
    if not transpose_b:
        pos_kn = pos_b  # op(B) = B stored (K, N)
    else:
        pos_kn = pos_b.T  # op(B) = B^T: (k, n) block lives at B (n, k)
    t_rows = _np(topology.row_indices, "topology.row_indices")
    t_cols = _np(topology.indices, "topology.indices")
    nnz_c = topology.nnz_blocks

    counts = (a_offs[1:] - a_offs[:-1])[t_rows]
    pos = _ragged_positions(a_offs[t_rows], counts)  # per-item A stream pos
    item_out = np.repeat(np.arange(nnz_c, dtype=np.int64), counts)
    ks = a_dep[pos]
    b_pos = pos_kn[ks, t_cols[item_out]]
    sel = b_pos >= 0
    out_ids = item_out[sel].astype(np.int32)
    a_ids = a_data[pos][sel].astype(np.int32)
    b_ids = b_pos[sel].astype(np.int32)
    visited = np.zeros((nnz_c,), bool)
    visited[out_ids] = True
    unvisited = np.nonzero(~visited)[0].astype(np.int32)
    return _batch_items(
        out_ids,
        (b_ids, a_ids, np.zeros_like(out_ids)),  # dep = B blocks, data = A
        group,
        "sss",
        int(out_ids.shape[0]),
        unvisited,
    )


def sss_flat(
    a: BlockSparseMatrix,
    b: BlockSparseMatrix,
    topology: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    schedule: FlatSchedule | None = None,
    interpret: bool | None = None,
    kcat: bool = False,
    **_,
) -> BlockSparseMatrix:
    """C_sparse = op(A_sparse) @ op(B_sparse) masked to ``topology`` via the
    exact intersection work list — compute and bytes proportional to the
    REAL work, unlike the dense-product detour."""
    interpret = use_interpret() if interpret is None else interpret
    out_dtype = out_dtype or topology.dtype
    bs = topology.block_size
    if a.block_size != bs or b.block_size != bs:
        raise ValueError(
            f"block size mismatch: {a.block_size}/{b.block_size} vs {bs}")
    nnz_c = topology.nnz_blocks
    if schedule is None:
        schedule = plan_sss(a, b, topology, transpose_a=transpose_a,
                            transpose_b=transpose_b)
    if schedule.kind != "sss":
        raise ValueError(f"schedule kind {schedule.kind!r} != 'sss'")
    if nnz_c == 0 or schedule.n_steps == 0:
        return topology.with_data(jnp.zeros((nnz_c, bs, bs), out_dtype))
    data = _flat_call(
        schedule=schedule,
        stream_data=a.data,
        panel_operand=b.data,
        panel_index=None,
        out_shape=jax.ShapeDtypeStruct((nnz_c, bs, bs), out_dtype),
        out_block=(1, bs, bs),
        out_index=lambda j, out, dep, dat, oth, fl, sl: (out[j], 0, 0),
        dims=dot_dims(transpose_a, transpose_b),
        block_first=True,
        panel_is_block=True,
        out_is_block=True,
        bs=bs,
        interpret=interpret,
        kcat=kcat,
    )
    return topology.with_data(_zero_unvisited_blocks(data, schedule))
