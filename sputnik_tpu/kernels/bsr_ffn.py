"""Fused group-structured FFN: SDD -> activation -> DSD in ONE Pallas
kernel — the MegaBlocks MoE forward with the hidden activations never
touching HBM.

The unfused BSR MoE path (``models/moe.py`` impl="bsr") runs
``h = SDD(x, W1, topo); h = gelu(h); y = DSD(h, W2)``: three kernels, and
the generic SDD/DSD kernels re-stream a (d_model, bs) W strip per nonzero
block (~4x the compulsory W traffic for a block-diagonal topology, the
round-1 finding: 715 us vs grouped's 317 us).

This kernel exploits the structure the topology actually has: a
block-diagonal (group) pattern where consecutive runs of block rows share
one column run (expert e's capacity rows hit exactly its d_ff columns).
Grid = (group, ff_chunk): the group's x tile stays VMEM-resident across
its ff chunks (Pallas skips the refetch when the index map repeats), every
W1/W2 strip is read exactly ONCE, h lives only in registers/VMEM, and the
y accumulator flushes once per group:

    per (e, j):  h  = act(x_e @ W1[:, c(e,j)])      (MXU + VPU)
                 acc += h @ W2[c(e,j), :]           (MXU)

Traffic = x + W1 + W2 + y, each exactly once — the compulsory floor; at
the bench config the kernel is compute-bound (2 MXU dots per step).

The column ids come from the TOPOLOGY metadata (scalar-prefetched), so any
group-structured BSR works (permuted expert layouts included); a topology
whose groups are ragged falls back to the unfused chain at plan time.
Reference: the MegaBlocks motivation in the fork's README (README.md:29-43)
and the variable-trip-count iteration of block_gemm.h:129-192.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sputnik_tpu.formats import BlockSparseMatrix
from sputnik_tpu.kernels.common import compiler_params, use_interpret

__all__ = ["plan_group_ffn", "fused_group_ffn"]

_ACTS = {
    "gelu": jax.nn.gelu,
    "relu": lambda x: jnp.maximum(x, 0.0),
    "identity": lambda x: x,
}


def plan_group_ffn(topology: BlockSparseMatrix) -> Optional[Tuple[np.ndarray, int]]:
    """(group_cols (G, f_blocks), rows_per_group) when the topology is
    group-structured — equal-size runs of block rows sharing one column
    run — else None (callers fall back to the unfused chain).

    Host-side: needs concrete metadata (the MatmulEx discipline — plan once
    outside jit).
    """
    offs = topology.offsets
    idx = topology.indices
    if isinstance(offs, jax.core.Tracer) or isinstance(idx, jax.core.Tracer):
        return None
    offs = np.asarray(offs)
    idx = np.asarray(idx)
    counts = offs[1:] - offs[:-1]
    if len(counts) == 0 or counts.min() != counts.max() or counts[0] == 0:
        return None
    f_blocks = int(counts[0])
    per_row = idx.reshape(-1, f_blocks)
    # Group = run of consecutive block rows with identical column sets.
    same_as_prev = (per_row[1:] == per_row[:-1]).all(axis=1)
    starts = np.concatenate([[0], np.nonzero(~same_as_prev)[0] + 1])
    sizes = np.diff(np.concatenate([starts, [len(per_row)]]))
    if sizes.min() != sizes.max():
        return None
    return per_row[starts].astype(np.int32), int(sizes[0])


def _ffn_kernel(cols_ref, *refs, n_steps: int, ff_group: int, act):
    x_ref = refs[0]
    w1_refs = refs[1 : 1 + ff_group]
    w2_refs = refs[1 + ff_group : 1 + 2 * ff_group]
    out_ref = refs[1 + 2 * ff_group]
    acc_ref = refs[2 + 2 * ff_group]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # ff_group strips per step, concatenated into ONE wide (d, G*bs) dot
    # and one (G*bs, d) second dot — big MXU calls, few grid steps.
    w1_strip = (
        jnp.concatenate([w1_refs[g][:] for g in range(ff_group)], axis=1)
        if ff_group > 1 else w1_refs[0][:]
    )
    h = jax.lax.dot_general(
        x_ref[:], w1_strip, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = act(h).astype(x_ref.dtype)
    w2_strip = (
        jnp.concatenate([w2_refs[g][:] for g in range(ff_group)], axis=0)
        if ff_group > 1 else w2_refs[0][:]
    )
    acc_ref[:] += jax.lax.dot_general(
        h, w2_strip, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_steps - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def fused_group_ffn(
    x: jax.Array,  # (G * rows_per_group * bs, d_model) — group-permuted
    w1: jax.Array,  # (d_model, ff_total)
    w2: jax.Array,  # (ff_total, d_model)
    topology: BlockSparseMatrix,
    *,
    activation: str = "gelu",
    out_dtype=None,
    ff_group: int | None = None,
    plan=None,  # plan_group_ffn(topology) result, to avoid re-planning
    interpret: bool | None = None,
) -> jax.Array:
    """y = act(SDD(x, w1, topology)) @ w2 for group-structured topologies.

    Semantically identical to the unfused
    ``dsd(sdd(x, w1, topo).map(act), w2)`` chain; raises ValueError when
    the topology is not group-structured (use :func:`plan_group_ffn` to
    pre-check).
    """
    interpret = use_interpret() if interpret is None else interpret
    out_dtype = out_dtype or x.dtype
    if plan is None:
        plan = plan_group_ffn(topology)
    if plan is None:
        raise ValueError(
            "fused_group_ffn needs a group-structured topology (equal-size "
            "block-row groups sharing one column run); fall back to the "
            "unfused sdd -> dsd chain"
        )
    group_cols, rows_per_group = plan
    n_groups, f_blocks = group_cols.shape
    bs = topology.block_size
    d_model = x.shape[1]
    tile_rows = rows_per_group * bs
    if x.shape[0] != n_groups * tile_rows:
        raise ValueError(
            f"x rows {x.shape[0]} != groups {n_groups} x {tile_rows}"
        )
    if w1.shape != (d_model, topology.cols):
        raise ValueError(f"w1 must be ({d_model}, {topology.cols}), got {w1.shape}")
    if w2.shape[0] != topology.cols:
        raise ValueError(f"w2 rows {w2.shape[0]} != ff_total {topology.cols}")
    act = _ACTS[activation]
    cols_flat = jnp.asarray(group_cols.reshape(-1))
    if ff_group is None:
        ff_group = next(g for g in (4, 2, 1) if f_blocks % g == 0)
    if f_blocks % ff_group:
        raise ValueError(f"ff_group {ff_group} must divide f_blocks {f_blocks}")
    n_steps = f_blocks // ff_group

    def w1_map(g):
        return lambda e, j, cols: (0, cols[e * f_blocks + j * ff_group + g])

    def w2_map(g):
        return lambda e, j, cols: (cols[e * f_blocks + j * ff_group + g], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups, n_steps),
        in_specs=[
            pl.BlockSpec((tile_rows, d_model), lambda e, j, cols: (e, 0)),
            *[pl.BlockSpec((d_model, bs), w1_map(g)) for g in range(ff_group)],
            *[pl.BlockSpec((bs, w2.shape[1]), w2_map(g)) for g in range(ff_group)],
        ],
        out_specs=pl.BlockSpec((tile_rows, w2.shape[1]),
                               lambda e, j, cols: (e, 0)),
        scratch_shapes=[pltpu.VMEM((tile_rows, w2.shape[1]), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(
            _ffn_kernel, n_steps=n_steps, ff_group=ff_group, act=act
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], w2.shape[1]), out_dtype),
        compiler_params=compiler_params(("parallel", "arbitrary")),
        interpret=interpret,
    )(cols_flat, x, *([w1] * ff_group), *([w2] * ff_group))


def _dropless_kernel(e_ref, live_ref, x_ref, w1_ref, w2_ref, out_ref,
                     acc_ref, *, n_steps: int, act):
    del e_ref  # consumed by the index maps
    r = pl.program_id(0)
    j = pl.program_id(1)

    # The grid covers the STATIC worst-case padded row count (tokens +
    # n_experts * tile_rows); tiles past the step's actual routed total do
    # no compute (their W indices all collapse to chunk 0, so the fetches
    # elide too). Their output rows are never gathered by the caller's
    # inverse permutation, so leaving them unwritten is safe.
    @pl.when(live_ref[r] > 0)
    def _():
        h = jax.lax.dot_general(
            x_ref[:], w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        h = act(h).astype(x_ref.dtype)
        contrib = jax.lax.dot_general(
            h, w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if n_steps == 1:
            # Whole expert FFN per step: no accumulator round-trip, and the
            # W index depends only on e[r] — consecutive tiles of the same
            # expert ELIDE the W fetch entirely (the W-stationary schedule,
            # bought with index-map-repeat elision instead of a loop swap).
            out_ref[:] = contrib.astype(out_ref.dtype)
        else:
            @pl.when(j == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            acc_ref[:] += contrib

            @pl.when(j == n_steps - 1)
            def _():
                out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def fused_dropless_ffn(
    x: jax.Array,  # (t_pad, d_model) — expert-grouped, zero-padded rows
    w1: jax.Array,  # (d_model, n_experts * d_ff)
    w2: jax.Array,  # (n_experts * d_ff, d_model)
    expert_of_row: jax.Array,  # (t_pad // tile_rows,) int32, TRACED is fine
    d_ff: int,
    *,
    bs: int = 128,
    tile_rows: int | None = None,  # x rows per grid step (multiple of bs);
    # wider tiles amortize the per-tile W strip fetches (expert groups must
    # be padded to tile_rows-multiples by the caller)
    activation: str = "gelu",
    out_dtype=None,
    ff_group: int | None = None,
    live_rows: jax.Array | None = None,  # traced scalar: actual used row
    # tiles this step (tiles past it skip compute AND leave their output
    # rows unwritten — callers must not read them); None = all live
    interpret: bool | None = None,
) -> jax.Array:
    """Dropless MoE FFN in one kernel: the block-diagonal topology is
    DATA-DEPENDENT (``expert_of_row`` is rebuilt on device every step —
    MegaBlocks' dropless construction) and consumed through scalar
    prefetch, so group sizes never touch Python. Each 128-row tile reads
    its expert's W strips directly; zero-padded rows produce zeros
    (gelu(0) = 0). Static shapes throughout: XLA-safe under jit.
    """
    interpret = use_interpret() if interpret is None else interpret
    out_dtype = out_dtype or x.dtype
    t_pad, d_model = x.shape
    tr = tile_rows or bs
    if d_ff % bs:
        raise ValueError(f"d_ff {d_ff} must be a multiple of block size {bs}")
    if t_pad % tr:
        raise ValueError(
            f"x rows {t_pad} must be a multiple of tile_rows {tr} "
            "(pad the expert-grouped rows before calling)"
        )
    f_blocks = d_ff // bs
    if ff_group is None:
        # Whole-expert W chunks (ff_group == f_blocks) make the W index a
        # function of e[r] alone, so consecutive tiles of the same expert
        # elide the fetch — W streams once per expert RUN, not per tile
        # (rows are expert-grouped). Measured v5e @ d_model=1024, d_ff=2048,
        # E=8, 4096 tokens, tile_rows=256: 244.6/254.7/268.9 us at ff_group
        # 16/8/4 (vs 437 us for the round-2 per-tile-streaming schedule) —
        # 0.89 of bf16 peak, BEATING the fixed-capacity grouped einsum
        # (310 us). Cap the chunk so the two double-buffered W blocks fit
        # VMEM alongside x/out/acc/h (the kernel raises Mosaic's scoped
        # limit when they exceed the 16 MB default).
        budget = 48 * 1024 * 1024  # bytes for the two double-buffered W blocks
        per_unit = 4 * d_model * bs * jnp.dtype(w1.dtype).itemsize
        ff_group = next(
            (g for g in range(f_blocks, 0, -1)
             if f_blocks % g == 0 and g * per_unit <= budget),
            1,
        )
    if f_blocks % ff_group:
        raise ValueError(f"ff_group {ff_group} must divide f_blocks {f_blocks}")
    n_steps = f_blocks // ff_group
    n_rows = t_pad // tr
    act = _ACTS[activation]

    if live_rows is None:
        live = jnp.ones((n_rows,), jnp.int32)
    else:
        live = (
            jnp.arange(n_rows, dtype=jnp.int32)
            < jnp.asarray(live_rows, jnp.int32)
        ).astype(jnp.int32)

    # The dropless W layout is (d_model, E * d_ff) with each expert's
    # columns CONTIGUOUS, so one wide BlockSpec of (d_model, bs * ff_group)
    # covers a whole chunk — no per-bs strip specs, no in-kernel concat.
    # Dead tiles (past live_rows) collapse their W index to chunk 0:
    # pl.when only skips COMPUTE — index-map DMAs fire regardless — so
    # without this the dead tail still streams W per tile (measured: the
    # live guard alone saved only ~20 us of ~460). With a constant index,
    # consecutive dead steps elide to a single fetch.
    def w_idx(r, j, e, lv):
        return jnp.where(lv[r] > 0, e[r] * n_steps + j, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_rows, n_steps),
        in_specs=[
            pl.BlockSpec((tr, d_model), lambda r, j, e, lv: (r, 0)),
            pl.BlockSpec((d_model, bs * ff_group),
                         lambda r, j, e, lv: (0, w_idx(r, j, e, lv))),
            pl.BlockSpec((bs * ff_group, d_model),
                         lambda r, j, e, lv: (w_idx(r, j, e, lv), 0)),
        ],
        out_specs=pl.BlockSpec((tr, d_model), lambda r, j, e, lv: (r, 0)),
        scratch_shapes=[pltpu.VMEM((tr, d_model), jnp.float32)],
    )
    w_bytes = 4 * d_model * bs * ff_group * jnp.dtype(w1.dtype).itemsize
    return pl.pallas_call(
        functools.partial(_dropless_kernel, n_steps=n_steps, act=act),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, d_model), out_dtype),
        compiler_params=compiler_params(
            ("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024 if w_bytes > 8 * 2**20 else None,
        ),
        interpret=interpret,
    )(
        expert_of_row.astype(jnp.int32),
        live,
        x,
        w1,
        w2,
    )
