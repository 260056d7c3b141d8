"""C-resident BSR SpMM: the whole output accumulator lives in VMEM.

The streaming DSD/DDS kernels (``bsr_dsd``) are output-stationary per
TILE: blocks arrive grouped by output tile, so the dense operand's strip
is re-fetched for every nonzero block — at d=4096/25% that is ~8x the
compulsory dense traffic, and measurement shows them pinned at ~0.5-0.7
of speed of light.

This kernel inverts the schedule: blocks stream sorted by CONTRACTION
block k (dep-major — the transposed iteration order for DSD NN, the
natural one for DSD TN / DDS NN), and the FULL (m, n) fp32 accumulator is
VMEM-resident (v5e has 128 MB; Mosaic's scoped limit is raised past the
16 MB default). Consequences:

  * consecutive blocks share k, so the dense strip's index map repeats and
    Pallas elides the refetch — the dense operand moves ONCE;
  * each sparse block moves once (it always did);
  * C is written once, by ``m_blocks`` flush steps appended to the grid.
    During MAC steps the out index map parks on row 0; Pallas defers
    writes until the out index CHANGES, and the first flush step is row 0,
    so the parked steps cost zero output traffic;
  * block-rows with no blocks flush the zero-initialised accumulator —
    no empty-group masking pass.

Total traffic = |A_sparse| + |B| + |C|, the compulsory floor; the kernel
is MXU-bound at the headline config. ``can_implement`` gates on the
accumulator fitting VMEM (m*n*4 <= ~96 MB, i.e. up to 4096x6144).

Reference mapping: this is ``block_gemm.h``'s variable-trip-count loop
(``:129-192``) with the loop INVERTED around the reuse-maximal operand —
a schedule the GPU's small shared memory cannot express (128x128 fp32
output per threadblock); VMEM-scale residency is the TPU-native trick.
Works with traced metadata (everything rides scalar prefetch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sputnik_tpu.formats import BlockSparseMatrix
from sputnik_tpu.kernels.common import compiler_params, use_interpret

__all__ = ["dsd_cres", "dds_cres", "dsd_gres", "dds_gres", "plan_gres",
           "ACC_BUDGET"]

ACC_BUDGET = 96 * 1024 * 1024  # fp32 accumulator cap (v5e VMEM is 128 MB)


def fits_vmem(m_dim: int, n_dim: int, dense_strip_bytes: int) -> bool:
    return m_dim * n_dim * 4 + 4 * dense_strip_bytes <= ACC_BUDGET


def _cres_kernel(
    deps,  # (nnz,) contraction block per stream block, NON-DECREASING
    outs,  # (nnz,) output group (block-row of C for DSD, block-col for DDS)
    datas,  # (nnz,) physical positions (index maps only)
    frows,  # (nnz + n_flush,) out-buffer index per step (0 during MACs)
    blk_ref,  # (1, bs, bs)
    panel_ref,  # dense strip for the current k
    out_ref,  # (bs, n) / (m, bs) flush window
    acc_ref,  # (m, n) fp32 — the whole output
    *,
    nnz: int,
    bs: int,
    dims,
    block_first: bool,
    out_axis: int,  # 0: flush rows (DSD), 1: flush cols (DDS)
):
    j = pl.program_id(0)

    # acc_ref is (groups, bs, n) [DSD rows] or (groups, m, bs) [DDS cols]:
    # 3-D with the flush group MAJOR, so the data-dependent accumulate is
    # a major-dim index (cheap for Mosaic) rather than a dynamic sublane/
    # lane offset into one flat (m, n) buffer.
    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j < nnz)
    def _():
        block = blk_ref[0]
        panel = panel_ref[:]
        lhs, rhs = (block, panel) if block_first else (panel, block)
        prod = jax.lax.dot_general(
            lhs, rhs, dims, preferred_element_type=jnp.float32
        )
        g = outs[jnp.minimum(j, nnz - 1)]
        acc_ref[g] += prod

    @pl.when(j >= nnz)
    def _():
        g = frows[j]
        out_ref[:] = acc_ref[g].astype(out_ref.dtype)


def _cres_call(
    *,
    sparse_data,
    deps,
    outs,
    datas,
    panel,
    panel_spec,
    m_dim,
    n_dim,
    bs,
    dims,
    block_first,
    out_axis,
    out_dtype,
    interpret,
):
    import numpy as np

    nnz = sparse_data.shape[0]
    n_flush = (m_dim if out_axis == 0 else n_dim) // bs
    pad = jnp.zeros((nnz,), jnp.int32)
    frows = jnp.concatenate([pad, jnp.arange(n_flush, dtype=jnp.int32)])

    if out_axis == 0:
        out_spec = pl.BlockSpec(
            (bs, n_dim), lambda j, de, ou, da, fr: (fr[j], 0)
        )
        acc_shape = (m_dim // bs, bs, n_dim)
    else:
        out_spec = pl.BlockSpec(
            (m_dim, bs), lambda j, de, ou, da, fr: (0, fr[j])
        )
        acc_shape = (n_dim // bs, m_dim, bs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nnz + n_flush,),
        in_specs=[
            pl.BlockSpec(
                (1, bs, bs),
                lambda j, de, ou, da, fr: (da[jnp.minimum(j, nnz - 1)], 0, 0),
            ),
            panel_spec,
        ],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM(acc_shape, jnp.float32)],
    )
    acc_bytes = m_dim * n_dim * 4
    return pl.pallas_call(
        functools.partial(
            _cres_kernel, nnz=nnz, bs=bs, dims=dims,
            block_first=block_first, out_axis=out_axis,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_dim, n_dim), out_dtype),
        compiler_params=compiler_params(
            ("arbitrary",),
            vmem_limit_bytes=min(
                120 * 2**20, acc_bytes + 24 * 2**20
            ) if acc_bytes > 8 * 2**20 else None,
        ),
        interpret=interpret,
    )(deps, outs, datas, frows, sparse_data, panel)


def _dep_major_arrays(s: BlockSparseMatrix, op_transposed: bool):
    """(deps, outs, datas) for op(S)'s blocks sorted by op-column k
    (DSD stream) — ``op_transposed`` flips which stored axis is k."""
    if op_transposed:
        # op(S) = S^T: k = stored block-row -> natural CSR order.
        return (
            s.row_indices.astype(jnp.int32),
            s.indices.astype(jnp.int32),
            jnp.arange(s.nnz_blocks, dtype=jnp.int32),
        )
    st = s.with_transpose_metadata()
    return (
        st.indices[st.block_offsets].astype(jnp.int32),  # stored col = k
        st.indices_t.astype(jnp.int32),  # stored row = out coord
        st.block_offsets.astype(jnp.int32),
    )


def dsd_cres(
    a: BlockSparseMatrix,
    b: jax.Array,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    interpret: bool | None = None,
    **_,
) -> jax.Array:
    """C = op(A_sparse) @ op(B_dense), C resident in VMEM (see module doc)."""
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

    deps, outs, datas = _dep_major_arrays(a, transpose_a)
    if transpose_b:  # B stored (N, K): strip (n, bs) at column k
        panel_spec = pl.BlockSpec(
            (n_dim, bs), lambda j, de, ou, da, fr: (0, de[jnp.minimum(j, len(de) - 1)])
        )
        dims = (((0 if transpose_a else 1,), (1,)), ((), ()))
    else:  # B stored (K, N): strip (bs, n) at row k
        panel_spec = pl.BlockSpec(
            (bs, n_dim), lambda j, de, ou, da, fr: (de[jnp.minimum(j, len(de) - 1)], 0)
        )
        dims = (((0 if transpose_a else 1,), (0,)), ((), ()))
    return _cres_call(
        sparse_data=a.data,
        deps=deps,
        outs=outs,
        datas=datas,
        panel=b,
        panel_spec=panel_spec,
        m_dim=m_dim,
        n_dim=n_dim,
        bs=bs,
        dims=dims,
        block_first=True,
        out_axis=0,
        out_dtype=out_dtype,
        interpret=interpret,
    )


def dds_cres(
    a: jax.Array,
    b: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    interpret: bool | None = None,
    **_,
) -> jax.Array:
    """C = op(A_dense) @ op(B_sparse), C resident in VMEM.

    The mirror schedule: blocks sorted by k (op(B)'s ROW — natural order
    for NN, the case the tile-stationary kernel is worst at), A strips
    fetched once each, column-window flush.
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

    # op(B) grouped by its ROW k: natural when not transposed.
    deps, outs, datas = _dep_major_arrays(b, not transpose_b)
    if transpose_a:  # A stored (K, M): strip (bs, m) at row k
        panel_spec = pl.BlockSpec(
            (bs, m_dim), lambda j, de, ou, da, fr: (de[jnp.minimum(j, len(de) - 1)], 0)
        )
        dims = (((0,), (1 if transpose_b else 0,)), ((), ()))
    else:  # A stored (M, K): strip (m, bs) at column k
        panel_spec = pl.BlockSpec(
            (m_dim, bs), lambda j, de, ou, da, fr: (0, de[jnp.minimum(j, len(de) - 1)])
        )
        dims = (((1,), (1 if transpose_b else 0,)), ((), ()))
    return _cres_call(
        sparse_data=b.data,
        deps=deps,
        outs=outs,
        datas=datas,
        panel=a,
        panel_spec=panel_spec,
        m_dim=m_dim,
        n_dim=n_dim,
        bs=bs,
        dims=dims,
        block_first=False,
        out_axis=1,
        out_dtype=out_dtype,
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Group-resident schedule (gres): the cres idea at ANY size
# ---------------------------------------------------------------------------


def _op_row_arrays_np(s: BlockSparseMatrix, op_transposed: bool):
    """np (rows, deps, datas) of op(S)'s blocks in op-row-major order."""
    import numpy as np

    if not op_transposed:
        return (
            np.asarray(s.row_indices, np.int64),
            np.asarray(s.indices, np.int64),
            np.arange(s.nnz_blocks, dtype=np.int64),
        )
    # op(S) = S^T: op row = stored COLUMN (column-sorted via the transpose
    # metadata); the contraction block k = stored row.
    st = s.with_transpose_metadata()
    bo = np.asarray(st.block_offsets, np.int64)
    return (
        np.asarray(st.indices, np.int64)[bo],  # stored col = op row
        np.asarray(st.indices_t, np.int64),  # stored row = k
        bo,
    )


def plan_gres(s: BlockSparseMatrix, *, op_transposed: bool, group_rows: int):
    """Host plan for the group-resident schedule: op rows are split into
    groups of ``group_rows``; within a group, blocks sort by (dep, row) so
    consecutive blocks SHARE the dense strip whenever any two of the
    group's rows hit the same contraction block — the strip fetch elides.
    All groups pad to the max group population with flag-0 slots (compute
    skipped, fetches parked on the previous slot's indices so they elide
    too). Returns jnp arrays flattened (n_groups, s_max) + static sizes.
    """
    import numpy as np

    rows, deps, datas = _op_row_arrays_np(s, op_transposed)
    grp = rows // group_rows
    order = np.lexsort((rows, deps, grp))  # grp major, dep, then row
    grp_s, dep_s, sub_s, data_s = (
        grp[order], deps[order], (rows % group_rows)[order], datas[order]
    )
    n_groups = int(
        -(-((s.cols if op_transposed else s.rows) // s.block_size)
          // group_rows)
    )
    counts = np.bincount(grp_s, minlength=n_groups)
    s_max = max(int(counts.max()), 1)
    dep_p = np.zeros((n_groups, s_max), np.int64)
    sub_p = np.zeros((n_groups, s_max), np.int64)
    data_p = np.zeros((n_groups, s_max), np.int64)
    flag_p = np.zeros((n_groups, s_max), np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    for g in range(n_groups):
        c = int(counts[g])
        sl = slice(int(starts[g]), int(starts[g]) + c)
        dep_p[g, :c] = dep_s[sl]
        sub_p[g, :c] = sub_s[sl]
        data_p[g, :c] = data_s[sl]
        flag_p[g, :c] = 1
        if c < s_max:  # park pads on the last real slot (fetches elide)
            fill = dep_s[sl][-1] if c else 0
            dfill = data_s[sl][-1] if c else 0
            dep_p[g, c:] = fill
            data_p[g, c:] = dfill
    as32 = lambda x: jnp.asarray(x.reshape(-1).astype("int32"))
    return (
        as32(dep_p), as32(sub_p), as32(data_p), as32(flag_p),
        n_groups, s_max,
    )


def _gres_kernel(
    deps, subs, datas, flags,
    blk_ref, panel_ref, out_ref, acc_ref,
    *,
    s_max: int,
    group_rows: int,
    n_out_blocks: int,
    dims,
    block_first: bool,
):
    g = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    slot = g * s_max + jnp.minimum(j, s_max - 1)

    @pl.when(jnp.logical_and(j < s_max, flags[slot] > 0))
    def _():
        block = blk_ref[0]
        panel = panel_ref[:]
        lhs, rhs = (block, panel) if block_first else (panel, block)
        prod = jax.lax.dot_general(
            lhs, rhs, dims, preferred_element_type=jnp.float32
        )
        acc_ref[subs[slot]] += prod

    @pl.when(j >= s_max)
    def _():
        # The last (possibly short) group clamps the flush index so the
        # extra flush steps REWRITE the last valid row (same acc slot as
        # the out index map's clamp) instead of spilling empty acc slots
        # over real rows.
        valid = jnp.minimum(group_rows, n_out_blocks - g * group_rows)
        idx = jnp.minimum(j - s_max, valid - 1)
        out_ref[:] = acc_ref[idx].astype(out_ref.dtype)


def _gres_call(
    *,
    sparse_data,
    plan,
    panel,
    panel_spec_fn,  # (slot_fn) -> BlockSpec for the dense strip
    m_dim,
    n_dim,
    bs,
    dims,
    block_first,
    out_axis,
    group_rows,
    out_dtype,
    interpret,
):
    deps, subs, datas, flags, n_groups, s_max = plan

    def slot(g, j):
        return g * s_max + jnp.minimum(j, s_max - 1)

    n_out_blocks = (m_dim if out_axis == 0 else n_dim) // bs

    def _flush_block(g, j):
        valid = jnp.minimum(group_rows, n_out_blocks - g * group_rows)
        idx = jnp.minimum(jnp.maximum(j - s_max, 0), valid - 1)
        return g * group_rows + idx

    if out_axis == 0:
        out_spec = pl.BlockSpec(
            (bs, n_dim),
            lambda g, j, de, su, da, fl: (_flush_block(g, j), 0),
        )
        acc_shape = (group_rows, bs, n_dim)
    else:
        out_spec = pl.BlockSpec(
            (m_dim, bs),
            lambda g, j, de, su, da, fl: (0, _flush_block(g, j)),
        )
        acc_shape = (group_rows, m_dim, bs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_groups, s_max + group_rows),
        in_specs=[
            pl.BlockSpec(
                (1, bs, bs),
                lambda g, j, de, su, da, fl: (da[slot(g, j)], 0, 0),
            ),
            panel_spec_fn(slot),
        ],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM(acc_shape, jnp.float32)],
    )
    acc_bytes = group_rows * bs * (n_dim if out_axis == 0 else m_dim) * 4
    return pl.pallas_call(
        functools.partial(
            _gres_kernel, s_max=s_max, group_rows=group_rows,
            n_out_blocks=n_out_blocks, dims=dims, block_first=block_first,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_dim, n_dim), out_dtype),
        compiler_params=compiler_params(
            ("arbitrary", "arbitrary"),
            vmem_limit_bytes=min(120 * 2**20, acc_bytes + 24 * 2**20)
            if acc_bytes > 8 * 2**20 else None,
        ),
        interpret=interpret,
    )(deps, subs, datas, flags, sparse_data, panel)


def _pick_group_rows(out_blocks: int, other_dim: int, bs: int) -> int:
    """Largest power-of-two group whose fp32 accumulator fits the budget
    (minus headroom for the double-buffered strips)."""
    g = 1
    while (
        g * 2 <= out_blocks
        and (g * 2) * bs * other_dim * 4 <= ACC_BUDGET - 8 * 2**20
    ):
        g *= 2
    return g


def dsd_gres(
    a: BlockSparseMatrix,
    b: jax.Array,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    group_rows: int | None = None,
    plan=None,  # plan_gres(...) result (the MatmulEx discipline)
    interpret: bool | None = None,
    **_,
) -> jax.Array:
    """C = op(A_sparse) @ op(B_dense), GROUP-resident accumulator.

    The generalization of :func:`dsd_cres` to any size: ``group_rows``
    output block-rows share a VMEM-resident fp32 accumulator and their
    blocks stream dep-sorted, so the dense strip is fetched once per
    DISTINCT contraction block per group instead of once per nonzero
    block (at 25% density and 16-row groups, that is ~4x fewer fetches).
    Host-planned (concrete metadata — the MatmulEx discipline); flush
    steps appended per group.
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
    if group_rows is None:
        group_rows = _pick_group_rows(m_dim // bs, n_dim, bs)
    if plan is None:
        plan = plan_gres(a, op_transposed=transpose_a, group_rows=group_rows)

    if transpose_b:  # B stored (N, K)
        panel_spec_fn = lambda slot: pl.BlockSpec(
            (n_dim, bs), lambda g, j, de, su, da, fl: (0, de[slot(g, j)])
        )
        dims = (((0 if transpose_a else 1,), (1,)), ((), ()))
    else:
        panel_spec_fn = lambda slot: pl.BlockSpec(
            (bs, n_dim), lambda g, j, de, su, da, fl: (de[slot(g, j)], 0)
        )
        dims = (((0 if transpose_a else 1,), (0,)), ((), ()))
    return _gres_call(
        sparse_data=a.data,
        plan=plan,
        panel=b,
        panel_spec_fn=panel_spec_fn,
        m_dim=m_dim,
        n_dim=n_dim,
        bs=bs,
        dims=dims,
        block_first=True,
        out_axis=0,
        group_rows=group_rows,
        out_dtype=out_dtype,
        interpret=interpret,
    )


def dds_gres(
    a: jax.Array,
    b: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    group_rows: int | None = None,
    plan=None,
    interpret: bool | None = None,
    **_,
) -> jax.Array:
    """C = op(A_dense) @ op(B_sparse), group-resident output columns."""
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
    if group_rows is None:
        group_rows = _pick_group_rows(n_dim // bs, m_dim, bs)
    if plan is None:
        # op(B)'s rows here are its output COLUMNS: natural storage rows
        # when transposed (op(B)=B^T), transpose metadata otherwise.
        plan = plan_gres(b, op_transposed=not transpose_b,
                         group_rows=group_rows)

    if transpose_a:  # A stored (K, M)
        panel_spec_fn = lambda slot: pl.BlockSpec(
            (bs, m_dim), lambda g, j, de, su, da, fl: (de[slot(g, j)], 0)
        )
        dims = (((0,), (1 if transpose_b else 0,)), ((), ()))
    else:
        panel_spec_fn = lambda slot: pl.BlockSpec(
            (m_dim, bs), lambda g, j, de, su, da, fl: (0, de[slot(g, j)])
        )
        dims = (((1,), (1 if transpose_b else 0,)), ((), ()))
    return _gres_call(
        sparse_data=b.data,
        plan=plan,
        panel=a,
        panel_spec_fn=panel_spec_fn,
        m_dim=m_dim,
        n_dim=n_dim,
        bs=bs,
        dims=dims,
        block_first=False,
        out_axis=1,
        group_rows=group_rows,
        out_dtype=out_dtype,
        interpret=interpret,
    )
