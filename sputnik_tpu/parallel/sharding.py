"""Mesh-partitioned sparse matmuls over ``jax.sharding.Mesh`` + shard_map.

The reference has no distributed layer (single-GPU kernel library,
SURVEY.md section 2.8); the north star requires one. Design:

  * Sparse matrices are **row/block-partitioned**: each mesh shard owns a
    contiguous band of block-rows as a complete local BSR/CSR, padded to
    equal nnz so the stacked pytree has static per-shard shapes. Only the
    dense operand ever moves.
  * ``shard_map`` runs the single-chip Pallas kernels per device; the dense
    panel is replicated, column-sharded (no comm), or K-sharded
    (``all_gather`` over ICI before the local kernel — XLA schedules the
    gather's chunks asynchronously against compute).
  * Weak scaling comes for free from row partitioning: per-device work is
    the local nnz, and no collective touches the sparse data.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sputnik_tpu.formats import BlockSparseMatrix, CsrMatrix, SellMatrix
from sputnik_tpu.kernels import bsr_dsd, bsr_sdd, sell as sell_kernels
from sputnik_tpu.ops import csr as csr_ops

__all__ = [
    "BandedShardedBlockSparseMatrix",
    "ShardedBlockSparseMatrix",
    "ShardedCsrMatrix",
    "ShardedSellMatrix",
    "partition_bsr_rows",
    "partition_bsr_rows_kbands",
    "partition_csr_rows",
    "partition_sell_rows",
    "partition_sell_cols",
    "sharded_dsd",
    "sharded_dsd_ring",
    "sharded_sdd",
    "sharded_spmm",
    "sharded_spmm_sell",
    "sharded_spmm_kshard",
]


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "offsets", "indices", "row_indices", "valid_counts"],
    meta_fields=["shape", "block_size", "n_shards", "max_row_nnz"],
)
@dataclasses.dataclass(frozen=True)
class ShardedBlockSparseMatrix:
    """Row-partitioned BSR: shard-stacked local matrices with equal padded
    nnz. ``data[s]`` etc. is shard s's local BSR over block-rows
    ``[s * rows_per_shard, (s+1) * rows_per_shard)``. ``valid_counts[s]`` is
    the number of REAL (non-padding) blocks in shard s — padding blocks are
    zero-valued duplicate slots, inert in matmuls, but ops that WRITE into
    the topology (SDD -> softmax) must mask slots past this count."""

    data: jax.Array  # (S, P, bs, bs)
    offsets: jax.Array  # (S, local_block_rows + 1)
    indices: jax.Array  # (S, P)
    row_indices: jax.Array  # (S, P) local block-row ids
    shape: Tuple[int, int]  # global
    block_size: int
    n_shards: int
    max_row_nnz: Optional[int]
    valid_counts: Optional[jax.Array] = None  # (S,) int32

    @property
    def local_rows(self) -> int:
        return self.shape[0] // self.n_shards

    def local_matrix(self, s: int | None = None) -> BlockSparseMatrix:
        """Materialize shard ``s``'s local BSR (host/debug use)."""
        i = 0 if s is None else s
        return BlockSparseMatrix(
            data=self.data[i],
            offsets=self.offsets[i],
            indices=self.indices[i],
            row_indices=self.row_indices[i],
            offsets_t=None,
            indices_t=None,
            block_offsets=None,
            shape=(self.local_rows, self.shape[1]),
            block_size=self.block_size,
            max_row_nnz=self.max_row_nnz,
            max_col_nnz=None,
        )


def partition_bsr_rows(m: BlockSparseMatrix, n_shards: int) -> ShardedBlockSparseMatrix:
    """Split a BSR into ``n_shards`` equal bands of block-rows (host-side).

    Shards are padded to the max per-shard nnz with zero-valued blocks
    duplicating the shard's last slot (the standard padding convention), so
    the stacked arrays are rectangular and shard_map can split them.
    """
    if m.block_rows % n_shards:
        raise ValueError(f"block_rows {m.block_rows} not divisible by {n_shards}")
    rows_per = m.block_rows // n_shards
    offs = np.asarray(m.offsets)
    idx = np.asarray(m.indices)
    rowid = np.asarray(m.row_indices)
    data = np.asarray(m.data)

    shards = []
    for s in range(n_shards):
        lo, hi = offs[s * rows_per], offs[(s + 1) * rows_per]
        local_offs = offs[s * rows_per : (s + 1) * rows_per + 1] - lo
        shards.append(
            (data[lo:hi], local_offs, idx[lo:hi], rowid[lo:hi] - s * rows_per)
        )
    pad_to = max(sh[0].shape[0] for sh in shards)
    pad_to = max(pad_to, 1)
    bs = m.block_size

    d_out, o_out, i_out, r_out = [], [], [], []
    for d, o, i, r in shards:
        n = d.shape[0]
        pad = pad_to - n
        if pad:
            d = np.concatenate([d, np.zeros((pad, bs, bs), d.dtype)])
            # Duplicate the last slot (or (last_row, 0) for empty shards).
            pad_col = i[-1] if n else 0
            pad_row = r[-1] if n else rows_per - 1
            i = np.concatenate([i, np.full(pad, pad_col, np.int32)])
            r = np.concatenate([r, np.full(pad, pad_row, np.int32)])
            o = o.copy()
            o[-1] += pad  # padding blocks live in the last row's extent
            # Keep offsets consistent: all rows after the last real block's
            # row keep their offset; the final boundary absorbs the padding.
            # (Padding rows are appended to the LAST local row.)
        d_out.append(d)
        o_out.append(o)
        i_out.append(i)
        r_out.append(r)

    # Padding was attributed to the last row: fix row_indices accordingly.
    return ShardedBlockSparseMatrix(
        data=jnp.asarray(np.stack(d_out)).astype(m.dtype),
        offsets=jnp.asarray(np.stack(o_out), jnp.int32),
        indices=jnp.asarray(np.stack(i_out), jnp.int32),
        row_indices=jnp.asarray(np.stack(r_out), jnp.int32),
        shape=m.shape,
        block_size=bs,
        n_shards=n_shards,
        max_row_nnz=None,
        valid_counts=jnp.asarray([sh[0].shape[0] for sh in shards], jnp.int32),
    )


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["values", "indices", "offsets", "row_indices"],
    meta_fields=["shape", "n_shards"],
)
@dataclasses.dataclass(frozen=True)
class ShardedCsrMatrix:
    """Row-partitioned CSR, same scheme as :class:`ShardedBlockSparseMatrix`."""

    values: jax.Array  # (S, P)
    indices: jax.Array  # (S, P)
    offsets: jax.Array  # (S, local_rows + 1)
    row_indices: jax.Array  # (S, P)
    shape: Tuple[int, int]
    n_shards: int

    @property
    def local_rows(self) -> int:
        return self.shape[0] // self.n_shards


def partition_csr_rows(m: CsrMatrix, n_shards: int) -> ShardedCsrMatrix:
    if m.rows % n_shards:
        raise ValueError(f"rows {m.rows} not divisible by {n_shards}")
    rows_per = m.rows // n_shards
    offs = np.asarray(m.offsets)
    idx = np.asarray(m.indices)
    rowid = np.asarray(m.row_indices)
    vals = np.asarray(m.values)

    shards = []
    for s in range(n_shards):
        lo, hi = offs[s * rows_per], offs[(s + 1) * rows_per]
        local_offs = offs[s * rows_per : (s + 1) * rows_per + 1] - lo
        shards.append((vals[lo:hi], local_offs, idx[lo:hi], rowid[lo:hi] - s * rows_per))
    pad_to = max(max(sh[0].shape[0] for sh in shards), 1)

    v_out, o_out, i_out, r_out = [], [], [], []
    for v, o, i, r in shards:
        pad = pad_to - v.shape[0]
        if pad:
            v = np.concatenate([v, np.zeros(pad, v.dtype)])
            i = np.concatenate([i, np.full(pad, i[-1] if i.size else 0, np.int32)])
            r = np.concatenate([r, np.full(pad, r[-1] if r.size else rows_per - 1, np.int32)])
            o = o.copy()
            o[-1] += pad
        v_out.append(v)
        o_out.append(o)
        i_out.append(i)
        r_out.append(r)
    return ShardedCsrMatrix(
        values=jnp.asarray(np.stack(v_out)).astype(m.dtype),
        indices=jnp.asarray(np.stack(i_out), jnp.int32),
        offsets=jnp.asarray(np.stack(o_out), jnp.int32),
        row_indices=jnp.asarray(np.stack(r_out), jnp.int32),
        shape=m.shape,
        n_shards=n_shards,
    )


def _local_bsr(sm: ShardedBlockSparseMatrix, data, offsets, indices, row_indices):
    """Rebuild the local BSR from shard_map-local (1, ...) slabs."""
    return BlockSparseMatrix(
        data=data[0],
        offsets=offsets[0],
        indices=indices[0],
        row_indices=row_indices[0],
        offsets_t=None,
        indices_t=None,
        block_offsets=None,
        shape=(sm.local_rows, sm.shape[1]),
        block_size=sm.block_size,
        max_row_nnz=sm.max_row_nnz,
        max_col_nnz=None,
    )


def sharded_dsd(
    a: ShardedBlockSparseMatrix,
    b: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "x",
    b_sharded_k: bool = False,
    out_dtype=None,
    **options,
) -> jax.Array:
    """Row-partitioned SpMM over a mesh: C[rows sharded] = A_sharded @ B.

    ``b_sharded_k=False``: B replicated, zero communication.
    ``b_sharded_k=True``: B row(K)-sharded on ``axis``; each device
    all-gathers the K panels over ICI before its local kernel (XLA overlaps
    the gather steps with the first block computations).
    """

    def local(data, offsets, indices, row_indices, b_local):
        a_local = _local_bsr(a, data, offsets, indices, row_indices)
        if b_sharded_k:
            b_full = jax.lax.all_gather(b_local, axis, axis=0, tiled=True)
        else:
            b_full = b_local
        return bsr_dsd.dsd(a_local, b_full, out_dtype=out_dtype, **options)

    b_spec = P(axis) if b_sharded_k else P()
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), b_spec),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(a.data, a.offsets, a.indices, a.row_indices, b)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "offsets", "indices", "row_indices"],
    meta_fields=["shape", "block_size", "n_shards", "max_row_nnz"],
)
@dataclasses.dataclass(frozen=True)
class BandedShardedBlockSparseMatrix:
    """Row-partitioned BSR additionally split into per-shard K-bands, for
    the ring (collective-matmul) schedule: ``data[s, j]`` holds shard s's
    blocks whose block-column falls in contraction band j, with column ids
    re-based to the band (matching the K-sharded dense operand's local
    coordinates). All (s, j) cells are padded to one nnz so the arrays are
    rectangular; padding blocks are zero-valued duplicate slots (inert)."""

    data: jax.Array  # (S, S, P, bs, bs)
    offsets: jax.Array  # (S, S, local_block_rows + 1)
    indices: jax.Array  # (S, S, P) band-local block-col ids
    row_indices: jax.Array  # (S, S, P) shard-local block-row ids
    shape: Tuple[int, int]  # global
    block_size: int
    n_shards: int
    max_row_nnz: Optional[int]

    @property
    def local_rows(self) -> int:
        return self.shape[0] // self.n_shards


def partition_bsr_rows_kbands(
    m: BlockSparseMatrix, n_shards: int
) -> BandedShardedBlockSparseMatrix:
    """Split a BSR into ``n_shards`` row bands × ``n_shards`` K-bands
    (host-side), the operand layout :func:`sharded_dsd_ring` consumes.

    Every (shard, band) cell pads to the GLOBAL max cell occupancy so the
    stacked arrays are rectangular: near-uniform topologies pad ~nothing,
    but a matrix concentrated in few cells inflates A-side storage and
    ring compute by up to S² (vs the row partitioner's S). The ring's
    memory win is on the DENSE side (k·n/S resident); for heavily skewed
    sparse operands prefer ``sharded_dsd(b_sharded_k=True)``."""
    if m.block_rows % n_shards:
        raise ValueError(f"block_rows {m.block_rows} not divisible by {n_shards}")
    if m.block_cols % n_shards:
        raise ValueError(f"block_cols {m.block_cols} not divisible by {n_shards}")
    rows_per = m.block_rows // n_shards
    kbb = m.block_cols // n_shards  # block-cols per band
    offs = np.asarray(m.offsets)
    idx = np.asarray(m.indices)
    rowid = np.asarray(m.row_indices)
    data = np.asarray(m.data)

    cells = []  # (s, j) -> (data, indices, row_indices); offsets built below
    for s in range(n_shards):
        lo, hi = offs[s * rows_per], offs[(s + 1) * rows_per]
        i_s, r_s, d_s = idx[lo:hi], rowid[lo:hi] - s * rows_per, data[lo:hi]
        for j in range(n_shards):
            sel = (i_s // kbb) == j
            cells.append((d_s[sel], i_s[sel] - j * kbb, r_s[sel]))
    pad_to = max(max(c[0].shape[0] for c in cells), 1)
    bs = m.block_size
    max_row = 0

    d_out, o_out, i_out, r_out = [], [], [], []
    for d, i, r in cells:
        n = d.shape[0]
        pad = pad_to - n
        if pad:
            d = np.concatenate([d, np.zeros((pad, bs, bs), d.dtype)])
            i = np.concatenate([i, np.full(pad, i[-1] if n else 0, np.int32)])
            # Padding appended to the LAST occupied row keeps row_indices
            # sorted and offsets consistent with them.
            r = np.concatenate([r, np.full(pad, r[-1] if n else rows_per - 1, np.int32)])
        o = np.zeros(rows_per + 1, np.int64)
        np.add.at(o[1:], r, 1)
        o = np.cumsum(o)
        max_row = max(max_row, int((o[1:] - o[:-1]).max()))
        d_out.append(d)
        o_out.append(o)
        i_out.append(i.astype(np.int32))
        r_out.append(r.astype(np.int32))

    def _stack(parts, dtype):
        arr = np.stack(parts).reshape(n_shards, n_shards, *parts[0].shape)
        return jnp.asarray(arr.astype(dtype))

    return BandedShardedBlockSparseMatrix(
        data=_stack(d_out, np.asarray(data).dtype),
        offsets=_stack(o_out, np.int32),
        indices=_stack(i_out, np.int32),
        row_indices=_stack(r_out, np.int32),
        shape=m.shape,
        block_size=bs,
        n_shards=n_shards,
        max_row_nnz=max_row,
    )


def sharded_dsd_ring(
    a: BandedShardedBlockSparseMatrix,
    b: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "x",
    out_dtype=None,
    **options,
) -> jax.Array:
    """Ring-overlapped SpMM (the TPU collective-matmul schedule):
    C[rows sharded] = A_banded @ B[K sharded].

    Where :func:`sharded_dsd` with ``b_sharded_k=True`` all-gathers the
    whole dense operand up front (peak memory = full B per device),
    the ring keeps exactly ONE B shard resident: at step t, device d
    holds the K-band ``(d + t) % S`` (rotated over ICI with ``ppermute``)
    and multiplies it against its matching local A column band. The next
    shard's permute depends only on the CURRENT shard — not on the step's
    compute — so XLA issues the collective asynchronously and the ICI
    transfer overlaps the Pallas kernel (same dependence structure as
    `parallel/ring_attention.py`). Partials accumulate in fp32.

    Per-device B memory: ``k·n/S`` vs the gather's ``k·n``; bytes on the
    wire are identical (each device still receives S-1 shards).
    """
    n_shards = a.n_shards
    if mesh.shape[axis] != n_shards:
        raise ValueError(
            f"mesh axis {axis!r} has {mesh.shape[axis]} devices, "
            f"operand has {n_shards} shards"
        )
    if b.shape[0] != a.shape[1]:
        raise ValueError(f"contraction mismatch: A cols {a.shape[1]}, B rows {b.shape[0]}")
    perm = [((i + 1) % n_shards, i) for i in range(n_shards)]

    def local(data, offsets, indices, row_indices, b_local):
        # data: (1, S, P, bs, bs); b_local: (k/S, n)
        d = jax.lax.axis_index(axis)

        def band_bsr(t):
            j = jax.lax.rem(d + t, n_shards)
            pick = lambda arr: jax.lax.dynamic_index_in_dim(
                arr[0], j, axis=0, keepdims=False
            )
            return BlockSparseMatrix(
                data=pick(data),
                offsets=pick(offsets),
                indices=pick(indices),
                row_indices=pick(row_indices),
                offsets_t=None,
                indices_t=None,
                block_offsets=None,
                shape=(a.local_rows, a.shape[1] // n_shards),
                block_size=a.block_size,
                max_row_nnz=a.max_row_nnz,
                max_col_nnz=None,
            )

        b_cur = b_local
        acc = None
        for t in range(n_shards):
            if t + 1 < n_shards:  # issue the rotation before the compute
                b_next = jax.lax.ppermute(b_cur, axis, perm)
            part = bsr_dsd.dsd(
                band_bsr(t), b_cur, out_dtype=jnp.float32, **options
            )
            acc = part if acc is None else acc + part
            if t + 1 < n_shards:
                b_cur = b_next
        return acc.astype(out_dtype or b.dtype)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(a.data, a.offsets, a.indices, a.row_indices, b)


def sharded_sdd(
    a: jax.Array,
    b: jax.Array,
    topology: ShardedBlockSparseMatrix,
    mesh: Mesh,
    *,
    axis: str = "x",
    out_dtype=None,
    **options,
):
    """Row-partitioned SDDMM: A row-sharded with the topology, B replicated.
    Returns the shard-stacked output data array (topology layout)."""

    def local(a_local, b_local, data, offsets, indices, row_indices):
        topo_local = _local_bsr(topology, data, offsets, indices, row_indices)
        out = bsr_sdd.sdd(
            a_local, b_local, topo_local, out_dtype=out_dtype, **options
        )
        return out.data[None]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    data = fn(a, b, topology.data, topology.offsets, topology.indices, topology.row_indices)
    return dataclasses.replace(topology, data=data)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["values", "indices"],
    meta_fields=["shape", "chunk", "n_shards", "partition"],
)
@dataclasses.dataclass(frozen=True)
class ShardedSellMatrix:
    """Partitioned SELL matrix, shard-stacked.

    ``partition="rows"``: shard s owns rows [s*local, (s+1)*local) — arrays
    are ``(S, n_chunks, width, local_rows)`` (the SELL row axis is lanes, so
    a row band is just a slice). ``partition="cols"``: shard s owns a
    contraction-column band — arrays are ``(S, chunks_per_shard, width,
    rows)`` and local SpMM results are partial sums over k.
    """

    values: jax.Array
    indices: jax.Array
    shape: Tuple[int, int]  # global logical
    chunk: int
    n_shards: int
    partition: str  # "rows" | "cols"

    def local_sell(self, values, indices) -> SellMatrix:
        """Build the shard-local SellMatrix from shard_map-local slabs."""
        s = self.n_shards
        if self.partition == "rows":
            local_rows_p = self.values.shape[3]
            rows = self.shape[0] // s
            return SellMatrix(
                values=values[0],
                indices=indices[0],
                shape=(rows, self.shape[1]),
                chunk=self.chunk,
                pad_rows=local_rows_p - rows,
            )
        chunks_per = self.values.shape[1]
        rows_p = self.values.shape[3]
        return SellMatrix(
            values=values[0],
            indices=indices[0],
            shape=(self.shape[0], chunks_per * self.chunk),
            chunk=self.chunk,
            pad_rows=rows_p - self.shape[0],
        )


def partition_sell_rows(m: CsrMatrix, n_shards: int, *, chunk: int = 128) -> ShardedSellMatrix:
    """Row-partition a CSR into shard-local SELL matrices (host-side).

    Each shard's SELL is built from its own row band, so the slot width is
    the per-shard maximum padded to the global maximum — the row-band
    analogue of the reference padding shards to equal nnz.
    """
    if m.rows % n_shards:
        raise ValueError(f"rows {m.rows} not divisible by {n_shards}")
    rows_per = m.rows // n_shards
    offs = np.asarray(m.offsets)
    idx = np.asarray(m.indices)
    vals = np.asarray(m.values)
    locals_ = []
    for s in range(n_shards):
        lo, hi = offs[s * rows_per], offs[(s + 1) * rows_per]
        local = CsrMatrix.create(
            jnp.asarray(vals[lo:hi]),
            jnp.asarray(idx[lo:hi]),
            jnp.asarray(offs[s * rows_per : (s + 1) * rows_per + 1] - lo),
            (rows_per, m.cols),
        )
        locals_.append(SellMatrix.from_csr(local, chunk=chunk))
    width = max(sm.width for sm in locals_)
    sv, sc = [], []
    for sm in locals_:
        v = np.asarray(sm.values)
        c = np.asarray(sm.indices)
        pad = width - sm.width
        if pad:
            v = np.pad(v, ((0, 0), (0, pad), (0, 0)))
            c = np.pad(c, ((0, 0), (0, pad), (0, 0)), constant_values=chunk)
        sv.append(v)
        sc.append(c)
    return ShardedSellMatrix(
        values=jnp.asarray(np.stack(sv), dtype=m.dtype),
        indices=jnp.asarray(np.stack(sc)),
        shape=m.shape,
        chunk=chunk,
        n_shards=n_shards,
        partition="rows",
    )


def partition_sell_cols(m: CsrMatrix, n_shards: int, *, chunk: int = 128) -> ShardedSellMatrix:
    """Contraction(column)-partition a CSR into shard-local SELL bands.

    Local SpMM against the matching K band of B yields a PARTIAL product
    over full rows; :func:`sharded_spmm_kshard` reduce-scatters the partials
    (the survey's "partial products reduce-scattered over ICI" design)."""
    if m.cols % (n_shards * chunk):
        raise ValueError(
            f"cols {m.cols} must be divisible by n_shards*chunk = "
            f"{n_shards * chunk} for aligned K bands"
        )
    cols_per = m.cols // n_shards
    offs = np.asarray(m.offsets)
    idx = np.asarray(m.indices)
    vals = np.asarray(m.values)
    rowid = np.asarray(m.row_indices)
    locals_ = []
    for s in range(n_shards):
        lo_c, hi_c = s * cols_per, min((s + 1) * cols_per, m.cols)
        band_cols = max(hi_c - lo_c, chunk)
        sel = (idx >= lo_c) & (idx < hi_c)
        band = CsrMatrix.create(
            jnp.asarray(vals[sel]),
            jnp.asarray(idx[sel] - lo_c),
            jnp.asarray(
                np.concatenate([[0], np.cumsum(np.bincount(rowid[sel], minlength=m.rows))]
                ).astype(np.int32)
            ),
            (m.rows, band_cols),
        )
        locals_.append(SellMatrix.from_csr(band, chunk=chunk))
    width = max(sm.width for sm in locals_)
    chunks_per = max(sm.n_chunks for sm in locals_)
    sv, sc = [], []
    for sm in locals_:
        v = np.asarray(sm.values)
        c = np.asarray(sm.indices)
        pad_w = width - sm.width
        pad_ch = chunks_per - sm.n_chunks
        if pad_w or pad_ch:
            v = np.pad(v, ((0, pad_ch), (0, pad_w), (0, 0)))
            c = np.pad(c, ((0, pad_ch), (0, pad_w), (0, 0)), constant_values=chunk)
        sv.append(v)
        sc.append(c)
    return ShardedSellMatrix(
        values=jnp.asarray(np.stack(sv), dtype=m.dtype),
        indices=jnp.asarray(np.stack(sc)),
        shape=m.shape,
        chunk=chunk,
        n_shards=n_shards,
        partition="cols",
    )


def sharded_spmm_sell(
    a: ShardedSellMatrix,
    b: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "x",
    b_sharded_k: bool = False,
    out_dtype=None,
) -> jax.Array:
    """Row-partitioned SELL SpMM: the MXU-fast CSR engine over a mesh.

    B replicated (zero comm) or K-sharded (``all_gather`` over ICI first).
    Per-device work is the local slot rectangle — weak scaling by
    construction."""
    if a.partition != "rows":
        raise ValueError("sharded_spmm_sell needs a row-partitioned matrix")

    def local(values, indices, b_local):
        m = a.local_sell(values, indices)
        if b_sharded_k:
            b_full = jax.lax.all_gather(b_local, axis, axis=0, tiled=True)
        else:
            b_full = b_local
        return sell_kernels.spmm(m, b_full, out_dtype=out_dtype)

    b_spec = P(axis) if b_sharded_k else P()
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), b_spec),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(a.values, a.indices, b)


def sharded_spmm_kshard(
    a: ShardedSellMatrix,
    b: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "x",
    out_dtype=None,
) -> jax.Array:
    """Contraction-sharded SpMM: each device holds a K band of A (SELL) and
    the matching K band of B, computes a full-row partial product, and the
    partials are ``psum_scatter``-reduced into row-sharded C — no operand is
    ever replicated, the classic reduce-scatter matmul over ICI."""
    if a.partition != "cols":
        raise ValueError("sharded_spmm_kshard needs a column-partitioned matrix")
    out_dt = out_dtype or a.values.dtype

    def local(values, indices, b_local):
        m = a.local_sell(values, indices)
        partial = sell_kernels.spmm(m, b_local, out_dtype=jnp.float32)
        return jax.lax.psum_scatter(
            partial, axis, scatter_dimension=0, tiled=True
        ).astype(out_dt)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(a.values, a.indices, b)


def sharded_spmm(
    a: ShardedCsrMatrix,
    b: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "x",
    out_dtype=None,
) -> jax.Array:
    """Row-partitioned CSR SpMM over a mesh (the 1M-row north-star config)."""

    def local(values, indices, offsets, row_indices, b_local):
        m = CsrMatrix(
            values=values[0],
            indices=indices[0],
            offsets=offsets[0],
            row_indices=row_indices[0],
            shape=(a.local_rows, a.shape[1]),
        )
        return csr_ops.spmm(m, b_local, out_dtype=out_dtype)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(a.values, a.indices, a.offsets, a.row_indices, b)
