"""Sparse matrix formats and metadata transforms (pure JAX, all jittable).

This is the TPU-native equivalent of the reference's argument layer and
format utilities:

  * ``BlockSparseMatrix``  ~ reference ``sputnik/block/arguments.h:48-153``
    (``BlockMatrix`` descriptor: rows, cols, nonzeros, block_size + device
    pointers data/offsets/indices + transpose metadata
    offsets_t/indices_t/block_offsets + row_indices).
  * ``CsrMatrix``          ~ upstream-Sputnik CSR descriptor
    (``sputnik/matrix_utils.h``), required by the north star.
  * ``transpose metadata`` ~ reference ``block/transpose/transpose.cu:68-125``
    — there it is a host-side PoC with a D2H/H2D round trip; here it is a
    handful of jitted argsort/cumsum ops that never leave the device.
  * ``row indices``        ~ reference ``block/row_indices/row_indices.cu``
    (expand CSR offsets to a per-nonzero row id).
  * ``block position map`` ~ reference ``block/bitmask/bitmask.cu`` — the
    dense bit-matrix used by the sparse x sparse index merge. On TPU we keep
    an int32 position matrix with -1 sentinels instead of a packed bitmask:
    SMEM indices are 32-bit anyway and the position lookup merges the
    reference's two structures (bitmask + block_offsets) into one.

Conventions (the "BSR contract" from the reference, SURVEY.md section 2.1):
  * ``offsets[i]``  int32 prefix-sum of nonzero blocks per block-row,
    ``offsets[0] == 0``, ``offsets[-1] == nnz_blocks``.
  * ``indices[j]``  int32 block-column id of nonzero block ``j``. Indices
    within a row MAY be unordered (the reference's tests shuffle them).
  * ``data``        ``(nnz_blocks, bs, bs)`` blocks stored contiguously in
    block-row order, row-major within a block.
  * Padding blocks are legal: zero-valued blocks with a valid duplicate
    (row, col) — computation simply adds zero (reference
    ``matrix_utils.cu:272-282`` uses the same convention).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

__all__ = [
    "BlockSparseMatrix",
    "CsrMatrix",
    "EllMatrix",
    "SellMatrix",
    "bsr_from_dense",
    "bsr_to_dense",
    "csr_from_dense",
    "csr_to_dense",
    "build_transpose_metadata",
    "row_indices_from_offsets",
    "block_position_map",
    "block_bitmask",
    "sorted_row_swizzle",
]


# ---------------------------------------------------------------------------
# Metadata transforms (pure functions)
# ---------------------------------------------------------------------------


def row_indices_from_offsets(offsets: Array, nnz: int) -> Array:
    """Expand CSR-style ``offsets`` into a per-nonzero row id vector.

    TPU-native version of reference ``block/row_indices/row_indices.cu:7-19``
    (there: one CUDA block per row writing int16 ids; here: a single
    searchsorted, jittable, int32).
    """
    if nnz == 0:
        return jnp.zeros((0,), jnp.int32)
    # row of nonzero j = number of row starts <= j, minus one.
    return (
        jnp.searchsorted(offsets, jnp.arange(nnz, dtype=offsets.dtype), side="right")
        .astype(jnp.int32)
        - 1
    )


def build_transpose_metadata(
    offsets: Array, indices: Array, n_cols_b: int
) -> Tuple[Array, Array, Array]:
    """Build (offsets_t, indices_t, block_offsets) for transposed iteration.

    Values are never moved — like the reference (``transpose.cu:68-125``),
    only an index indirection is produced:
      * ``block_offsets[s]`` physical position in ``data`` of the s-th block
        when iterating in column-major order (stable argsort by column id),
      * ``indices_t[s]``     the block-row id of that block,
      * ``offsets_t[c]``     prefix-sum of blocks per block-column.

    Unlike the reference's host-side PoC (D2H, host argsort, H2D — a
    serialization point called out at ``transpose.cu:68``), this is pure
    jittable JAX and runs on device.
    """
    nnz = indices.shape[0]
    row_ids = row_indices_from_offsets(offsets, nnz)
    order = jnp.argsort(indices, stable=True).astype(jnp.int32)
    indices_t = row_ids[order]
    counts = jnp.zeros((n_cols_b,), jnp.int32).at[indices].add(1)
    offsets_t = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )
    return offsets_t, indices_t, order


def block_position_map(
    offsets: Array, indices: Array, n_rows_b: int, n_cols_b: int
) -> Array:
    """Dense ``(n_rows_b, n_cols_b)`` int32 map: block position or -1.

    ``pos[r, c]`` = index into ``data`` of block (r, c), or -1 when absent.
    This subsumes the reference's bitmask (``bitmask.cu``, presence) and
    ``block_offsets`` (position) in one structure; the sparse x sparse
    kernel derives validity as ``pos >= 0``.
    """
    nnz = indices.shape[0]
    row_ids = row_indices_from_offsets(offsets, nnz)
    pos = jnp.full((n_rows_b, n_cols_b), -1, jnp.int32)
    if nnz == 0:
        return pos
    # Padding blocks duplicate a (row, col) slot; `.max` keeps a valid id.
    return pos.at[row_ids, indices].max(jnp.arange(nnz, dtype=jnp.int32))


def block_bitmask(
    offsets: Array, indices: Array, n_rows_b: int, n_cols_b: int
) -> Array:
    """Packed presence bitmask of the block pattern: ``(n_rows_b, words)``
    uint32, bit ``c % 32`` of word ``c // 32`` set iff block (r, c) exists.

    Layout parity with the reference's ``BitMatrix`` (``bit_matrix.h:10-53``,
    64-bit words there, 32-bit here to match TPU SMEM width; rows padded to
    whole words). The sparse×sparse kernels consume the richer
    :func:`block_position_map` instead — this packed form exists for
    interop, debugging, and pattern set-algebra (AND of two masks = the
    DSS intersection, ``index_merge.h:163-169``).
    """
    words = -(-n_cols_b // 32)
    pos = block_position_map(offsets, indices, n_rows_b, n_cols_b)
    present = pos >= 0  # (n_rows_b, n_cols_b)
    pad = words * 32 - n_cols_b
    if pad:
        present = jnp.pad(present, ((0, 0), (0, pad)))
    bits = present.reshape(n_rows_b, words, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return jnp.sum(bits << shifts, axis=2, dtype=jnp.uint32)


def sorted_row_swizzle(offsets: Array) -> Array:
    """Argsort block-rows by descending nonzero count.

    The classic Sputnik load-balance trick (reference
    ``matrix_utils.cu:348-363`` ``SortedRowSwizzle``): schedule long rows
    first. On TPU this orders row-tiles of CSR kernels so the sequential
    grid sweep retires imbalanced rows early.
    """
    row_nnz = offsets[1:] - offsets[:-1]
    return jnp.argsort(-row_nnz, stable=True).astype(jnp.int32)


# ---------------------------------------------------------------------------
# BlockSparseMatrix
# ---------------------------------------------------------------------------


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "data",
        "offsets",
        "indices",
        "row_indices",
        "offsets_t",
        "indices_t",
        "block_offsets",
    ],
    meta_fields=["shape", "block_size", "max_row_nnz", "max_col_nnz", "min_row_nnz", "min_col_nnz"],
)
@dataclasses.dataclass(frozen=True)
class BlockSparseMatrix:
    """BSR matrix descriptor (pytree). See module docstring for the contract.

    TPU-native analogue of reference ``block/arguments.h:48-153``
    (``BlockMatrix``). The transpose metadata fields are optional; ops that
    need them build them on the fly (jit-safe) unless pre-attached with
    :meth:`with_transpose_metadata` — the analogue of the reference's
    ``MatmulEx`` / ``create_metadata=false`` fast path
    (``block/dsd/dsd.cu:20-27``), except here "building" is cheap device
    compute rather than a host round-trip.
    """

    data: Array  # (nnz_blocks, bs, bs)
    offsets: Array  # (block_rows + 1,) int32
    indices: Array  # (nnz_blocks,) int32 block-column ids
    row_indices: Optional[Array]  # (nnz_blocks,) int32 block-row ids
    offsets_t: Optional[Array]  # (block_cols + 1,) int32
    indices_t: Optional[Array]  # (nnz_blocks,) int32 block-row ids, col-major order
    block_offsets: Optional[Array]  # (nnz_blocks,) int32 physical pos, col-major order
    shape: Tuple[int, int]  # static (rows, cols) in elements
    block_size: int  # static
    # Optional static hints: max nonzero blocks in any block-row / block-col.
    # Bound the trip count of variable-step kernels (SSD/SDS/DSS); when None,
    # kernels fall back to the worst-case bound (block_cols / block_rows).
    # The reference analogue is `nonzeros` living in the descriptor
    # (arguments.h:49) so grids stay static.
    max_row_nnz: Optional[int] = None
    max_col_nnz: Optional[int] = None
    # Minimum per-group hints: when >= 1 (no empty block-rows/cols, known at
    # construction), DSD/DDS skip their empty-group output masking pass even
    # under jit where offsets are traced.
    min_row_nnz: Optional[int] = None
    min_col_nnz: Optional[int] = None

    # -- static geometry ----------------------------------------------------
    @property
    def rows(self) -> int:
        return self.shape[0]

    @property
    def cols(self) -> int:
        return self.shape[1]

    @property
    def block_rows(self) -> int:
        return self.shape[0] // self.block_size

    @property
    def block_cols(self) -> int:
        return self.shape[1] // self.block_size

    @property
    def nnz_blocks(self) -> int:
        return self.data.shape[0]

    @property
    def nnz(self) -> int:
        return self.data.shape[0] * self.block_size * self.block_size

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def density(self) -> float:
        total = self.block_rows * self.block_cols
        return self.nnz_blocks / max(total, 1)

    # -- constructors --------------------------------------------------------
    @staticmethod
    def create(
        data: Array,
        offsets: Array,
        indices: Array,
        shape: Tuple[int, int],
        *,
        row_indices: Optional[Array] = None,
        with_transpose: bool = False,
        max_row_nnz: Optional[int] = None,
        max_col_nnz: Optional[int] = None,
    ) -> "BlockSparseMatrix":
        bs = int(data.shape[-1])
        if data.ndim != 3 or data.shape[1] != bs:
            raise ValueError(f"data must be (nnz_blocks, bs, bs), got {data.shape}")
        if shape[0] % bs or shape[1] % bs:
            raise ValueError(f"shape {shape} not divisible by block_size {bs}")
        offsets = offsets.astype(jnp.int32)
        indices = indices.astype(jnp.int32)
        if row_indices is None:
            row_indices = row_indices_from_offsets(offsets, data.shape[0])
        min_row_nnz = min_col_nnz = None
        if max_row_nnz is None and not isinstance(offsets, jax.core.Tracer):
            o = np.asarray(offsets)
            counts = o[1:] - o[:-1]
            max_row_nnz = int(counts.max()) if o.size > 1 else 0
            min_row_nnz = int(counts.min()) if o.size > 1 else 0
        if max_col_nnz is None and not isinstance(indices, jax.core.Tracer):
            i = np.asarray(indices)
            col_counts = np.bincount(i, minlength=shape[1] // bs)
            max_col_nnz = int(col_counts.max()) if i.size else 0
            min_col_nnz = int(col_counts.min()) if i.size else 0
        m = BlockSparseMatrix(
            data=data,
            offsets=offsets,
            indices=indices,
            row_indices=row_indices.astype(jnp.int32),
            offsets_t=None,
            indices_t=None,
            block_offsets=None,
            shape=(int(shape[0]), int(shape[1])),
            block_size=bs,
            max_row_nnz=max_row_nnz,
            max_col_nnz=max_col_nnz,
            min_row_nnz=min_row_nnz,
            min_col_nnz=min_col_nnz,
        )
        if with_transpose:
            m = m.with_transpose_metadata()
        return m

    # -- metadata ------------------------------------------------------------
    def with_transpose_metadata(self) -> "BlockSparseMatrix":
        """Attach (offsets_t, indices_t, block_offsets); idempotent."""
        if self.offsets_t is not None:
            return self
        offsets_t, indices_t, block_offsets = build_transpose_metadata(
            self.offsets, self.indices, self.block_cols
        )
        return dataclasses.replace(
            self,
            offsets_t=offsets_t,
            indices_t=indices_t,
            block_offsets=block_offsets,
        )

    def position_map(self) -> Array:
        """Dense (block_rows, block_cols) int32 position-or-minus-one map."""
        return block_position_map(
            self.offsets, self.indices, self.block_rows, self.block_cols
        )

    def iteration_arrays(self, transposed: bool) -> Tuple[Array, Array, Array]:
        """(row_ids, col_ids, data_ids) in kernel iteration order.

        Natural order: blocks sorted by block-row (CSR order). Transposed
        order: blocks sorted by block-column, reached through the transpose
        metadata — the Pallas analogue of the reference's two iterator
        advance modes (``block_tile_access_iterator.h:217-234``). For the
        transposed view, "row" means the transposed matrix's row (= original
        column).
        """
        if not transposed:
            return self.row_indices, self.indices, jnp.arange(
                self.nnz_blocks, dtype=jnp.int32
            )
        m = self.with_transpose_metadata()
        t_rows = m.indices[m.block_offsets]  # sorted original col ids
        return t_rows, m.indices_t, m.block_offsets

    def transpose(self) -> "BlockSparseMatrix":
        """Materialize the transposed matrix (blocks moved AND transposed).

        Unlike :meth:`with_transpose_metadata` (index indirection only, what
        the matmul kernels consume), this produces a standalone BSR of shape
        (cols, rows). Used by oracles and the distributed layer.
        """
        m = self.with_transpose_metadata()
        data_t = jnp.transpose(m.data[m.block_offsets], (0, 2, 1))
        return BlockSparseMatrix(
            data=data_t,
            offsets=m.offsets_t,
            indices=m.indices_t,
            row_indices=m.indices[m.block_offsets],
            offsets_t=None,
            indices_t=None,
            block_offsets=None,
            shape=(self.shape[1], self.shape[0]),
            block_size=self.block_size,
            max_row_nnz=self.max_col_nnz,
            max_col_nnz=self.max_row_nnz,
            min_row_nnz=self.min_col_nnz,
            min_col_nnz=self.min_row_nnz,
        )

    def to_dense(self) -> Array:
        return bsr_to_dense(self)

    def astype(self, dtype) -> "BlockSparseMatrix":
        return dataclasses.replace(self, data=self.data.astype(dtype))

    def with_data(self, data: Array) -> "BlockSparseMatrix":
        """Same topology, new block values (shape/dtype may change dtype)."""
        if data.shape != self.data.shape:
            raise ValueError(f"data shape {data.shape} != {self.data.shape}")
        return dataclasses.replace(self, data=data)


def bsr_from_dense(
    x: Array | np.ndarray, block_size: int, *, prune_zero_blocks: bool = True
) -> BlockSparseMatrix:
    """Convert a dense matrix to BSR. Host-side (data-dependent nnz).

    Analogue of the reference test helper ``ToMatrix`` inverse
    (``block/matrix_utils.h:81-112``). Not jittable: the number of nonzero
    blocks is data-dependent. Inside jit, build topologies explicitly.
    """
    x = np.asarray(x)
    rows, cols = x.shape
    bs = block_size
    if rows % bs or cols % bs:
        raise ValueError(f"shape {x.shape} not divisible by block_size {bs}")
    br, bc = rows // bs, cols // bs
    blocks = x.reshape(br, bs, bc, bs).transpose(0, 2, 1, 3)  # (br, bc, bs, bs)
    if prune_zero_blocks:
        mask = np.abs(blocks).sum(axis=(2, 3)) != 0
    else:
        mask = np.ones((br, bc), dtype=bool)
    r, c = np.nonzero(mask)  # row-major order = CSR block order
    data = blocks[r, c]
    offsets = np.zeros(br + 1, np.int32)
    np.add.at(offsets[1:], r, 1)
    offsets = np.cumsum(offsets).astype(np.int32)
    return BlockSparseMatrix.create(
        jnp.asarray(data),
        jnp.asarray(offsets),
        jnp.asarray(c.astype(np.int32)),
        (rows, cols),
    )


def bsr_to_dense(m: BlockSparseMatrix) -> Array:
    """Densify (jittable). Padding blocks (zero values, duplicate slots) are
    accumulated, matching the reference convention."""
    bs, br, bc = m.block_size, m.block_rows, m.block_cols
    dense = jnp.zeros((br, bc, bs, bs), m.data.dtype)
    dense = dense.at[m.row_indices, m.indices].add(m.data)
    return dense.transpose(0, 2, 1, 3).reshape(m.rows, m.cols)


# ---------------------------------------------------------------------------
# CsrMatrix
# ---------------------------------------------------------------------------


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["values", "indices", "offsets", "row_indices", "dense_mirror"],
    meta_fields=["shape"],
)
@dataclasses.dataclass(frozen=True)
class CsrMatrix:
    """Element-granular CSR matrix (pytree) — the upstream-Sputnik format.

    Padding entries are legal: zero values with a valid duplicate column id
    (reference ``matrix_utils.cu:272-282``).

    ``dense_mirror`` (opt-in, :meth:`with_dense_mirror`) keeps a dense copy
    alongside the sparse descriptor for *static* matrices (weights): on TPU
    a resident dense operand turns SpMM into a pure MXU matmul, orders of
    magnitude past any gather-based path at DL sparsities. The sparse
    arrays remain the source of truth; the mirror is a cached execution
    strategy, the spirit of the reference's pre-built metadata buffers.
    """

    values: Array  # (nnz,)
    indices: Array  # (nnz,) int32 column ids
    offsets: Array  # (rows + 1,) int32
    row_indices: Optional[Array]  # (nnz,) int32 row ids
    shape: Tuple[int, int]
    dense_mirror: Optional[Array] = None  # (rows, cols), same dtype

    @property
    def rows(self) -> int:
        return self.shape[0]

    @property
    def cols(self) -> int:
        return self.shape[1]

    @property
    def nnz(self) -> int:
        return self.values.shape[0]

    @property
    def dtype(self):
        return self.values.dtype

    @staticmethod
    def create(
        values: Array,
        indices: Array,
        offsets: Array,
        shape: Tuple[int, int],
        *,
        row_indices: Optional[Array] = None,
    ) -> "CsrMatrix":
        offsets = offsets.astype(jnp.int32)
        indices = indices.astype(jnp.int32)
        if row_indices is None:
            row_indices = row_indices_from_offsets(offsets, values.shape[0])
        return CsrMatrix(
            values=values,
            indices=indices,
            offsets=offsets,
            row_indices=row_indices.astype(jnp.int32),
            shape=(int(shape[0]), int(shape[1])),
        )

    def with_values(self, values: Array) -> "CsrMatrix":
        if values.shape != self.values.shape:
            raise ValueError(f"values shape {values.shape} != {self.values.shape}")
        # New values invalidate a cached mirror.
        return dataclasses.replace(self, values=values, dense_mirror=None)

    def with_dense_mirror(self) -> "CsrMatrix":
        """Attach a dense copy for the MXU fast path; idempotent."""
        if self.dense_mirror is not None:
            return self
        return dataclasses.replace(self, dense_mirror=csr_to_dense(self))

    def astype(self, dtype) -> "CsrMatrix":
        return dataclasses.replace(
            self,
            values=self.values.astype(dtype),
            dense_mirror=None
            if self.dense_mirror is None
            else self.dense_mirror.astype(dtype),
        )

    def to_dense(self) -> Array:
        return csr_to_dense(self)

    def transpose(self) -> "CsrMatrix":
        offsets_t, indices_t, order = build_transpose_metadata(
            self.offsets, self.indices, self.cols
        )
        return CsrMatrix(
            values=self.values[order],
            indices=indices_t,
            offsets=offsets_t,
            row_indices=self.indices[order],
            shape=(self.shape[1], self.shape[0]),
        )


def csr_from_dense(x: Array | np.ndarray, *, pad_rows_to: int = 1) -> CsrMatrix:
    """Dense -> CSR on host, optionally padding each row's nnz to a multiple
    of ``pad_rows_to`` with zero-valued duplicate-column entries (reference
    ``matrix_utils.cu:267-287``)."""
    x = np.asarray(x)
    rows, cols = x.shape
    vals, idxs, counts = [], [], np.zeros(rows, np.int64)
    for r in range(rows):
        (cidx,) = np.nonzero(x[r])
        v = x[r][cidx]
        pad = (-len(cidx)) % pad_rows_to
        if pad:
            pad_col = cidx[-1] if len(cidx) else 0
            cidx = np.concatenate([cidx, np.full(pad, pad_col, cidx.dtype if len(cidx) else np.int64)])
            v = np.concatenate([v, np.zeros(pad, x.dtype)])
        vals.append(v)
        idxs.append(cidx)
        counts[r] = len(cidx)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    values = np.concatenate(vals) if vals else np.zeros((0,), x.dtype)
    indices = np.concatenate(idxs).astype(np.int32) if idxs else np.zeros((0,), np.int32)
    return CsrMatrix.create(jnp.asarray(values), jnp.asarray(indices), jnp.asarray(offsets), (rows, cols))


def csr_to_dense(m: CsrMatrix) -> Array:
    dense = jnp.zeros(m.shape, m.values.dtype)
    return dense.at[m.row_indices, m.indices].add(m.values)


# ---------------------------------------------------------------------------
# EllMatrix — padded-row layout, the TPU-fast clothing for CSR
# ---------------------------------------------------------------------------


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["values", "indices", "row_nnz"],
    meta_fields=["shape"],
)
@dataclasses.dataclass(frozen=True)
class EllMatrix:
    """ELL (padded rows) sparse matrix: ``values/indices`` are dense
    ``(rows, width)`` with per-row occupancy ``row_nnz``.

    Element-granular scatters/gathers cost ~10 ns each on TPU, which makes
    raw CSR segment ops hopeless; rectangles of row-gathers and dense VPU
    math are the native idiom. This plays the role of upstream Sputnik's
    row-binning/swizzle load-balance machinery (``matrix_utils.cu:348-363``,
    ``tiling_utils.h``): instead of binning warps onto ragged rows, bin the
    rows into a rectangle. Padding slots have value 0 and a clamped valid
    column id (inert in matmuls, masked in softmax).
    """

    values: Array  # (rows, width)
    indices: Array  # (rows, width) int32
    row_nnz: Array  # (rows,) int32
    shape: Tuple[int, int]

    @property
    def rows(self) -> int:
        return self.shape[0]

    @property
    def cols(self) -> int:
        return self.shape[1]

    @property
    def width(self) -> int:
        return self.values.shape[1]

    @property
    def nnz(self) -> int:  # padded
        return self.values.shape[0] * self.values.shape[1]

    @property
    def dtype(self):
        return self.values.dtype

    def valid_mask(self) -> Array:
        w = jax.lax.broadcasted_iota(jnp.int32, (self.rows, self.width), 1)
        return w < self.row_nnz[:, None]

    def with_values(self, values: Array) -> "EllMatrix":
        if values.shape != self.values.shape:
            raise ValueError(f"values shape {values.shape} != {self.values.shape}")
        return dataclasses.replace(self, values=values)

    def astype(self, dtype) -> "EllMatrix":
        return dataclasses.replace(self, values=self.values.astype(dtype))

    @staticmethod
    def from_csr(m: CsrMatrix, width: Optional[int] = None) -> "EllMatrix":
        """CSR -> ELL. With concrete metadata this runs on host (cheap numpy,
        avoiding the device's slow element gathers); traced falls back to a
        jitted gather. ``width`` defaults to the max row nnz."""
        row_nnz = m.offsets[1:] - m.offsets[:-1]
        if not isinstance(m.offsets, jax.core.Tracer):
            o = np.asarray(m.offsets)
            counts = o[1:] - o[:-1]
            w = int(counts.max()) if width is None else int(width)
            rows = m.rows
            slots = np.minimum(
                o[:-1, None] + np.arange(w)[None, :], max(int(o[-1]) - 1, 0)
            )
            valid = np.arange(w)[None, :] < counts[:, None]
            if not isinstance(m.values, jax.core.Tracer):
                vals = np.where(valid, np.asarray(m.values)[slots], 0)
                vals = jnp.asarray(vals)
            else:
                vals = jnp.where(
                    jnp.asarray(valid), jnp.take(m.values, jnp.asarray(slots)), 0
                )
            idx = np.where(valid, np.asarray(m.indices)[slots], 0).astype(np.int32)
            return EllMatrix(
                values=vals,
                indices=jnp.asarray(idx),
                row_nnz=jnp.asarray(counts.astype(np.int32)),
                shape=m.shape,
            )
        if width is None:
            raise ValueError("width must be given for traced CSR metadata")
        r = jnp.arange(m.rows, dtype=jnp.int32)[:, None]
        wv = jnp.arange(width, dtype=jnp.int32)[None, :]
        slots = m.offsets[:-1][:, None] + wv
        valid = slots < m.offsets[1:][:, None]
        slots = jnp.minimum(slots, max(m.nnz - 1, 0))
        del r
        return EllMatrix(
            values=jnp.where(valid, jnp.take(m.values, slots), 0),
            indices=jnp.where(valid, jnp.take(m.indices, slots), 0).astype(jnp.int32),
            row_nnz=(m.offsets[1:] - m.offsets[:-1]).astype(jnp.int32),
            shape=m.shape,
        )

    def to_dense(self) -> Array:
        dense = jnp.zeros(self.shape, self.values.dtype)
        r = jnp.broadcast_to(
            jnp.arange(self.rows, dtype=jnp.int32)[:, None], self.values.shape
        )
        vals = jnp.where(self.valid_mask(), self.values, 0)
        return dense.at[r.reshape(-1), self.indices.reshape(-1)].add(vals.reshape(-1))


# ---------------------------------------------------------------------------
# SellMatrix — sliced-ELL by column chunks, the MXU clothing for CSR
# ---------------------------------------------------------------------------


# chunk="auto" crossover: below this many nonzeros per (row, 128-col chunk)
# the 64-wide chunk wins. v5e measurements: at 12.8 (90% sparsity) 128 wins
# (10.8 vs 13.8 us on 512^2), at 6.4 (95%) 64 wins (18.5 vs 29.1 on 1024^2).
_AUTO_CHUNK_CROSSOVER = 9.0


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["values", "indices", "tile_widths", "row_perm",
                 "slot_counts"],
    meta_fields=["shape", "chunk", "pad_rows"],
)
@dataclasses.dataclass(frozen=True)
class SellMatrix:
    """Sliced-ELL: nonzeros grouped by 128-column chunk of the contraction
    dimension, stored slot-major.

    ``values/indices`` are ``(n_chunks, width, rows_padded)`` — the slot
    ("width") axis lives in sublanes and the row axis in lanes, so a Pallas
    kernel can reconstruct a dense ``(chunk, row_tile)`` panel with one
    broadcast-compare-select per slot and feed it straight to the MXU (the
    ``sell_spmm`` kernel). This is the TPU answer to upstream Sputnik's CSR
    SpMM machinery (row swizzles, subwarp tilings, vector loads,
    ``memory_aligner.h``): element gathers cost ~10ns each on TPU, so the
    winning move is to rebuild MXU-shaped tiles from the sparse data with
    dense VPU ops, not to chase gathers.

    ``indices`` hold the column id *within* the chunk (0..chunk-1); padding
    slots carry the sentinel ``chunk``, which never matches a lane id — no
    separate mask array is needed anywhere. Rows are padded to a multiple
    of 128 (``pad_rows`` extra, all sentinel).
    """

    values: Array  # (n_chunks, width, rows_padded)
    indices: Array  # (n_chunks, width, rows_padded) int32; `chunk` = padding
    shape: Tuple[int, int]  # logical (rows, cols)
    chunk: int  # column-chunk width (128)
    pad_rows: int  # rows_padded - rows
    # Per-(chunk, 128-row tile) max slot count: kernels bound their slot
    # loops by this instead of the global width, so ragged rows only cost
    # their own tile. The TPU expression of Sputnik's SortedRowSwizzle load
    # balancing (matrix_utils.cu:348-363): combined with sort_rows=True the
    # rows of a tile have near-equal lengths and the bound is tight.
    tile_widths: Optional[Array] = None  # (n_chunks, rows_padded // 128) int32
    # When rows were sorted at construction: storage row r holds logical
    # row row_perm[r]. Kernels produce storage-ordered outputs; the op
    # layer unpermutes (spmm) / permutes inputs (sddmm) exactly once.
    row_perm: Optional[Array] = None  # (rows_padded,) int32
    # Per-(chunk, storage-row) valid-slot count: slots 0..count-1 of a
    # (chunk, row) group are real (construction keeps CSR order, so valid
    # slots are a PREFIX of the width axis). Value-only kernels (row
    # softmax) derive their mask from this instead of streaming the full
    # int32 ``indices`` rectangle — one slot pass of traffic saved
    # (round 5; the reconstruct kernels still need ``indices``).
    slot_counts: Optional[Array] = None  # (n_chunks, rows_padded) int32

    @property
    def rows(self) -> int:
        return self.shape[0]

    @property
    def cols(self) -> int:
        return self.shape[1]

    @property
    def rows_padded(self) -> int:
        return self.values.shape[2]

    @property
    def n_chunks(self) -> int:
        return self.values.shape[0]

    @property
    def width(self) -> int:
        return self.values.shape[1]

    @property
    def nnz(self) -> int:  # padded slot count
        return int(np.prod(self.values.shape))

    @property
    def dtype(self):
        return self.values.dtype

    def valid_mask(self) -> Array:
        return self.indices < self.chunk

    def with_values(self, values: Array) -> "SellMatrix":
        if values.shape != self.values.shape:
            raise ValueError(f"values shape {values.shape} != {self.values.shape}")
        return dataclasses.replace(self, values=values)

    def astype(self, dtype) -> "SellMatrix":
        return dataclasses.replace(self, values=self.values.astype(dtype))

    @staticmethod
    def from_csr(
        m: CsrMatrix, *, chunk: int | str = 128, sort_rows: bool = False
    ) -> "SellMatrix":
        """CSR -> sliced-ELL on the host (concrete metadata required: the
        width is data-dependent). Stable: slots within a (row, chunk) group
        keep CSR order, so unordered column indices are preserved.

        ``chunk="auto"`` picks the column-chunk width by density: the
        reconstruct kernels pay one full (chunk x row-tile) VPU select per
        SLOT, so at very high sparsity (few slots per 128-col chunk)
        halving the chunk halves the wasted select area faster than the
        extra raggedness costs (measured on v5e: chunk 64 beat 128 by
        1.15-1.3x at 98% sparsity, 128 beat 64 at <= 90%).

        ``sort_rows=True`` applies the Sputnik SortedRowSwizzle at
        construction: storage rows ordered by descending nnz, so each
        128-row tile has near-uniform lengths and the per-tile slot bounds
        (``tile_widths``) are tight. The op layer un/permutes at the
        boundaries; heavy-tailed row distributions (magnitude pruning) gain
        the most. The un/permute is a row gather per op — at very large
        row counts with already-small widths (<= ~16 slots, where kernels
        unroll statically anyway) leave sorting off.
        """
        for x, what in ((m.offsets, "offsets"), (m.indices, "indices"), (m.values, "values")):
            if isinstance(x, jax.core.Tracer):
                raise ValueError(
                    f"SellMatrix.from_csr needs concrete {what}; build the "
                    "format outside jit and pass it through as a pytree"
                )
        rows, cols = m.shape
        if chunk == "auto":
            nnz_per_row_chunk128 = m.nnz / max(rows, 1) * 128.0 / max(cols, 1)
            chunk = 64 if nnz_per_row_chunk128 < _AUTO_CHUNK_CROSSOVER else 128
        rows_p = max(-(-rows // 128) * 128, 128)
        n_chunks = max(-(-cols // chunk), 1)
        vals = np.asarray(m.values)
        cidx = np.asarray(m.indices)
        ridx = np.asarray(m.row_indices).astype(np.int64)

        row_perm = None
        if sort_rows:
            offs = np.asarray(m.offsets)
            lens = offs[1:] - offs[:-1]
            order_rows = np.argsort(-lens, kind="stable").astype(np.int32)
            row_perm = np.concatenate(
                [order_rows, np.arange(rows, rows_p, dtype=np.int32)]
            )
            inv = np.empty(rows, np.int64)
            inv[order_rows] = np.arange(rows)
            ridx = inv[ridx]  # storage row of each nonzero

        chunk_of = cidx // chunk
        order = np.lexsort((np.arange(len(cidx)), chunk_of, ridx))
        r_s, ch_s = ridx[order], chunk_of[order]
        c_s, v_s = (cidx[order] % chunk).astype(np.int32), vals[order]
        key = r_s * n_chunks + ch_s
        if len(key):
            newgrp = np.concatenate([[True], key[1:] != key[:-1]])
            grp_start = np.maximum.accumulate(
                np.where(newgrp, np.arange(len(key)), 0)
            )
            slot = np.arange(len(key)) - grp_start
            width = int(slot.max()) + 1
        else:
            slot = np.zeros((0,), np.int64)
            width = 1
        sv = np.zeros((n_chunks, width, rows_p), vals.dtype)
        sc = np.full((n_chunks, width, rows_p), chunk, np.int32)
        sv[ch_s, slot, r_s] = v_s
        sc[ch_s, slot, r_s] = c_s
        # Per-(chunk, row-tile) slot bound from per-(row, chunk) counts.
        counts = np.zeros((n_chunks, rows_p), np.int32)
        np.add.at(counts, (ch_s, r_s), 1)
        tw = counts.reshape(n_chunks, rows_p // 128, 128).max(axis=2)
        return SellMatrix(
            values=jnp.asarray(sv, dtype=m.dtype),
            indices=jnp.asarray(sc),
            shape=(rows, cols),
            chunk=chunk,
            pad_rows=rows_p - rows,
            tile_widths=jnp.asarray(tw),
            row_perm=None if row_perm is None else jnp.asarray(row_perm),
            slot_counts=jnp.asarray(counts),
        )

    def to_dense(self) -> Array:
        dense = jnp.zeros((self.n_chunks, self.chunk + 1, self.rows_padded), self.dtype)
        ch = jnp.broadcast_to(
            jnp.arange(self.n_chunks, dtype=jnp.int32)[:, None, None], self.values.shape
        )
        rr = jnp.broadcast_to(
            jnp.arange(self.rows_padded, dtype=jnp.int32)[None, None, :], self.values.shape
        )
        dense = dense.at[ch.reshape(-1), self.indices.reshape(-1), rr.reshape(-1)].add(
            self.values.reshape(-1)
        )
        dense = dense[:, : self.chunk, :]  # drop the sentinel plane
        full = dense.transpose(2, 0, 1).reshape(
            self.rows_padded, self.n_chunks * self.chunk
        )
        if self.row_perm is not None:  # storage row r holds logical row perm[r]
            full = jnp.zeros_like(full).at[self.row_perm].set(full)
        return full[: self.rows, : self.cols]
