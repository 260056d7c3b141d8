"""Random sparse-matrix generators and test oracles.

TPU-native equivalent of the reference's test-matrix utilities
(``sputnik/matrix_utils.{h,cu}`` and ``sputnik/block/matrix_utils.{h,cu}``):

  * ``random_csr`` ~ ``MakeSparseMatrixRandomUniform`` (``matrix_utils.cu:
    226-290``): uniformly random nonzero placement, each row's nnz padded to
    a multiple of ``pad_rows_to`` with zero-valued duplicate-column entries.
  * ``perfect_uniform_csr`` ~ ``MakeSparseMatrixPerfectUniform``
    (``matrix_utils.cu:307-342``): identical nnz per row.
  * ``random_bsr`` ~ ``BlockSparseMatrix`` generator (``block/matrix_utils.
    cu:7-95``): generates the *block* pattern with the CSR generator and
    expands; ``unordered_indices`` shuffles column ids within each row
    (``:86-94``) — kernels must tolerate it.
  * ``dense_oracle_matmul`` ~ the CPU fp64-accumulation golden model
    (``matrix_utils.h:376-391``); tests compare pointwise at 5e-2, matching
    ``NanSensitiveFloatNear(5e-2)`` (``dsd_test.cu:192``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sputnik_tpu.formats import BlockSparseMatrix, CsrMatrix

__all__ = [
    "random_csr_topology",
    "random_csr",
    "perfect_uniform_csr",
    "random_bsr",
    "random_bsr_topology",
    "bsr_from_blocks",
    "dense_oracle_matmul",
    "ATOL",
]

ATOL = 5e-2  # the reference's NanSensitiveFloatNear tolerance


def _random_topology(
    rng: np.random.Generator,
    rows: int,
    cols: int,
    nnz: int,
    *,
    pad_rows_to: int = 1,
    perfect_uniform: bool = False,
    unordered: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Return (offsets, indices) of a random CSR pattern.

    Padding entries duplicate a valid column id in the row; callers must
    zero their values (the reference convention, ``matrix_utils.cu:272-282``).
    Returns also an `is_pad` mask aligned with indices via the third element.
    """
    if perfect_uniform:
        if nnz % rows:
            raise ValueError("perfect uniform needs nnz % rows == 0")
        per_row = [nnz // rows] * rows
    else:
        # Choose nnz positions uniformly over the whole matrix.
        flat = rng.choice(rows * cols, size=nnz, replace=False)
        per_row = np.bincount(flat // cols, minlength=rows).tolist()

    offsets = [0]
    indices = []
    pad_mask = []
    for r in range(rows):
        k = per_row[r]
        cidx = np.sort(rng.choice(cols, size=k, replace=False))
        pad = (-k) % pad_rows_to if pad_rows_to > 1 else 0
        if k == 0 and pad:
            cidx = np.zeros(pad, np.int64)
            pm = np.ones(pad, bool)
        else:
            pm = np.zeros(k, bool)
            if pad:
                cidx = np.concatenate([cidx, np.full(pad, cidx[-1] if k else 0)])
                pm = np.concatenate([pm, np.ones(pad, bool)])
        if unordered and len(cidx) > 1:
            perm = rng.permutation(len(cidx))
            cidx, pm = cidx[perm], pm[perm]
        indices.append(cidx)
        pad_mask.append(pm)
        offsets.append(offsets[-1] + len(cidx))
    offsets = np.asarray(offsets, np.int32)
    indices = (
        np.concatenate(indices).astype(np.int32) if indices else np.zeros(0, np.int32)
    )
    pad_mask = (
        np.concatenate(pad_mask) if pad_mask else np.zeros(0, bool)
    )
    return offsets, indices, pad_mask


def random_csr_topology(rng, rows, cols, nnz, **kw):
    offsets, indices, _ = _random_topology(rng, rows, cols, nnz, **kw)
    return offsets, indices


def random_csr(
    rng: np.random.Generator,
    rows: int,
    cols: int,
    nnz: int,
    *,
    dtype=jnp.float32,
    pad_rows_to: int = 1,
    unordered: bool = False,
) -> CsrMatrix:
    offsets, indices, pad = _random_topology(
        rng, rows, cols, nnz, pad_rows_to=pad_rows_to, unordered=unordered
    )
    values = rng.standard_normal(len(indices)).astype(np.float32)
    values[pad] = 0.0
    return CsrMatrix.create(
        jnp.asarray(values, dtype=dtype),
        jnp.asarray(indices),
        jnp.asarray(offsets),
        (rows, cols),
    )


def perfect_uniform_csr(rng, rows, cols, nnz, *, dtype=jnp.float32) -> CsrMatrix:
    offsets, indices, _ = _random_topology(rng, rows, cols, nnz, perfect_uniform=True)
    values = rng.standard_normal(len(indices)).astype(np.float32)
    return CsrMatrix.create(
        jnp.asarray(values, dtype=dtype),
        jnp.asarray(indices),
        jnp.asarray(offsets),
        (rows, cols),
    )


def random_bsr_topology(
    rng: np.random.Generator,
    rows: int,
    cols: int,
    nnz_blocks: int,
    block_size: int,
    *,
    pad_rows_to: int = 1,
    unordered: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    br, bc = rows // block_size, cols // block_size
    return _random_topology(
        rng, br, bc, nnz_blocks, pad_rows_to=pad_rows_to, unordered=unordered
    )


def random_bsr(
    rng: np.random.Generator,
    rows: int,
    cols: int,
    nnz: int,
    block_size: int,
    *,
    dtype=jnp.float32,
    pad_rows_to: int = 1,
    unordered: bool = False,
    perfect_uniform: bool = False,
) -> BlockSparseMatrix:
    """Random BSR with ``nnz`` nonzero *elements* rounded up to whole blocks
    (the reference rounds nnz up to block^2, ``block/matrix_utils.cu:7-95``).
    ``perfect_uniform``: every block-row gets exactly nnz_blocks/block_rows
    blocks (the reference's PERFECT_UNIFORM, ``matrix_utils.cu:307-342``);
    nnz is rounded up to a block-row multiple."""
    if rows % block_size or cols % block_size:
        raise ValueError("shape must be divisible by block_size")
    bs = block_size
    nnz_blocks = max(-(-nnz // (bs * bs)), 0)
    nnz_blocks = min(nnz_blocks, (rows // bs) * (cols // bs))
    if perfect_uniform:
        br = rows // bs
        nnz_blocks = min(-(-nnz_blocks // br) * br, br * (cols // bs))
        offsets, indices, pad = _random_topology(
            rng, br, cols // bs, nnz_blocks, perfect_uniform=True,
            unordered=unordered,
        )
    else:
        offsets, indices, pad = random_bsr_topology(
            rng, rows, cols, nnz_blocks, bs, pad_rows_to=pad_rows_to,
            unordered=unordered,
        )
    data = rng.standard_normal((len(indices), bs, bs)).astype(np.float32)
    data[pad] = 0.0
    return BlockSparseMatrix.create(
        jnp.asarray(data, dtype=dtype),
        jnp.asarray(offsets),
        jnp.asarray(indices),
        (rows, cols),
    )


def bsr_from_blocks(
    rows: int,
    cols: int,
    block_rows,
    block_cols,
    blocks: np.ndarray,
    *,
    dtype=jnp.float32,
) -> BlockSparseMatrix:
    """Hand-built BSR from explicit (block_row, block_col, block) triples.

    ``block_rows`` must be non-decreasing (CSR block order). For tests that
    need precise topologies (empty rows, specific intersections)."""
    bs = blocks.shape[-1]
    br = rows // bs
    block_rows = np.asarray(block_rows, np.int32)
    block_cols = np.asarray(block_cols, np.int32)
    counts = np.bincount(block_rows, minlength=br)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    return BlockSparseMatrix.create(
        jnp.asarray(blocks, dtype=dtype),
        jnp.asarray(offsets),
        jnp.asarray(block_cols),
        (rows, cols),
    )


def dense_oracle_matmul(
    a: np.ndarray,
    b: np.ndarray,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
) -> np.ndarray:
    """fp64-accumulated dense matmul — the golden model
    (reference ``matrix_utils.h:376-391``)."""
    a64 = np.asarray(a, np.float64)
    b64 = np.asarray(b, np.float64)
    if transpose_a:
        a64 = a64.T
    if transpose_b:
        b64 = b64.T
    return a64 @ b64
