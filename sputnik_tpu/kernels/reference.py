"""Pure-jnp reference implementations of the six BSR matmuls.

These are the *fallback* kernel variants in the registry (correct for every
block size and shape XLA can compile, used when the Pallas predicates don't
match) and a second, independent oracle for the Pallas kernels in tests.
They densify the sparse operands — semantically exact under the padding
convention (zero blocks add zero) but without the sparse compute savings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sputnik_tpu.formats import BlockSparseMatrix, bsr_to_dense

__all__ = ["dsd", "dds", "sdd", "ssd", "sds", "dss", "sss", "extract_blocks"]


def _op(x: jax.Array, t: bool) -> jax.Array:
    return x.T if t else x


def _mm(a, b, out_dtype):
    return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(out_dtype)


def extract_blocks(dense: jax.Array, topology: BlockSparseMatrix) -> jax.Array:
    """Gather ``topology``'s blocks out of a dense matrix -> (nnz, bs, bs)."""
    bs = topology.block_size
    br, bc = topology.block_rows, topology.block_cols
    blocks = dense.reshape(br, bs, bc, bs).transpose(0, 2, 1, 3)
    return blocks[topology.row_indices, topology.indices]


def dsd(a: BlockSparseMatrix, b, *, transpose_a=False, transpose_b=False, out_dtype=None, **_):
    out_dtype = out_dtype or a.dtype
    return _mm(_op(bsr_to_dense(a), transpose_a), _op(b, transpose_b), out_dtype)


def dds(a, b: BlockSparseMatrix, *, transpose_a=False, transpose_b=False, out_dtype=None, **_):
    out_dtype = out_dtype or b.dtype
    return _mm(_op(a, transpose_a), _op(bsr_to_dense(b), transpose_b), out_dtype)


def sdd(a, b, topology: BlockSparseMatrix, *, transpose_a=False, transpose_b=False, out_dtype=None, **_):
    out_dtype = out_dtype or topology.dtype
    full = _mm(_op(a, transpose_a), _op(b, transpose_b), out_dtype)
    return topology.with_data(extract_blocks(full, topology))


def ssd(a: BlockSparseMatrix, b, topology: BlockSparseMatrix, *, transpose_a=False, transpose_b=False, out_dtype=None, **_):
    out_dtype = out_dtype or topology.dtype
    full = _mm(_op(bsr_to_dense(a), transpose_a), _op(b, transpose_b), out_dtype)
    return topology.with_data(extract_blocks(full, topology))


def sds(a, b: BlockSparseMatrix, topology: BlockSparseMatrix, *, transpose_a=False, transpose_b=False, out_dtype=None, **_):
    out_dtype = out_dtype or topology.dtype
    full = _mm(_op(a, transpose_a), _op(bsr_to_dense(b), transpose_b), out_dtype)
    return topology.with_data(extract_blocks(full, topology))


def dss(a: BlockSparseMatrix, b: BlockSparseMatrix, *, transpose_a=False, transpose_b=False, out_dtype=None, **_):
    out_dtype = out_dtype or a.dtype
    return _mm(
        _op(bsr_to_dense(a), transpose_a),
        _op(bsr_to_dense(b), transpose_b),
        out_dtype,
    )


def sss(a: BlockSparseMatrix, b: BlockSparseMatrix, topology: BlockSparseMatrix,
        *, transpose_a=False, transpose_b=False, out_dtype=None, **_):
    out_dtype = out_dtype or topology.dtype
    full = dss(a, b, transpose_a=transpose_a, transpose_b=transpose_b,
               out_dtype=out_dtype)
    return topology.with_data(extract_blocks(full, topology))
