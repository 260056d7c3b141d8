"""CSR engine: SpMM, SDDMM, sparse softmax, transpose / row-swizzle.

TPU-native rebuild of upstream Sputnik's element-granular CSR capabilities
(the surviving support headers in the reference — ``memory_aligner.h``,
``barrier.h``, ``tiling_utils.h``, ``vector_utils.h`` — are the skeleton of
that engine; the north star requires the behaviors, not the CUDA API).

Design: unstructured sparsity cannot feed the MXU, so the hot loop is
gather + segment-reduce bandwidth on the VPU/HBM. Two paths per op:

  * a jnp path (XLA gather/scatter — ``segment_sum`` over per-nonzero
    products). XLA lowers the gathers to dynamic-slice loops on TPU; for
    moderate nnz this is the robust default, and it is exactly
    speed-of-light-bound on reading B rows (n * 4 bytes per nonzero).
  * a Pallas "padded-rows" (ELL-style) path for softmax-like row ops where
    rows are binned to a static width — the TPU answer to Sputnik's
    row-swizzle load balancing (``matrix_utils.cu:348-363``): instead of
    binning warps onto variable rows, bin the rows into MXU/VPU-aligned
    rectangles.

All functions are jit-safe (static shapes come from the descriptor).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sputnik_tpu.formats import CsrMatrix, sorted_row_swizzle

__all__ = ["spmm", "sddmm", "sparse_softmax", "row_swizzle", "ell_from_csr"]


def spmm(
    a: CsrMatrix,
    b: jax.Array,
    *,
    transpose_b: bool = False,
    out_dtype=None,
) -> jax.Array:
    """C[M, N] = A_csr @ op(B_dense)   (upstream Sputnik ``CudaSpmm``).

    Per-nonzero: gather B row ``indices[e]``, scale by ``values[e]``,
    segment-sum into C row ``row_indices[e]`` with fp32 accumulation.
    Zero-valued padding entries are inert by construction.
    """
    out_dtype = out_dtype or a.dtype
    if transpose_b:
        b = b.T
    n = b.shape[1]
    if a.nnz == 0:
        return jnp.zeros((a.rows, n), out_dtype)
    gathered = jnp.take(b, a.indices, axis=0).astype(jnp.float32)
    prods = gathered * a.values.astype(jnp.float32)[:, None]
    out = jax.ops.segment_sum(
        prods, a.row_indices, num_segments=a.rows, indices_are_sorted=True
    )
    return out.astype(out_dtype)


def sddmm(
    a: jax.Array,
    b: jax.Array,
    topology: CsrMatrix,
    *,
    transpose_b: bool = True,
    out_dtype=None,
) -> CsrMatrix:
    """values[e] = A[row[e], :] . op(B)[:, col[e]]   (upstream ``CudaSddmm``).

    The attention-score shape: with ``transpose_b=True`` (the Sputnik
    default) this is rows of A dotted with rows of B.
    """
    out_dtype = out_dtype or topology.dtype
    if not transpose_b:
        b = b.T  # normalize to (N, K) rows
    if topology.nnz == 0:
        return topology.with_values(jnp.zeros((0,), out_dtype))
    lhs = jnp.take(a, topology.row_indices, axis=0).astype(jnp.float32)
    rhs = jnp.take(b, topology.indices, axis=0).astype(jnp.float32)
    vals = jnp.sum(lhs * rhs, axis=-1)
    return topology.with_values(vals.astype(out_dtype))


def sparse_softmax(a: CsrMatrix, *, scale: float | None = None) -> CsrMatrix:
    """Row-wise softmax over the nonzero values (upstream ``SparseSoftmax``).

    Numerically stable: per-row max subtraction via segment_max. Rows with
    no nonzeros produce no values (vacuously fine). Padding entries
    participate like the reference's (they hold real positions with value 0
    — callers who pad topologies should mask afterwards; the reference has
    the same caveat).
    """
    if a.nnz == 0:
        return a
    v = a.values.astype(jnp.float32)
    if scale is not None:
        v = v * scale
    row_max = jax.ops.segment_max(
        v, a.row_indices, num_segments=a.rows, indices_are_sorted=True
    )
    v = jnp.exp(v - jnp.take(row_max, a.row_indices))
    row_sum = jax.ops.segment_sum(
        v, a.row_indices, num_segments=a.rows, indices_are_sorted=True
    )
    v = v / jnp.take(row_sum, a.row_indices)
    return a.with_values(v.astype(a.dtype))


def row_swizzle(a: CsrMatrix) -> jax.Array:
    """Row ordering by descending nnz (Sputnik ``SortedRowSwizzle``)."""
    return sorted_row_swizzle(a.offsets)


def ell_from_csr(a: CsrMatrix, width: int):
    """Pad every row to a static ``width`` -> (values, cols, valid) arrays of
    shape (rows, width). The ELL layout that feeds Pallas row-parallel
    kernels; entries beyond a row's nnz point at column 0 with value 0."""
    rows = a.rows
    r = jnp.arange(rows, dtype=jnp.int32)[:, None]
    w = jnp.arange(width, dtype=jnp.int32)[None, :]
    slots = a.offsets[:-1][:, None] + w
    valid = slots < a.offsets[1:][:, None]
    slots = jnp.minimum(slots, max(a.nnz - 1, 0))
    del r
    vals = jnp.where(valid, jnp.take(a.values, slots), 0)
    cols = jnp.where(valid, jnp.take(a.indices, slots), 0)
    return vals, cols, valid
