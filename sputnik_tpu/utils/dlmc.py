"""DLMC (Deep Learning Matrix Collection) utilities.

The reference's evaluation story (and upstream Sputnik's paper) is built on
DLMC transformer weight matrices at 70-98% sparsity; BASELINE.md's configs
name the same sweep. This module loads .smtx topology files (via the native
parser when built) into CsrMatrix / BlockSparseMatrix, and synthesizes
DLMC-like matrices when the dataset isn't on disk (zero-egress images).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sputnik_tpu import native
from sputnik_tpu.formats import BlockSparseMatrix, CsrMatrix

__all__ = ["load_smtx", "load_smtx_bsr", "synthetic_dlmc"]


def load_smtx(path: str, *, dtype=jnp.float32, values: str = "random", seed: int = 0) -> CsrMatrix:
    """Load a DLMC .smtx topology as a CsrMatrix.

    .smtx files carry topology only; ``values`` is "random" (unit normal,
    the benchmark convention) or "ones".
    """
    shape, offsets, indices = native.read_smtx(path)
    nnz = len(indices)
    if values == "ones":
        vals = np.ones(nnz, np.float32)
    else:
        vals = np.random.default_rng(seed).standard_normal(nnz).astype(np.float32)
    return CsrMatrix.create(
        jnp.asarray(vals, dtype=dtype),
        jnp.asarray(indices),
        jnp.asarray(offsets),
        shape,
    )


def load_smtx_bsr(
    path: str, block_size: int = 128, *, dtype=jnp.float32, seed: int = 0,
    pad_shape: bool = True,
) -> BlockSparseMatrix:
    """Load a .smtx topology and block it into BSR (blocks densify locally;
    elements absent in the CSR stay zero inside touched blocks)."""
    shape, offsets, indices = native.read_smtx(path)
    rows, cols = shape
    if pad_shape and (rows % block_size or cols % block_size):
        prows = -(-rows // block_size) * block_size
        pcols = -(-cols // block_size) * block_size
        offsets = np.concatenate(
            [offsets, np.full(prows - rows, offsets[-1], np.int32)]
        )
        rows, cols = prows, pcols
    nnz = len(indices)
    vals = np.random.default_rng(seed).standard_normal(nnz).astype(np.float32)
    bo, bi, data = native.csr_to_bsr(offsets, indices, vals, (rows, cols), block_size)
    return BlockSparseMatrix.create(
        jnp.asarray(data, dtype=dtype), jnp.asarray(bo), jnp.asarray(bi), (rows, cols)
    )


def synthetic_dlmc(
    rng: np.random.Generator,
    rows: int = 2048,
    cols: int = 512,
    sparsity: float = 0.9,
    *,
    dtype=jnp.float32,
) -> CsrMatrix:
    """DLMC-shaped synthetic matrix: transformer weight aspect ratios with
    mildly non-uniform row lengths (magnitude-pruning-like skew)."""
    nnz_total = int(rows * cols * (1 - sparsity))
    # Row lengths: lognormal skew normalized to nnz_total.
    w = rng.lognormal(0.0, 0.5, rows)
    lens = np.maximum((w / w.sum() * nnz_total).astype(np.int64), 0)
    lens = np.minimum(lens, cols)
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    indices = np.concatenate(
        [np.sort(rng.choice(cols, size=int(l), replace=False)) for l in lens]
    ).astype(np.int32) if lens.sum() else np.zeros(0, np.int32)
    vals = rng.standard_normal(len(indices)).astype(np.float32)
    return CsrMatrix.create(
        jnp.asarray(vals, dtype=dtype),
        jnp.asarray(indices),
        jnp.asarray(offsets),
        (rows, cols),
    )
