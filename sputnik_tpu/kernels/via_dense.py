"""Dense-detour kernel variants for SSD / SDS / DSS.

The direct output-stationary kernels for these ops run (128,128) tiles per
step and sit at ~0.2 of speed-of-light; the DSD/DDS stream kernels run at
~1.0. Above a density threshold it is faster to run the at-SoL kernel on
the full dense output (SSD/SDS) or a densified operand (DSS) and pay the
extract/densify bandwidth: a deliberate flops-for-bandwidth trade the
roofline favors on TPU. The registry picks these first when the static
descriptor density clears the threshold; the direct kernels keep the
extreme-sparsity regime.
"""

from __future__ import annotations

import jax.numpy as jnp

from sputnik_tpu.formats import BlockSparseMatrix, bsr_to_dense
from sputnik_tpu.kernels import bsr_dsd, bsr_small
from sputnik_tpu.kernels.reference import extract_blocks

__all__ = [
    "ssd", "sds", "dss", "DENSITY_THRESHOLD",
    "ssd_smallblock", "sds_smallblock", "dss_smallblock",
]

# Below this block density the direct variable-step kernels win.
DENSITY_THRESHOLD = 1 / 16

# At and above this block density the sparse operand is effectively dense:
# the stream kernels save <= 20% of the MXU work but run at ~0.6-0.7 of the
# XLA dense matmul's efficiency (measured d=2048 @100%: stream 133 us vs a
# ~103 us dense dot), so densify + one XLA dot wins. first-fit gate for
# DSD / DDS / SDD; autotune can still override per problem.
DENSIFY_THRESHOLD = 0.8


def ssd(a, b, topology, *, transpose_a=False, transpose_b=False, out_dtype=None, schedule=None, **kw):
    out_dtype = out_dtype or topology.dtype
    full = bsr_dsd.dsd(
        a, b, transpose_a=transpose_a, transpose_b=transpose_b,
        out_dtype=out_dtype, **kw,
    )
    return topology.with_data(extract_blocks(full, topology))


def sds(a, b, topology, *, transpose_a=False, transpose_b=False, out_dtype=None, schedule=None, **kw):
    out_dtype = out_dtype or topology.dtype
    full = bsr_dsd.dds(
        a, b, transpose_a=transpose_a, transpose_b=transpose_b,
        out_dtype=out_dtype, **kw,
    )
    return topology.with_data(extract_blocks(full, topology))


def dss(a: BlockSparseMatrix, b: BlockSparseMatrix, *, transpose_a=False,
        transpose_b=False, out_dtype=None, schedule=None, **kw):
    out_dtype = out_dtype or a.dtype
    # Densify the side with fewer bytes; keep the other sparse in the
    # at-SoL stream kernel.
    if a.nnz <= b.nnz:
        return bsr_dsd.dds(
            bsr_to_dense(a),
            b,
            transpose_a=transpose_a,
            transpose_b=transpose_b,
            out_dtype=out_dtype,
            **kw,
        )
    return bsr_dsd.dsd(
        a,
        bsr_to_dense(b),
        transpose_a=transpose_a,
        transpose_b=transpose_b,
        out_dtype=out_dtype,
        **kw,
    )


# ---------------------------------------------------------------------------
# Small-block (16/32/64) sparse-saving variants for the sparse-output and
# sparse-sparse ops. The reference reserved BlockSize {16,32,64} for ALL six
# ops but wired none (``arguments.h:13-19``); the packed small-block DSD/DDS
# kernels (``bsr_small.py``) provide exact sparse-INPUT compute savings, and
# the sparse output is gathered out in one fused XLA pass (``extract_blocks``)
# — the same detour discipline as the 128-block ``ssd``/``sds`` above, but
# with the sparse operand's absent blocks actually skipped on the MXU.
# ---------------------------------------------------------------------------


def ssd_smallblock(a, b, topology, *, transpose_a=False, transpose_b=False,
                   out_dtype=None, **kw):
    """C_smallblock = op(A_smallblock) @ op(B): packed sparse-saving DSD
    computes the dense product, topology's blocks are extracted."""
    out_dtype = out_dtype or topology.dtype
    full = bsr_small.dsd_smallblock(
        a, b, transpose_a=transpose_a, transpose_b=transpose_b,
        out_dtype=out_dtype, **kw,
    )
    return topology.with_data(extract_blocks(full, topology))


def sds_smallblock(a, b, topology, *, transpose_a=False, transpose_b=False,
                   out_dtype=None, **kw):
    """C_smallblock = op(A) @ op(B_smallblock) via the packed DDS mirror."""
    out_dtype = out_dtype or topology.dtype
    full = bsr_small.dds_smallblock(
        a, b, transpose_a=transpose_a, transpose_b=transpose_b,
        out_dtype=out_dtype, **kw,
    )
    return topology.with_data(extract_blocks(full, topology))


def dss_smallblock(a: BlockSparseMatrix, b: BlockSparseMatrix, *,
                   transpose_a=False, transpose_b=False, out_dtype=None, **kw):
    """C = op(A_smallblock) @ op(B_smallblock): densify the side with fewer
    bytes, keep the other sparse in the packed small-block kernel (the same
    static nnz-based side choice as :func:`dss`)."""
    out_dtype = out_dtype or a.dtype
    if a.nnz <= b.nnz:
        return bsr_small.dds_smallblock(
            bsr_to_dense(a), b, transpose_a=transpose_a,
            transpose_b=transpose_b, out_dtype=out_dtype, **kw,
        )
    return bsr_small.dsd_smallblock(
        a, bsr_to_dense(b), transpose_a=transpose_a,
        transpose_b=transpose_b, out_dtype=out_dtype, **kw,
    )
