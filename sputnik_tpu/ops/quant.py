"""Symmetric int8 quantized BSR SpMM — the serving path.

Beyond the reference's surface: its kernels are half-in/fp32-accumulate
only (``block/cutlass/default_block_gemm.h:58-61``). Here int8 operands
run on the MXU's integer path (v5e int8 peak ~2x bf16) with EXACT int32
accumulation inside the stream kernel; the dequantization scale
``scale_a * scale_b`` folds into the accumulator flush, so the output
leaves the kernel already in the serving dtype — no extra HBM pass.

Quantization is symmetric per-tensor (the weight-serving convention):
``q = clip(round(x / scale), -127, 127)`` with ``scale = max|x| / 127``.
``quantize``/``quantize_bsr`` need concrete arrays (offline weight prep);
the matmuls themselves are fully jittable.

Future work: per-block-row scales (fold a bitcast f32 scale read from a
fourth scalar-prefetch array into the flush) — per-tensor is the v1
contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sputnik_tpu.formats import BlockSparseMatrix
from sputnik_tpu.kernels import bsr_dsd, bsr_qstream

__all__ = ["quantize", "quantize_bsr", "matmul_dsd_q8", "matmul_dds_q8"]

_DSD_KERNELS = {"stream": bsr_dsd.dsd, "bres": bsr_qstream.dsd_bres}
_DDS_KERNELS = {"stream": bsr_dsd.dds, "bres": bsr_qstream.dds_bres}


def quantize(x: jax.Array) -> tuple[jax.Array, float]:
    """Symmetric per-tensor int8: returns ``(q, scale)`` with
    ``x ~= q * scale``. Host-syncs the absmax — offline/weight-prep use."""
    amax = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
    scale = (amax / 127.0) if amax > 0 else 1.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_bsr(
    m: BlockSparseMatrix, *, per: str = "tensor"
) -> tuple[BlockSparseMatrix, "float | jax.Array"]:
    """Quantize a BSR matrix's block values (metadata unchanged).

    ``per="tensor"``: one scale (kernel-fused dequant).
    ``per="block_row"``: a (block_rows,) f32 scale vector — tighter for
    weights with heterogeneous row magnitudes; dequant runs as one fused
    XLA epilogue pass over the output instead of inside the flush."""
    if per == "tensor":
        q, scale = quantize(m.data)
        return m.with_data(q), scale
    if per != "block_row":
        raise ValueError(f"per must be 'tensor' or 'block_row', got {per!r}")
    import numpy as np

    data = jnp.abs(m.data.astype(jnp.float32)).max(axis=(1, 2))  # (nnz_b,)
    rows = m.row_indices
    amax = jnp.zeros((m.block_rows,), jnp.float32).at[rows].max(data)
    scales = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(
        jnp.round(m.data.astype(jnp.float32) / scales[rows][:, None, None]),
        -127, 127,
    ).astype(jnp.int8)
    return m.with_data(q), scales


def matmul_dsd_q8(
    a_q: BlockSparseMatrix,  # int8 blocks
    b_q: jax.Array,  # int8 dense
    *,
    scale_a: float,
    scale_b: float,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=jnp.bfloat16,
    kernel: str = "stream",
    **kw,
) -> jax.Array:
    """C ~= op(A) @ op(B) from int8 operands: exact int32 accumulation,
    one fused dequant-scale at the kernel flush. ``kernel`` picks the
    schedule ("stream" or the dense-resident "bres")."""
    if a_q.dtype != jnp.int8 or b_q.dtype != jnp.int8:
        raise ValueError(
            f"matmul_dsd_q8 takes int8 operands, got {a_q.dtype}/{b_q.dtype}"
        )
    if isinstance(scale_a, (float, int)):  # per-tensor: dequant in the flush
        return _DSD_KERNELS[kernel](
            a_q, b_q, transpose_a=transpose_a, transpose_b=transpose_b,
            out_dtype=out_dtype, out_scale=float(scale_a) * float(scale_b),
            **kw,
        )
    # Per-block-row scale vector: raw exact int32 out of the kernel, one
    # fused XLA epilogue (scale + cast) — costs a pass over the output.
    if transpose_a:
        raise ValueError("per-block-row scales need transpose_a=False "
                         "(the scale follows the OUTPUT row)")
    raw = _DSD_KERNELS[kernel](
        a_q, b_q, transpose_a=transpose_a, transpose_b=transpose_b,
        out_dtype=jnp.int32, **kw,
    )
    row_scale = jnp.repeat(
        jnp.asarray(scale_a, jnp.float32) * float(scale_b), a_q.block_size
    )
    return (raw.astype(jnp.float32) * row_scale[:, None]).astype(out_dtype)


def matmul_dds_q8(
    a_q: jax.Array,
    b_q: BlockSparseMatrix,
    *,
    scale_a: float,
    scale_b: float,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=jnp.bfloat16,
    kernel: str = "stream",
    **kw,
) -> jax.Array:
    if a_q.dtype != jnp.int8 or b_q.dtype != jnp.int8:
        raise ValueError(
            f"matmul_dds_q8 takes int8 operands, got {a_q.dtype}/{b_q.dtype}"
        )
    return _DDS_KERNELS[kernel](
        a_q, b_q, transpose_a=transpose_a, transpose_b=transpose_b,
        out_dtype=out_dtype, out_scale=float(scale_a) * float(scale_b), **kw,
    )
