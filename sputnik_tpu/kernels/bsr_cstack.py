"""Column-stacked C-resident BSR SpMM: q same-k blocks per MXU pass.

Round-4 probe finding: every row-major DSD schedule (stream / qstream /
bres / cres) issues dots with m = 128 — one block's rows — and converges
to ~0.72 of peak, while XLA's dense dot at the same shape reaches ~0.90.
On the MXU the contraction tile is stationary and the M dimension STREAMS
through the array, so m=128 pays the fill/drain bubble on every dot; the
m-tile probe (``bench.mxu_probe``, resident_d*_mt*) measures the gap
directly.

This kernel makes m large without gathers: iterate blocks DEP-major
(grouped by contraction block k — all of column k's blocks multiply the
SAME dense strip B[k]), stack q of them into one (q*bs, bs) lhs (a cheap
q * bs^2 VMEM concat — the round-4 shootout showed stacking the 8 MB
PANELS loses, but blocks are 32 KB), and issue ONE dot of shape
(q*bs, bs) @ (bs, n_tile) per grid step: the MXU streams q*128 rows per
stationary fill. The q row-slices of the product then accumulate into a
VMEM-resident (m_blocks, bs, n_tile) fp32 accumulator at their own
block-rows (major-dim indexed, like ``bsr_cres``), flushed once per
block-row at the end of each panel pass.

Traffic: every operand moves once (the cres floor); the new cost is the
q per-step accumulator RMWs, which overlap the next step's MXU work.

Reference analogue: none — CUTLASS threadblocks cannot re-tile M across
unrelated output rows; VMEM-scale output residency is what makes the
schedule expressible on TPU. (``block_gemm.h:129-192`` is the row-major
ancestor.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sputnik_tpu.formats import BlockSparseMatrix
from sputnik_tpu.kernels.bsr_cres import ACC_BUDGET, _dep_major_arrays
from sputnik_tpu.kernels.bsr_qstream import _plan
from sputnik_tpu.kernels.common import cdiv, compiler_params, use_interpret

__all__ = ["dsd_cstack", "cstack_fits"]


def cstack_fits(m_dim: int, n_tile: int) -> bool:
    return m_dim * n_tile * 4 <= ACC_BUDGET


def _cstack_kernel(
    k_q,  # scalar prefetch: (n_steps * q,) contraction block per slot
    row_q,  # (n_steps * q,) output block-row per slot
    data_q,  # (n_steps * q,) physical block position (index maps only)
    nv,  # (n_steps,) live slots per step
    frows,  # (n_steps + m_blocks,) flush row per step (0 during MACs)
    *refs,  # q block refs, panel_ref, out_ref, acc_ref
    n_steps: int,
    q: int,
    bs: int,
    rhs_contract: int,  # 0: panel (bs, nt); 1: panel (nt, bs) (transpose_b)
):
    panel_ref = refs[q]
    out_ref, acc_ref = refs[q + 1], refs[q + 2]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j < n_steps)
    def _():
        base = j * q
        n_valid = nv[jnp.minimum(j, n_steps - 1)]
        blocks = []
        for qi in range(q):
            block = refs[qi][0]
            live = (qi < n_valid).astype(block.dtype)
            blocks.append(block * live)
        lhs = jnp.concatenate(blocks, axis=0)  # (q*bs, bs)
        prod = jax.lax.dot_general(
            lhs, panel_ref[:],
            (((1,), (rhs_contract,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (q*bs, nt)
        for qi in range(q):
            g = row_q[base + qi]
            acc_ref[g] += prod[qi * bs:(qi + 1) * bs]

    @pl.when(j >= n_steps)
    def _():
        out_ref[:] = acc_ref[frows[j]].astype(out_ref.dtype)


def dsd_cstack(
    a: BlockSparseMatrix,
    b: jax.Array,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    q: int = 8,
    n_tile: int = 8192,
    interpret: bool | None = None,
    **_,
) -> jax.Array:
    """C[M, N] = A_sparse @ op(B_dense), q column-stacked blocks per dot.

    ``transpose_a`` is not supported (the stacked lhs would need per-block
    in-kernel transposes); the registry's ``can_implement`` gates it out.
    Reference: ``block/dsd/dsd.h:10-22`` semantics, new TPU schedule.
    """
    if transpose_a:
        raise ValueError("dsd_cstack supports transpose_a=False only")
    interpret = use_interpret() if interpret is None else interpret
    out_dtype = out_dtype or a.dtype
    bs = a.block_size
    m_dim, k_dim = a.rows, a.cols
    n_dim = b.shape[0] if transpose_b else b.shape[1]
    bk = b.shape[1] if transpose_b else b.shape[0]
    if bk != k_dim:
        raise ValueError(f"contraction mismatch: A gives k={k_dim}, B gives {bk}")
    if a.nnz_blocks == 0:
        return jnp.zeros((m_dim, n_dim), out_dtype)

    # Blocks grouped by contraction block k (transpose metadata for the
    # non-transposed A), rows carried per slot.
    ks, rows, datas = _dep_major_arrays(a, op_transposed=False)
    at = a.with_transpose_metadata()
    counts = at.offsets_t[1:] - at.offsets_t[:-1]
    import numpy as np

    concrete = not any(
        isinstance(x, jax.core.Tracer) for x in (ks, rows, datas, counts)
    )
    k_q, row_q, data_q, nv, n_steps = _plan(
        np.asarray(ks) if concrete else ks,
        np.asarray(rows) if concrete else rows,
        np.asarray(datas) if concrete else datas,
        np.asarray(counts) if concrete else counts,
        q,
        concrete=concrete,
    )
    m_blocks = m_dim // bs
    if not cstack_fits(m_dim, 128):
        # Mirror the registry's dispatch gate so a direct variant= call
        # fails with a labeled error instead of a Mosaic VMEM crash.
        raise ValueError(
            f"dsd_cstack: whole-output fp32 accumulator for m={m_dim} "
            f"exceeds the VMEM budget even at the minimum 128-lane tile "
            f"({m_dim * 128 * 4} > {ACC_BUDGET} bytes)"
        )
    nt = min(n_tile, n_dim)
    while nt > 128 and not cstack_fits(m_dim, nt):
        # Keep the tile a multiple of 128 lanes (Mosaic tiling requirement).
        nt = max(128, (nt // 2) // 128 * 128)
    n_tiles = cdiv(n_dim, nt)
    total_steps = n_steps + m_blocks
    frows = jnp.concatenate([
        jnp.zeros((n_steps,), jnp.int32),
        jnp.arange(m_blocks, dtype=jnp.int32),
    ])

    def block_spec(qi):
        return pl.BlockSpec(
            (1, bs, bs),
            lambda p, j, kq, rq, dq, nv_, fr, qi=qi: (
                dq[jnp.minimum(j * q + qi, n_steps * q - 1)], 0, 0
            ),
        )

    if transpose_b:  # B stored (N, K): strip (nt, bs) at column k
        panel_spec = pl.BlockSpec(
            (nt, bs),
            lambda p, j, kq, rq, dq, nv_, fr: (
                p, kq[jnp.minimum(j * q, n_steps * q - 1)]
            ),
        )
        rhs_contract = 1
    else:  # B stored (K, N): strip (bs, nt) at row k
        panel_spec = pl.BlockSpec(
            (bs, nt),
            lambda p, j, kq, rq, dq, nv_, fr: (
                kq[jnp.minimum(j * q, n_steps * q - 1)], p
            ),
        )
        rhs_contract = 0
    out_spec = pl.BlockSpec(
        (bs, nt), lambda p, j, kq, rq, dq, nv_, fr: (fr[j], p)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_tiles, total_steps),
        in_specs=[block_spec(i) for i in range(q)] + [panel_spec],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((m_blocks, bs, nt), jnp.float32)],
    )
    acc_bytes = m_dim * nt * 4
    return pl.pallas_call(
        functools.partial(
            _cstack_kernel, n_steps=n_steps, q=q, bs=bs,
            rhs_contract=rhs_contract,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_dim, n_dim), out_dtype),
        compiler_params=compiler_params(
            ("parallel", "arbitrary"),
            vmem_limit_bytes=min(120 << 20, acc_bytes + (24 << 20)),
        ),
        interpret=interpret,
    )(k_q, row_q, data_q, nv, frows, *([a.data] * q), b)
