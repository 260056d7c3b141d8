"""Sliced-ELL (SELL) Pallas kernels: CSR-class SpMM and SDDMM on the MXU.

TPU-native replacement for upstream Sputnik's element-granular CSR engine
(the reference's surviving support headers — ``memory_aligner.h``,
``vector_utils.h``, ``barrier.h``, ``tiling_utils.h`` — encode its GPU
answer: row-swizzled warps, aligned vector loads, subwarp tilings). None of
that transfers: a TPU has no per-thread gathers worth chasing; element
gathers cost ~10ns each while the VPU moves 8x128 lanes per cycle.

The TPU answer implemented here:

  * ``spmm``  — for each (row-tile, k-chunk): reconstruct the dense
    (chunk x row-tile) panel S^T from the SELL slots with one
    broadcast-compare-select per slot (all dense VPU work, no gathers),
    then one MXU ``dot_general`` against the B chunk. The slot axis lives
    in sublanes and rows in lanes, so every per-slot op is a cheap
    sublane-broadcast. Measured ~13x over an XLA gather formulation at
    DLMC sparsities (d=2048, 10% nnz, f32).
  * ``sddmm`` — the mirror: scores for a (row-tile, column-chunk) pair come
    from one MXU matmul, then each output slot selects its score with the
    same compare-reduce. The output stays in SELL layout, so
    sddmm -> sparse softmax -> spmm chains never leave the format
    (the attention-score pipeline of upstream Sputnik).

Padding slots carry the sentinel column id ``chunk`` which matches no lane,
so no masks are materialized anywhere. Rows are padded to 128 lanes by the
format constructor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sputnik_tpu.formats import SellMatrix
from sputnik_tpu.kernels.common import cdiv, compiler_params, use_interpret

__all__ = ["spmm", "spmm_t", "sddmm"]

_TR = 128  # row-tile (lanes); SellMatrix pads rows to a multiple of this


def _spmm_kernel(vals_ref, cols_ref, b_ref, out_ref, acc_ref, st_ref, *, n_chunks, width, chunk):
    kc = pl.program_id(2)

    @pl.when(kc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (chunk, _TR), 0)

    def body(w, s):
        cols_row = cols_ref[0, w, :][None, :]  # (1, TR): sublane broadcast
        vals_row = vals_ref[0, w, :][None, :].astype(jnp.float32)
        return s + jnp.where(iota_c == cols_row, vals_row, 0.0)

    st_ref[:] = jax.lax.fori_loop(
        0, width, body, jnp.zeros((chunk, _TR), jnp.float32)
    )
    # S^T is (chunk, TR): contract its chunk axis with B's row axis.
    acc_ref[:] += jax.lax.dot_general(
        st_ref[:],
        b_ref[:].astype(jnp.float32),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kc == n_chunks - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def spmm(
    a: SellMatrix,
    b: jax.Array,
    *,
    out_dtype=None,
    n_tile: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """C[rows, N] = A_sell @ B[cols, N]   (upstream Sputnik ``CudaSpmm``)."""
    interpret = use_interpret() if interpret is None else interpret
    out_dtype = out_dtype or a.dtype
    if b.shape[0] != a.cols:
        raise ValueError(f"contraction mismatch: A cols={a.cols}, B rows={b.shape[0]}")
    n = b.shape[1]
    k_padded = a.n_chunks * a.chunk
    if b.shape[0] < k_padded:  # pad B to whole chunks (sentinel-safe)
        b = jnp.pad(b, ((0, k_padded - b.shape[0]), (0, 0)))
    bn = min(n, n_tile)
    if n % bn:
        bn = n  # odd widths: single tile (keeps the index math exact)
    grid = (a.rows_padded // _TR, cdiv(n, bn), a.n_chunks)
    out = pl.pallas_call(
        functools.partial(
            _spmm_kernel, n_chunks=a.n_chunks, width=a.width, chunk=a.chunk
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, a.width, _TR), lambda r, nt, kc: (kc, 0, r)),
            pl.BlockSpec((1, a.width, _TR), lambda r, nt, kc: (kc, 0, r)),
            pl.BlockSpec((a.chunk, bn), lambda r, nt, kc: (kc, nt)),
        ],
        out_specs=pl.BlockSpec((_TR, bn), lambda r, nt, kc: (r, nt)),
        scratch_shapes=[
            pltpu.VMEM((_TR, bn), jnp.float32),
            pltpu.VMEM((a.chunk, _TR), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((a.rows_padded, n), out_dtype),
        compiler_params=compiler_params(("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(a.values, a.indices, b)
    return out[: a.rows]


def _spmm_t_kernel(vals_ref, cols_ref, x_ref, out_ref, acc_ref, *, n_rowtiles, width, chunk):
    rt = pl.program_id(2)

    @pl.when(rt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (chunk, _TR), 0)

    def body(w, s):
        cols_row = cols_ref[0, w, :][None, :]
        vals_row = vals_ref[0, w, :][None, :].astype(jnp.float32)
        return s + jnp.where(iota_c == cols_row, vals_row, 0.0)

    s_t = jax.lax.fori_loop(0, width, body, jnp.zeros((chunk, _TR), jnp.float32))
    # S^T is (chunk, rows-tile): contract the row axis with X's rows.
    acc_ref[:] += jax.lax.dot_general(
        s_t,
        x_ref[:].astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(rt == n_rowtiles - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def spmm_t(
    a: SellMatrix,
    x: jax.Array,
    *,
    out_dtype=None,
    n_tile: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """C[cols, N] = A_sell^T @ X[rows, N] — the weight-gradient shape.

    Reuses the SELL panel reconstruction with the contraction flipped to the
    row axis (the reference covers this case with its TN instantiations +
    transpose metadata; SELL needs no extra metadata at all: the chunk axis
    IS the transposed matrix's row grouping).
    """
    interpret = use_interpret() if interpret is None else interpret
    out_dtype = out_dtype or a.dtype
    if x.shape[0] != a.rows:
        raise ValueError(f"contraction mismatch: A rows={a.rows}, X rows={x.shape[0]}")
    n = x.shape[1]
    if a.pad_rows:
        x = jnp.pad(x, ((0, a.pad_rows), (0, 0)))
    bn = min(n, n_tile)
    if n % bn:
        bn = n
    n_rowtiles = a.rows_padded // _TR
    grid = (a.n_chunks, cdiv(n, bn), n_rowtiles)
    out = pl.pallas_call(
        functools.partial(
            _spmm_t_kernel, n_rowtiles=n_rowtiles, width=a.width, chunk=a.chunk
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, a.width, _TR), lambda kc, nt, rt: (kc, 0, rt)),
            pl.BlockSpec((1, a.width, _TR), lambda kc, nt, rt: (kc, 0, rt)),
            pl.BlockSpec((_TR, bn), lambda kc, nt, rt: (rt, nt)),
        ],
        out_specs=pl.BlockSpec((a.chunk, bn), lambda kc, nt, rt: (kc, nt)),
        scratch_shapes=[pltpu.VMEM((a.chunk, bn), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((a.n_chunks * a.chunk, n), out_dtype),
        compiler_params=compiler_params(("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(a.values, a.indices, x)
    return out[: a.cols]


# Above this slot width the one-shot (width, chunk, TR) select tensor would
# strain VMEM (width * 64KB); fall back to the per-slot loop.
_SDDMM_ONESHOT_MAX_WIDTH = 48


def _sddmm_kernel(a_ref, b_ref, cols_ref, out_ref, *, width, chunk):
    # scores^T[c, r] = B_chunk[c, :] . A_tile[r, :]  — one MXU call.
    scores_t = jax.lax.dot_general(
        b_ref[:].astype(jnp.float32),
        a_ref[:].astype(jnp.float32),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (chunk, TR)

    if width <= _SDDMM_ONESHOT_MAX_WIDTH:
        # One fused select-reduce over all slots (~2x the looped variant).
        cols = cols_ref[0]  # (width, TR)
        iota = jax.lax.broadcasted_iota(jnp.int32, (width, chunk, _TR), 1)
        sel = jnp.where(cols[:, None, :] == iota, scores_t[None, :, :], 0.0)
        out_ref[0] = jnp.sum(sel, axis=1).astype(out_ref.dtype)
        return

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (chunk, _TR), 0)

    def body(w, _):
        cols_row = cols_ref[0, w, :][None, :]  # (1, TR)
        picked = jnp.sum(
            jnp.where(iota_c == cols_row, scores_t, 0.0), axis=0, keepdims=True
        )
        out_ref[0, w, :] = picked[0].astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, width, body, 0)


def sddmm(
    a: jax.Array,
    b: jax.Array,
    topology: SellMatrix,
    *,
    out_dtype=None,
    interpret: bool | None = None,
) -> SellMatrix:
    """values[r, slot] = A[r, :] . B[col(slot), :]  (``CudaSddmm`` shape).

    ``a`` is (rows, k); ``b`` is (cols, k) — rows of B dotted against rows
    of A (the attention convention, Sputnik's ``transpose_b=True`` default).
    Output keeps ``topology``'s SELL layout (padding slots get 0).
    """
    interpret = use_interpret() if interpret is None else interpret
    out_dtype = out_dtype or topology.dtype
    rows, k = a.shape
    if rows != topology.rows:
        raise ValueError(f"A rows={rows} != topology rows={topology.rows}")
    if b.shape != (topology.cols, k):
        raise ValueError(
            f"B must be (cols, k)=({topology.cols}, {k}), got {b.shape}"
        )
    if topology.pad_rows:
        a = jnp.pad(a, ((0, topology.pad_rows), (0, 0)))
    k_padded = topology.n_chunks * topology.chunk
    if b.shape[0] < k_padded:
        b = jnp.pad(b, ((0, k_padded - b.shape[0]), (0, 0)))
    grid = (topology.rows_padded // _TR, topology.n_chunks)
    values = pl.pallas_call(
        functools.partial(_sddmm_kernel, width=topology.width, chunk=topology.chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TR, k), lambda r, c: (r, 0)),
            pl.BlockSpec((topology.chunk, k), lambda r, c: (c, 0)),
            pl.BlockSpec((1, topology.width, _TR), lambda r, c: (c, 0, r)),
        ],
        out_specs=pl.BlockSpec((1, topology.width, _TR), lambda r, c: (c, 0, r)),
        out_shape=jax.ShapeDtypeStruct(
            (topology.n_chunks, topology.width, topology.rows_padded), out_dtype
        ),
        compiler_params=compiler_params(("parallel", "parallel")),
        interpret=interpret,
    )(a, b, topology.indices)
    return topology.with_values(values)
