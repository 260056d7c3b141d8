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

__all__ = ["spmm", "spmm_t", "sddmm", "sparse_softmax"]

_TR = 128  # row-tile (lanes); SellMatrix pads rows to a multiple of this


def _tile_widths(a: SellMatrix, tr: int = _TR) -> jax.Array:
    """Per-(chunk, row-tile) slot bounds; full width when not recorded.

    ``tr`` > 128 coarsens the recorded 128-row bounds to the wider tile
    (max over the covered 128-row tiles)."""
    if a.tile_widths is None:
        return jnp.full((a.n_chunks, a.rows_padded // tr), a.width, jnp.int32)
    tw = a.tile_widths.astype(jnp.int32)
    if tr != _TR:
        tw = tw.reshape(a.n_chunks, a.rows_padded // tr, tr // _TR).max(-1)
    return tw


def _permute_rows_in(x: jax.Array, a: SellMatrix) -> jax.Array:
    """Logical row order -> storage order (sorted matrices), padding rows."""
    if x.shape[0] < a.rows_padded:
        x = jnp.pad(x, ((0, a.rows_padded - x.shape[0]), (0, 0)))
    if a.row_perm is None:
        return x
    return jnp.take(x, a.row_perm, axis=0)


def _unpermute_rows(out: jax.Array, a: SellMatrix) -> jax.Array:
    """Storage row order -> logical (inverse of the construction sort)."""
    if a.row_perm is None:
        return out
    return jnp.take(out, jnp.argsort(a.row_perm), axis=0)


# Below this width a static python unroll beats any loop or branch:
# Mosaic's control-flow management (~150 ns per dynamic iteration on v5e)
# costs more than the skipped slot work. Measured crossover (DLMC shapes):
# static wins to w=20, grouped-8 wins from w=65 (1024^2@90%: 50.4 -> 35.9).
_UNROLL_MAX_WIDTH = 24
# Slots per control-flow group: the slot loop runs in units of G selects,
# skipping whole groups past the per-tile bound (which a full static
# unroll pays for: each select costs a whole (chunk x TR) VPU op
# regardless of nnz). G=8 beat G=4 everywhere measured.
_SLOT_GROUP = 8
# Reconstruct strategy past the unroll width: "grouped" = fori_loop over
# G-slot groups; "cond" = lax.cond-guarded static groups (measured slower
# than grouped); "static" = full unroll regardless of width. Module-level
# so benchmarks can sweep it.
_RECON_MODE = "grouped"


def _reconstruct_panel(vals_ref, cols_ref, w_bound, chunk, width, tr=_TR):
    """Densify one (chunk, row-tile) panel S^T from SELL slots.

    One broadcast-compare-select per slot. Small static widths unroll
    fully; larger ones skip slot GROUPS past the PER-TILE slot bound (the
    SortedRowSwizzle dividend: ragged rows only cost their own tile).
    Slots past a row's nnz hold the sentinel column id and add 0, so a
    group may safely over-read up to the storage width.
    """
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (chunk, tr), 0)

    def select(w, s):
        cols_row = cols_ref[w, :][None, :]  # (1, TR): sublane broadcast
        vals_row = vals_ref[w, :][None, :].astype(jnp.float32)
        return s + jnp.where(iota_c == cols_row, vals_row, 0.0)

    s = jnp.zeros((chunk, tr), jnp.float32)
    if width <= _UNROLL_MAX_WIDTH or _RECON_MODE == "static":
        for w in range(width):
            s = select(w, s)
        return s

    g = _SLOT_GROUP
    if _RECON_MODE == "cond":
        def group_fn(base):
            def run(s):
                for i in range(base, min(base + g, width)):
                    s = select(i, s)
                return s
            return run

        for base in range(0, width, g):
            s = jax.lax.cond(base < w_bound, group_fn(base), lambda s: s, s)
        return s

    n_full = width // g

    def body(wg, s):
        base = wg * g
        for i in range(g):
            s = select(base + i, s)
        return s

    groups = jnp.minimum((w_bound + g - 1) // g, n_full)
    s = jax.lax.fori_loop(0, groups, body, s)
    for w in range(n_full * g, width):  # static tail (< g slots)
        s = select(w, s)
    return s


def _spmm_kernel(tw_ref, vals_ref, cols_ref, b_ref, out_ref, acc_ref, st_ref, *, n_chunks, chunk, width):
    r = pl.program_id(0)
    kc = pl.program_id(2)

    @pl.when(kc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    st_ref[:] = _reconstruct_panel(vals_ref.at[0], cols_ref.at[0], tw_ref[kc, r], chunk, width)
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


def _spmm_fused_kernel(tw_ref, vals_ref, cols_ref, b_ref, out_ref, *, n_chunks, chunk, width, tr):
    """One grid step per row tile; ALL chunks fused in-kernel with B
    resident in VMEM. Wherever B fits, the per-step grid cost (~0.5 us on
    v5e) dominates the chunked kernel at high sparsity — fusing the chunk
    loop trades grid steps for a static in-kernel loop (~4x at 1M rows,
    0.2% nnz; 2-4x on small DLMC shapes at 95-98%). ``tr`` widens the row
    tile (fewer steps still) where ``rows_padded`` allows."""
    r = pl.program_id(0)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for kc in range(n_chunks):
        s_t = _reconstruct_panel(
            vals_ref.at[kc], cols_ref.at[kc], tw_ref[kc, r], chunk, width, tr
        )
        acc = acc + jax.lax.dot_general(
            s_t,
            b_ref[kc * chunk : (kc + 1) * chunk, :].astype(jnp.float32),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc.astype(out_ref.dtype)


# The fused variant keeps B and all chunk slabs in VMEM; gate on sizes.
_FUSED_B_VMEM_LIMIT = 2 << 20  # bytes
_FUSED_SLAB_VMEM_LIMIT = 1 << 20


def _fused_fits(a: SellMatrix, n: int, tr: int) -> bool:
    b_bytes = a.n_chunks * a.chunk * n * 4
    slab_bytes = 2 * a.n_chunks * a.width * tr * 4
    return (
        a.rows_padded % tr == 0
        and b_bytes <= _FUSED_B_VMEM_LIMIT
        and slab_bytes <= _FUSED_SLAB_VMEM_LIMIT
    )


def _pick_variant(a: SellMatrix, n: int):
    """(variant, tr) heuristic. The fused kernel wins whenever it fits:
    it pays one grid step per row tile (vs one per (row-tile, chunk)) and
    keeps B resident across the in-kernel chunk loop. Row tiles wider than
    128 measured only ~10% faster where they compiled at all and Mosaic
    compile times blow up (minutes) on the 256-lane select panels — stay
    at 128 (explicit ``row_tile=`` still honors wider tiles)."""
    if _fused_fits(a, n, _TR):
        return "fused", _TR
    return "chunked", _TR


def spmm(
    a: SellMatrix,
    b: jax.Array,
    *,
    out_dtype=None,
    n_tile: int = 512,
    variant: str | None = None,  # None (auto) | "fused" | "chunked"
    row_tile: int | None = None,  # fused row tile; None = auto
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
    if variant is None:
        variant, tr = _pick_variant(a, n)
    else:
        tr = _TR
    if row_tile is not None:
        tr = row_tile
    if variant == "fused":
        if a.rows_padded % tr != 0:
            raise ValueError(
                f"fused spmm row_tile {tr} must divide rows_padded "
                f"{a.rows_padded}"
            )
        if not _fused_fits(a, n, tr):
            raise ValueError(
                f"fused spmm variant does not fit VMEM at n={n}, tr={tr} "
                f"(width={a.width}, n_chunks={a.n_chunks})"
            )
    if variant == "fused":
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(a.rows_padded // tr,),
            in_specs=[
                pl.BlockSpec(
                    (a.n_chunks, a.width, tr), lambda r, tw: (0, 0, r)
                ),
                pl.BlockSpec(
                    (a.n_chunks, a.width, tr), lambda r, tw: (0, 0, r)
                ),
                pl.BlockSpec((k_padded, n), lambda r, tw: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tr, n), lambda r, tw: (r, 0)),
        )
        out = pl.pallas_call(
            functools.partial(
                _spmm_fused_kernel,
                n_chunks=a.n_chunks, chunk=a.chunk, width=a.width, tr=tr,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((a.rows_padded, n), out_dtype),
            compiler_params=compiler_params(("parallel",)),
            interpret=interpret,
        )(_tile_widths(a, tr), a.values, a.indices, b)
        return _unpermute_rows(out, a)[: a.rows]
    bn = min(n, n_tile)
    if n % bn:
        bn = n  # odd widths: single tile (keeps the index math exact)
    grid = (a.rows_padded // _TR, cdiv(n, bn), a.n_chunks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, a.width, _TR), lambda r, nt, kc, tw: (kc, 0, r)),
            pl.BlockSpec((1, a.width, _TR), lambda r, nt, kc, tw: (kc, 0, r)),
            pl.BlockSpec((a.chunk, bn), lambda r, nt, kc, tw: (kc, nt)),
        ],
        out_specs=pl.BlockSpec((_TR, bn), lambda r, nt, kc, tw: (r, nt)),
        scratch_shapes=[
            pltpu.VMEM((_TR, bn), jnp.float32),
            pltpu.VMEM((a.chunk, _TR), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_spmm_kernel, n_chunks=a.n_chunks, chunk=a.chunk, width=a.width),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((a.rows_padded, n), out_dtype),
        compiler_params=compiler_params(("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(_tile_widths(a), a.values, a.indices, b)
    out = _unpermute_rows(out, a)
    return out[: a.rows]


def _spmm_t_kernel(tw_ref, vals_ref, cols_ref, x_ref, out_ref, acc_ref, *, n_rowtiles, chunk, width):
    kc = pl.program_id(0)
    rt = pl.program_id(2)

    @pl.when(rt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s_t = _reconstruct_panel(vals_ref.at[0], cols_ref.at[0], tw_ref[kc, rt], chunk, width)
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
    x = _permute_rows_in(x, a)
    bn = min(n, n_tile)
    if n % bn:
        bn = n
    n_rowtiles = a.rows_padded // _TR
    grid = (a.n_chunks, cdiv(n, bn), n_rowtiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, a.width, _TR), lambda kc, nt, rt, tw: (kc, 0, rt)),
            pl.BlockSpec((1, a.width, _TR), lambda kc, nt, rt, tw: (kc, 0, rt)),
            pl.BlockSpec((_TR, bn), lambda kc, nt, rt, tw: (rt, nt)),
        ],
        out_specs=pl.BlockSpec((a.chunk, bn), lambda kc, nt, rt, tw: (kc, nt)),
        scratch_shapes=[pltpu.VMEM((a.chunk, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_spmm_t_kernel, n_rowtiles=n_rowtiles, chunk=a.chunk, width=a.width),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((a.n_chunks * a.chunk, n), out_dtype),
        compiler_params=compiler_params(("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(_tile_widths(a), a.values, a.indices, x)
    return out[: a.cols]


# Above this slot width the one-shot (width, chunk, TR) select tensor would
# strain VMEM (width * 64KB); fall back to the per-slot loop.
_SDDMM_ONESHOT_MAX_WIDTH = 48


def _sddmm_kernel(tw_ref, a_ref, b_ref, cols_ref, out_ref, *, width, chunk):
    r = pl.program_id(0)
    kc = pl.program_id(1)
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

    out_ref[0] = jnp.zeros((width, _TR), out_ref.dtype)  # slots past the bound
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (chunk, _TR), 0)

    def body(w, _):
        cols_row = cols_ref[0, w, :][None, :]  # (1, TR)
        picked = jnp.sum(
            jnp.where(iota_c == cols_row, scores_t, 0.0), axis=0, keepdims=True
        )
        out_ref[0, w, :] = picked[0].astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, tw_ref[kc, r], body, 0)


def _sddmm_fused_kernel(tw_ref, a_ref, b_ref, cols_ref, out_ref, *, width,
                        chunk, n_chunks):
    """One grid step per row tile, all column chunks fused in-kernel (B
    resident in VMEM) — the SDDMM mirror of ``_spmm_fused_kernel``: at
    high sparsity / small shapes the (rowtiles x n_chunks) grid's fixed
    per-step cost dominates."""
    del tw_ref
    iota = jax.lax.broadcasted_iota(jnp.int32, (width, chunk, _TR), 1)
    for kc in range(n_chunks):
        scores_t = jax.lax.dot_general(
            b_ref[kc * chunk : (kc + 1) * chunk, :].astype(jnp.float32),
            a_ref[:].astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (chunk, TR)
        cols = cols_ref[kc]  # (width, TR)
        sel = jnp.where(cols[:, None, :] == iota, scores_t[None, :, :], 0.0)
        out_ref[kc] = jnp.sum(sel, axis=1).astype(out_ref.dtype)


# The fused SDDMM keeps B plus the (n_chunks, width, TR) select tensor per
# chunk in VMEM; gate on both.
def _sddmm_use_fused(topology: SellMatrix, k: int) -> bool:
    b_bytes = topology.n_chunks * topology.chunk * k * 4
    sel_bytes = topology.width * topology.chunk * _TR * 4
    out_bytes = 2 * topology.n_chunks * topology.width * _TR * 4
    return (
        topology.width <= _SDDMM_ONESHOT_MAX_WIDTH
        and b_bytes <= _FUSED_B_VMEM_LIMIT
        and sel_bytes + out_bytes <= 6 << 20
    )


def sddmm(
    a: jax.Array,
    b: jax.Array,
    topology: SellMatrix,
    *,
    out_dtype=None,
    variant: str | None = None,  # None (auto) | "fused" | "chunked"
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
    a = _permute_rows_in(a, topology)
    k_padded = topology.n_chunks * topology.chunk
    if b.shape[0] < k_padded:
        b = jnp.pad(b, ((0, k_padded - b.shape[0]), (0, 0)))
    if variant is None:
        variant = "fused" if _sddmm_use_fused(topology, k) else "chunked"
    if variant == "fused":
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(topology.rows_padded // _TR,),
            in_specs=[
                pl.BlockSpec((_TR, k), lambda r, tw: (r, 0)),
                pl.BlockSpec((k_padded, k), lambda r, tw: (0, 0)),
                pl.BlockSpec(
                    (topology.n_chunks, topology.width, _TR),
                    lambda r, tw: (0, 0, r),
                ),
            ],
            out_specs=pl.BlockSpec(
                (topology.n_chunks, topology.width, _TR),
                lambda r, tw: (0, 0, r),
            ),
        )
        values = pl.pallas_call(
            functools.partial(
                _sddmm_fused_kernel, width=topology.width,
                chunk=topology.chunk, n_chunks=topology.n_chunks,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (topology.n_chunks, topology.width, topology.rows_padded),
                out_dtype,
            ),
            compiler_params=compiler_params(("parallel",)),
            interpret=interpret,
        )(_tile_widths(topology), a, b, topology.indices)
        return topology.with_values(values)
    grid = (topology.rows_padded // _TR, topology.n_chunks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TR, k), lambda r, c, tw: (r, 0)),
            pl.BlockSpec((topology.chunk, k), lambda r, c, tw: (c, 0)),
            pl.BlockSpec((1, topology.width, _TR), lambda r, c, tw: (c, 0, r)),
        ],
        out_specs=pl.BlockSpec((1, topology.width, _TR), lambda r, c, tw: (c, 0, r)),
    )
    values = pl.pallas_call(
        functools.partial(_sddmm_kernel, width=topology.width, chunk=topology.chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (topology.n_chunks, topology.width, topology.rows_padded), out_dtype
        ),
        compiler_params=compiler_params(("parallel", "parallel")),
        interpret=interpret,
    )(_tile_widths(topology), a, b, topology.indices)
    return topology.with_values(values)


# ---------------------------------------------------------------------------
# SELL row softmax (round 3): one Pallas kernel instead of the jnp chain.
#
# The jnp path (ops/csr.py::sparse_softmax_sell) materializes the valid
# mask and crosses the slot buffer ~5-7 times through XLA (audit: 0.36 of
# the 3-pass SoL). Here each 128-row lane tile's full slot column —
# (n_chunks, width, 128), ~width*512 bytes per row — fits VMEM easily, so
# the kernel reads values+indices ONCE, computes the masked row max / sum
# in registers, and writes the normalized probabilities from the resident
# copy: 3 slot passes total, the structural minimum (bench/models.py::
# softmax_model). Upstream-Sputnik capability anchor: SparseSoftmax for
# attention (SURVEY.md north star).
# ---------------------------------------------------------------------------


def _softmax_body(v, valid, o_ref, scale):
    if scale is not None:
        v = v * scale
    nc, w, lanes = v.shape
    v2 = jnp.where(valid, v, _NEG).reshape(nc * w, lanes)
    m = jnp.max(v2, axis=0, keepdims=True)
    m = jnp.maximum(m, -3e38)  # empty rows
    e = jnp.exp(v2 - m)
    e = jnp.where(v2 > 0.5 * _NEG, e, 0.0)
    s = jnp.maximum(jnp.sum(e, axis=0, keepdims=True), 1e-30)
    o_ref[:] = (e / s).reshape(nc, w, lanes).astype(o_ref.dtype)


def _softmax_kernel(v_ref, i_ref, o_ref, *, sentinel: int, scale):
    _softmax_body(
        v_ref[:].astype(jnp.float32), i_ref[:] != sentinel, o_ref, scale
    )


def _softmax_counts_kernel(v_ref, c_ref, o_ref, *, scale):
    v = v_ref[:].astype(jnp.float32)
    nc, w, lanes = v.shape
    # Valid slots are a PREFIX of the width axis per (chunk, row): the
    # mask comes from the tiny (nc, 128) counts tile instead of the full
    # int32 indices rectangle — one slot pass of HBM traffic saved.
    slot = jax.lax.broadcasted_iota(jnp.int32, (nc, w, lanes), 1)
    _softmax_body(v, slot < c_ref[:][:, None, :], o_ref, scale)


_NEG = -1e30


def sparse_softmax(
    m: SellMatrix,
    *,
    scale: float | None = None,
    interpret: bool | None = None,
):
    """Row softmax over a SELL matrix's valid slots, one fused pass.

    With ``m.slot_counts`` present (any ``from_csr``-built matrix) the
    mask is derived from the per-(chunk, row) counts and the indices
    rectangle never streams: 2 slot passes of traffic instead of 3."""
    interpret = use_interpret() if interpret is None else interpret
    nc, w, rp = m.values.shape
    if w == 0 or rp == 0:
        return m
    tiles = rp // 128
    if m.slot_counts is not None:
        f = pl.pallas_call(
            functools.partial(_softmax_counts_kernel, scale=scale),
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec((nc, w, 128), lambda t: (0, 0, t)),
                pl.BlockSpec((nc, 128), lambda t: (0, t)),
            ],
            out_specs=pl.BlockSpec((nc, w, 128), lambda t: (0, 0, t)),
            out_shape=jax.ShapeDtypeStruct((nc, w, rp), m.values.dtype),
            compiler_params=compiler_params(("parallel",)),
            interpret=interpret,
        )
        return m.with_values(f(m.values, m.slot_counts))
    f = pl.pallas_call(
        functools.partial(_softmax_kernel, sentinel=m.chunk, scale=scale),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((nc, w, 128), lambda t: (0, 0, t)),
            pl.BlockSpec((nc, w, 128), lambda t: (0, 0, t)),
        ],
        out_specs=pl.BlockSpec((nc, w, 128), lambda t: (0, 0, t)),
        out_shape=jax.ShapeDtypeStruct((nc, w, rp), m.values.dtype),
        compiler_params=compiler_params(("parallel",)),
        interpret=interpret,
    )
    return m.with_values(f(m.values, m.indices))
