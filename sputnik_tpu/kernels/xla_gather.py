"""Pure-XLA gather + batched deep dot BSR matmul (uniform or padded-ragged).

Round-3 probe context: every Pallas DSD schedule issues per-step dots with
m = 128 and contraction depth 128, while XLA's dense dot at the headline
shape runs markedly closer to peak (``docs/mxu_probe.json``). This variant
asks XLA to do the whole thing: when every block-row holds the SAME number
of nonzero blocks W (the bench grid's PERFECT_UNIFORM patterns and the
MegaBlocks expert layouts), the gather of B panels is a regular
``jnp.take`` and the contraction collapses to ONE batched dot of depth
W * bs — XLA tiles it onto the MXU with its own (deep) schedule.

The trade is explicit and measured, not assumed: the gather MATERIALIZES
(block_rows * W * bs * N) elements of B panels in HBM (XLA does not fuse
gathers into dot operands on TPU), so the variant pays
~2 * density * |B| * K/bs extra HBM bytes for the deeper MXU schedule.
The registry keeps it behind an opt-in ``variant=`` / autotune choice; the
headline shootout records where the crossover actually lands.

Reference analogue: none — ``block/cutlass/dependent_tile_access_iterator.h``
does this gather tile-by-tile in registers; XLA's equivalent is
whole-operand. Uniformity requirement mirrors the reference's
PERFECT_UNIFORM generator (``matrix_utils.cu:307-342``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sputnik_tpu.formats import BlockSparseMatrix

__all__ = ["dsd_gather_bmm", "dds_gather_bmm", "uniform_row_width",
           "uniform_col_width"]


def _concrete(x) -> bool:
    return not isinstance(x, jax.core.Tracer)


def uniform_row_width(a: BlockSparseMatrix):
    """W if every block-row has exactly W nonzero blocks, else None.

    Requires concrete (non-traced) offsets — uniformity is a host-side
    dispatch decision, like the reference's can_implement predicates.
    """
    if not _concrete(a.offsets):
        return None
    import numpy as np

    counts = np.asarray(a.offsets[1:] - a.offsets[:-1])
    if counts.size == 0:
        return None
    w = int(counts[0])
    return w if w > 0 and bool((counts == w).all()) else None


def uniform_col_width(b: BlockSparseMatrix):
    """W if every block-COLUMN has exactly W nonzero blocks, else None."""
    bt = b.with_transpose_metadata()
    if not _concrete(bt.offsets_t):
        return None
    import numpy as np

    counts = np.asarray(bt.offsets_t[1:] - bt.offsets_t[:-1])
    if counts.size == 0:
        return None
    w = int(counts[0])
    return w if w > 0 and bool((counts == w).all()) else None


def dsd_gather_bmm(
    a: BlockSparseMatrix,
    b: jax.Array,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    **_,
) -> jax.Array:
    """C[M, N] = A_sparse @ op(B): gather B panels, one batched deep dot.

    Uniform rows use the metadata arrays directly; RAGGED rows are padded
    host-side to W = max row width with a zero A block (gathered in — the
    reference's generators pad the same way, ``matrix_utils.cu:272-282``),
    so the batched dot stays regular at the cost of gathering A too.
    ``transpose_a`` is unsupported (A^T's block-rows are A's block-columns,
    whose counts are not uniform when the rows' are); the registry gates it.
    Reference semantics: ``block/dsd/dsd.h:10-22``.
    """
    if transpose_a:
        raise ValueError("dsd_gather_bmm supports transpose_a=False only")
    if not (_concrete(a.offsets) and _concrete(a.indices)):
        raise ValueError(
            "dsd_gather_bmm plans slot maps host-side: metadata must be "
            "concrete (pre-plan outside jit, like plan_dsd)"
        )
    out_dtype = out_dtype or a.dtype
    bs = a.block_size
    mb = a.block_rows
    n_dim = b.shape[0] if transpose_b else b.shape[1]
    bk = b.shape[1] if transpose_b else b.shape[0]
    if bk != a.cols:
        raise ValueError(
            f"contraction mismatch: A gives k={a.cols}, B gives {bk}"
        )
    w = uniform_row_width(a)
    if w is not None:
        idx2 = a.indices.reshape(mb, w)
        a4 = a.data.reshape(mb, w, bs, bs)
    else:
        import numpy as np

        offs = np.asarray(a.offsets)
        idxs = np.asarray(a.indices)
        counts = offs[1:] - offs[:-1]
        w = max(int(counts.max()), 1)
        # slot -> physical block position; pads point at the appended zero
        # block (position nnz) and k-index 0 (any valid panel x 0 = 0).
        slot_pos = np.full((mb, w), a.nnz_blocks, np.int32)
        slot_idx = np.zeros((mb, w), np.int32)
        for r in range(mb):
            c = int(counts[r])
            slot_pos[r, :c] = np.arange(offs[r], offs[r + 1])
            slot_idx[r, :c] = idxs[offs[r]:offs[r + 1]]
        zero = jnp.zeros((1, bs, bs), a.data.dtype)
        a4 = jnp.take(
            jnp.concatenate([a.data, zero]), jnp.asarray(slot_pos.ravel()),
            axis=0,
        ).reshape(mb, w, bs, bs)
        idx2 = jnp.asarray(slot_idx)
    if transpose_b:
        # B stored (N, K): panel k is B[:, k*bs:(k+1)*bs]^T.
        b3 = b.reshape(n_dim, a.cols // bs, bs)
        gathered = jnp.take(b3, idx2.reshape(-1), axis=1)  # (N, mb*w, bs)
        gathered = gathered.reshape(n_dim, mb, w, bs)
        out = jnp.einsum(
            "rwik,nrwk->rin", a4, gathered,
            preferred_element_type=jnp.float32,
        )
    else:
        b3 = b.reshape(a.cols // bs, bs, n_dim)
        gathered = jnp.take(b3, idx2, axis=0)  # (mb, w, bs, N)
        out = jnp.einsum(
            "rwik,rwkn->rin", a4, gathered,
            preferred_element_type=jnp.float32,
        )
    return out.reshape(a.rows, n_dim).astype(out_dtype)


def dds_gather_bmm(
    a: jax.Array,
    b: BlockSparseMatrix,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    out_dtype=None,
    **_,
) -> jax.Array:
    """C[M, N] = op(A) @ B_sparse, uniform block-COLUMNS of B.

    The mirror gather: A's column-panels follow B's per-column block-row
    ids (``indices_t``); B's blocks are regrouped column-major through
    ``block_offsets``. ``transpose_b`` unsupported (B^T's columns are B's
    rows). Reference semantics: ``block/dds/dds.h``.
    """
    if transpose_b:
        raise ValueError("dds_gather_bmm supports transpose_b=False only")
    w = uniform_col_width(b)
    if w is None:
        raise ValueError(
            "dds_gather_bmm needs a uniform-column pattern with concrete "
            "metadata"
        )
    out_dtype = out_dtype or b.dtype
    bt = b.with_transpose_metadata()
    bs = b.block_size
    nb = b.block_cols
    m_dim = a.shape[1] if transpose_a else a.shape[0]
    ak = a.shape[0] if transpose_a else a.shape[1]
    if ak != b.rows:
        raise ValueError(
            f"contraction mismatch: B gives k={b.rows}, A gives {ak}"
        )
    idx2 = bt.indices_t.reshape(nb, w)  # block-row ids per column
    b4 = jnp.take(bt.data, bt.block_offsets, axis=0).reshape(nb, w, bs, bs)
    if transpose_a:
        # A stored (K, M): panel k is A[k*bs:(k+1)*bs, :]^T.
        a3 = a.reshape(b.rows // bs, bs, m_dim)
        gathered = jnp.take(a3, idx2, axis=0)  # (nb, w, bs, M)
        out = jnp.einsum(
            "jwkm,jwkn->mjn", gathered, b4,
            preferred_element_type=jnp.float32,
        )
    else:
        a3 = a.reshape(m_dim, b.rows // bs, bs)
        gathered = jnp.take(a3, idx2.reshape(-1), axis=1)  # (M, nb*w, bs)
        gathered = gathered.reshape(m_dim, nb, w, bs)
        out = jnp.einsum(
            "mjwk,jwkn->mjn", gathered, b4,
            preferred_element_type=jnp.float32,
        )
    return out.reshape(m_dim, nb * bs).astype(out_dtype)
