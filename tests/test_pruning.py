"""Tests for sputnik_tpu.prune: block magnitude pruning, the gradual
schedule, and RigL block topology refresh (static-nnz invariants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sputnik_tpu import prune
from sputnik_tpu.formats import BlockSparseMatrix
from sputnik_tpu import ops


def _np_block_scores(w, bs, score="l2"):
    R, C = w.shape[0] // bs, w.shape[1] // bs
    blocks = w.reshape(R, bs, C, bs).astype(np.float64)
    if score == "l2":
        return (blocks * blocks).sum(axis=(1, 3))
    return np.abs(blocks).sum(axis=(1, 3))


def _block_mask_dense(m: BlockSparseMatrix) -> np.ndarray:
    """Dense 0/1 elementwise mask of the active blocks."""
    bs = m.block_size
    mask = np.zeros((m.block_rows, m.block_cols), bool)
    mask[np.asarray(m.row_indices), np.asarray(m.indices)] = True
    return np.kron(mask, np.ones((bs, bs), bool))


@pytest.mark.parametrize("score", ["l2", "l1"])
def test_block_magnitude_prune_keeps_topk(rng, score):
    w = rng.standard_normal((128, 256)).astype(np.float32)
    bs, k = 32, 10
    m = prune.block_magnitude_prune(jnp.asarray(w), bs, nnz_blocks=k, score=score)
    assert m.nnz_blocks == k and m.block_size == bs
    # The kept block set is exactly the top-k by score.
    scores = _np_block_scores(w, bs, score).reshape(-1)
    expect = set(np.argsort(scores)[-k:].tolist())
    got = {
        int(r) * m.block_cols + int(c)
        for r, c in zip(np.asarray(m.row_indices), np.asarray(m.indices))
    }
    assert got == expect
    # Values are the original blocks: densify == w * block mask.
    np.testing.assert_allclose(
        np.asarray(m.to_dense()), w * _block_mask_dense(m), rtol=0, atol=0
    )
    # Canonical CSR order: row-major sorted, offsets consistent.
    flat = np.asarray(m.row_indices).astype(np.int64) * m.block_cols + np.asarray(
        m.indices
    )
    assert (np.diff(flat) > 0).all()
    counts = np.diff(np.asarray(m.offsets))
    np.testing.assert_array_equal(counts, np.bincount(np.asarray(m.row_indices), minlength=m.block_rows))


def test_block_magnitude_prune_sparsity_budget(rng):
    w = rng.standard_normal((256, 256)).astype(np.float32)
    m = prune.block_magnitude_prune(jnp.asarray(w), 64, sparsity=0.75)
    assert m.nnz_blocks == 4  # 16 blocks total, keep 25%


def test_block_magnitude_prune_under_jit(rng):
    w = rng.standard_normal((128, 128)).astype(np.float32)
    f = jax.jit(lambda x: prune.block_magnitude_prune(x, 32, nnz_blocks=6))
    mj = f(jnp.asarray(w))
    me = prune.block_magnitude_prune(jnp.asarray(w), 32, nnz_blocks=6)
    np.testing.assert_allclose(np.asarray(mj.to_dense()), np.asarray(me.to_dense()))


def test_gradual_sparsity_schedule():
    kw = dict(final_sparsity=0.9, initial_sparsity=0.0, begin_step=100, end_step=500)
    assert prune.gradual_sparsity(0, **kw) == 0.0
    assert prune.gradual_sparsity(100, **kw) == 0.0
    assert abs(prune.gradual_sparsity(500, **kw) - 0.9) < 1e-12
    assert abs(prune.gradual_sparsity(10_000, **kw) - 0.9) < 1e-12
    vals = [prune.gradual_sparsity(t, **kw) for t in range(100, 501, 50)]
    assert all(b >= a for a, b in zip(vals, vals[1:]))  # monotone
    # Cubic midpoint: s_f * (1 - (1 - 0.5)^3) = 0.9 * 0.875
    assert abs(prune.gradual_sparsity(300, **kw) - 0.9 * 0.875) < 1e-12


def test_rigl_update_invariants(rng):
    bs, R, C = 32, 4, 8
    w = rng.standard_normal((R * bs, C * bs)).astype(np.float32)
    m = prune.block_magnitude_prune(jnp.asarray(w), bs, nnz_blocks=12)
    g = rng.standard_normal((R * bs, C * bs)).astype(np.float32)
    m2 = prune.rigl_block_update(m, jnp.asarray(g), drop_fraction=0.25)

    # nnz budget invariant, shapes identical (kernel-reuse contract).
    assert m2.nnz_blocks == m.nnz_blocks
    assert m2.data.shape == m.data.shape

    old = {
        (int(r), int(c))
        for r, c in zip(np.asarray(m.row_indices), np.asarray(m.indices))
    }
    new = {
        (int(r), int(c))
        for r, c in zip(np.asarray(m2.row_indices), np.asarray(m2.indices))
    }
    n_drop = round(0.25 * 12)
    assert len(old - new) == n_drop and len(new - old) == n_drop

    # Dropped = lowest value-norm active blocks.
    wnorm = {
        (int(r), int(c)): float((np.asarray(blk, np.float64) ** 2).sum())
        for r, c, blk in zip(
            np.asarray(m.row_indices), np.asarray(m.indices), np.asarray(m.data)
        )
    }
    dropped = old - new
    kept = old & new
    assert max(wnorm[b] for b in dropped) <= min(wnorm[b] for b in kept)

    # Regrown = highest grad-norm blocks among blocks inactive pre-update.
    gscores = _np_block_scores(g, bs)
    inactive = {
        (r, c) for r in range(R) for c in range(C) if (r, c) not in old
    }
    grown = new - old
    grown_min = min(gscores[r, c] for r, c in grown)
    other_max = max(gscores[r, c] for r, c in (inactive - grown))
    assert grown_min >= other_max

    # Surviving blocks keep values; regrown blocks are zero.
    d1 = np.asarray(m.to_dense())
    d2 = np.asarray(m2.to_dense())
    keep_mask = _block_mask_dense(m) & _block_mask_dense(m2)
    np.testing.assert_allclose(d2[keep_mask], d1[keep_mask])
    grown_mask = _block_mask_dense(m2) & ~_block_mask_dense(m)
    assert (d2[grown_mask] == 0).all()


def test_rigl_update_under_jit(rng):
    bs = 32
    w = rng.standard_normal((128, 128)).astype(np.float32)
    m = prune.block_magnitude_prune(jnp.asarray(w), bs, nnz_blocks=8)
    g = jnp.asarray(rng.standard_normal((128, 128)).astype(np.float32))
    f = jax.jit(lambda mm, gg: prune.rigl_block_update(mm, gg, drop_fraction=0.5))
    np.testing.assert_allclose(
        np.asarray(f(m, g).to_dense()),
        np.asarray(prune.rigl_block_update(m, g, drop_fraction=0.5).to_dense()),
    )


def test_rigl_clamps_drop_to_inactive(rng):
    # 15 of 16 blocks active: only one can be regrown no matter the fraction.
    w = rng.standard_normal((128, 128)).astype(np.float32)
    m = prune.block_magnitude_prune(jnp.asarray(w), 32, nnz_blocks=15)
    g = jnp.asarray(rng.standard_normal((128, 128)).astype(np.float32))
    m2 = prune.rigl_block_update(m, g, drop_fraction=0.9)
    assert m2.nnz_blocks == 15
    old = set(zip(np.asarray(m.row_indices).tolist(), np.asarray(m.indices).tolist()))
    new = set(zip(np.asarray(m2.row_indices).tolist(), np.asarray(m2.indices).tolist()))
    assert len(new - old) == 1


def test_rigl_zero_drop_is_identity(rng):
    w = rng.standard_normal((128, 128)).astype(np.float32)
    m = prune.block_magnitude_prune(jnp.asarray(w), 32, nnz_blocks=8)
    g = jnp.asarray(rng.standard_normal((128, 128)).astype(np.float32))
    m2 = prune.rigl_block_update(m, g, drop_fraction=0.0)
    assert m2 is m


def test_pruned_matmul_matches_masked_dense(rng):
    w = rng.standard_normal((256, 256)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32))
    m = prune.block_magnitude_prune(jnp.asarray(w), 128, nnz_blocks=3)
    out = ops.matmul_dsd(m, x)
    expect = (w * _block_mask_dense(m)) @ np.asarray(x)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-2, atol=2e-2)


def test_validation_errors(rng):
    w = jnp.asarray(rng.standard_normal((128, 128)).astype(np.float32))
    with pytest.raises(ValueError):
        prune.block_magnitude_prune(w, 32)  # neither budget given
    with pytest.raises(ValueError):
        prune.block_magnitude_prune(w, 32, sparsity=0.5, nnz_blocks=4)
    with pytest.raises(ValueError):
        prune.block_magnitude_prune(w, 32, sparsity=1.0)
    with pytest.raises(ValueError):
        prune.block_magnitude_prune(w, 48, sparsity=0.5)  # non-dividing bs
    m = prune.block_magnitude_prune(w, 32, sparsity=0.5)
    with pytest.raises(ValueError):
        prune.rigl_block_update(m, jnp.zeros((64, 64)), drop_fraction=0.3)
    with pytest.raises(ValueError):
        prune.rigl_block_update(m, w, drop_fraction=1.5)
    with pytest.raises(ValueError):
        prune.gradual_sparsity(0, final_sparsity=0.9, begin_step=10, end_step=10)
