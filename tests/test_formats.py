"""Format layer tests: BSR/CSR round trips and metadata transforms."""

import jax.numpy as jnp
import numpy as np
import pytest

from sputnik_tpu import formats
from sputnik_tpu.utils import testing


def test_bsr_dense_round_trip(rng):
    x = rng.standard_normal((256, 384)).astype(np.float32)
    # Zero out some blocks.
    x[:128, :128] = 0
    x[128:, 256:] = 0
    m = formats.bsr_from_dense(x, 128)
    assert m.nnz_blocks == 4
    np.testing.assert_allclose(np.asarray(m.to_dense()), x, rtol=1e-6)


def test_bsr_generator_padding_and_unordered(rng):
    m = testing.random_bsr(rng, 512, 512, 6 * 128 * 128, 128, pad_rows_to=2, unordered=True)
    # Padded rows: every row's block count is a multiple of 2.
    offs = np.asarray(m.offsets)
    assert ((offs[1:] - offs[:-1]) % 2 == 0).all()
    # Densify matches a manual scatter (duplicates are zero-valued).
    dense = np.asarray(m.to_dense())
    assert dense.shape == (512, 512)


def test_transpose_metadata(rng):
    m = testing.random_bsr(rng, 512, 384, 8 * 128 * 128, 128, unordered=True)
    mt = m.with_transpose_metadata()
    # offsets_t prefix-sums per block-column.
    counts = np.bincount(np.asarray(m.indices), minlength=m.block_cols)
    np.testing.assert_array_equal(
        np.asarray(mt.offsets_t), np.concatenate([[0], np.cumsum(counts)])
    )
    # Materialized transpose equals dense transpose.
    np.testing.assert_allclose(
        np.asarray(m.transpose().to_dense()),
        np.asarray(m.to_dense()).T,
        rtol=1e-6,
    )


def test_iteration_arrays_orders(rng):
    m = testing.random_bsr(rng, 512, 512, 7 * 128 * 128, 128, unordered=True)
    rows, cols, dids = m.iteration_arrays(transposed=False)
    assert (np.diff(np.asarray(rows)) >= 0).all()  # grouped by row
    trows, tcols, tdids = m.iteration_arrays(transposed=True)
    assert (np.diff(np.asarray(trows)) >= 0).all()  # grouped by column
    # Transposed iteration visits every physical block once.
    assert sorted(np.asarray(tdids).tolist()) == list(range(m.nnz_blocks))


def test_position_map(rng):
    m = testing.random_bsr(rng, 384, 512, 5 * 128 * 128, 128)
    pos = np.asarray(m.position_map())
    rows = np.asarray(m.row_indices)
    cols = np.asarray(m.indices)
    for j in range(m.nnz_blocks):
        assert pos[rows[j], cols[j]] == j or pos[rows[j], cols[j]] >= 0
    assert (pos >= 0).sum() == m.nnz_blocks


def test_row_indices_from_offsets():
    offs = jnp.asarray([0, 2, 2, 5], jnp.int32)
    out = formats.row_indices_from_offsets(offs, 5)
    np.testing.assert_array_equal(np.asarray(out), [0, 0, 2, 2, 2])


def test_sorted_row_swizzle():
    offs = jnp.asarray([0, 1, 4, 4, 6], jnp.int32)  # row nnz = 1, 3, 0, 2
    order = np.asarray(formats.sorted_row_swizzle(offs))
    np.testing.assert_array_equal(order, [1, 3, 0, 2])


def test_csr_round_trip(rng):
    x = rng.standard_normal((64, 96)).astype(np.float32)
    x[np.abs(x) < 1.0] = 0.0
    m = formats.csr_from_dense(x)
    np.testing.assert_allclose(np.asarray(m.to_dense()), x, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m.transpose().to_dense()), x.T, rtol=1e-6)


def test_csr_generator_padding(rng):
    m = testing.random_csr(rng, 64, 128, 500, pad_rows_to=4)
    offs = np.asarray(m.offsets)
    assert ((offs[1:] - offs[:-1]) % 4 == 0).all()
    # Padding values are zero => densify preserves the random pattern's sums.
    assert np.isfinite(np.asarray(m.to_dense())).all()


def test_bsr_is_pytree(rng):
    import jax

    m = testing.random_bsr(rng, 256, 256, 2 * 128 * 128, 128)
    leaves, treedef = jax.tree_util.tree_flatten(m)
    m2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert m2.shape == m.shape and m2.block_size == m.block_size

    @jax.jit
    def scale(mat):
        return mat.with_data(mat.data * 2.0)

    out = scale(m)
    np.testing.assert_allclose(
        np.asarray(out.to_dense()), 2 * np.asarray(m.to_dense()), rtol=1e-6
    )
