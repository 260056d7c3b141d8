"""Native host toolkit tests (C++ fast paths vs numpy fallbacks + formats)."""

import numpy as np
import pytest

from sputnik_tpu import native
from sputnik_tpu.utils import dlmc, testing


def _random_csr_np(rng, rows, cols, nnz):
    m = testing.random_csr(rng, rows, cols, nnz)
    return (
        np.asarray(m.offsets),
        np.asarray(m.indices),
        np.asarray(m.values),
        m.shape,
    )


def test_native_builds():
    # Not a hard requirement (numpy fallbacks exist), but the toolchain is in
    # the image, so the build should succeed here.
    assert native.available()


def test_row_indices(rng):
    offsets, indices, _, _ = _random_csr_np(rng, 64, 128, 800)
    out = native.row_indices(offsets)
    exp = np.searchsorted(offsets, np.arange(len(indices)), side="right") - 1
    np.testing.assert_array_equal(out, exp)


def test_transpose_metadata_matches_numpy(rng):
    offsets, indices, _, shape = _random_csr_np(rng, 96, 160, 1500)
    ot, it_, pos = native.transpose_metadata(offsets, indices, shape[1])
    rows = native.row_indices(offsets)
    order = np.argsort(indices, kind="stable")
    np.testing.assert_array_equal(pos, order)
    np.testing.assert_array_equal(it_, rows[order])
    counts = np.bincount(indices, minlength=shape[1])
    np.testing.assert_array_equal(ot, np.concatenate([[0], np.cumsum(counts)]))


def test_csr_to_bsr_densify_round_trip(rng):
    offsets, indices, values, shape = _random_csr_np(rng, 256, 384, 3000)
    bo, bi, data = native.csr_to_bsr(offsets, indices, values, shape, 128)
    # Densify the BSR and compare against the CSR densified.
    dense = np.zeros(shape, np.float32)
    rid = native.row_indices(offsets)
    dense[rid, indices] += values
    got = np.zeros(shape, np.float32)
    brow = native.row_indices(bo)
    for j in range(len(bi)):
        r, c = brow[j] * 128, bi[j] * 128
        got[r : r + 128, c : c + 128] = data[j]
    np.testing.assert_allclose(got, dense, atol=1e-6)
    # Block count sanity: every listed block contains at least one nonzero.
    assert len(bi) <= 3000


def test_sorted_row_swizzle(rng):
    offsets, *_ = _random_csr_np(rng, 128, 64, 900)
    order = native.sorted_row_swizzle(offsets)
    lens = offsets[1:] - offsets[:-1]
    assert (np.diff(lens[order]) <= 0).all()


def test_smtx_round_trip(tmp_path, rng):
    m = testing.random_csr(rng, 64, 96, 700)
    offsets = np.asarray(m.offsets)
    indices = np.asarray(m.indices)
    p = tmp_path / "test.smtx"
    with open(p, "w") as f:
        f.write(f"{64}, {96}, {len(indices)}\n")
        f.write(" ".join(map(str, offsets.tolist())) + "\n")
        f.write(" ".join(map(str, indices.tolist())) + "\n")
    shape, o2, i2 = native.read_smtx(str(p))
    assert shape == (64, 96)
    np.testing.assert_array_equal(o2, offsets)
    np.testing.assert_array_equal(i2, indices)


def test_dlmc_loaders(tmp_path, rng):
    m = testing.random_csr(rng, 200, 250, 2500)
    p = tmp_path / "weight.smtx"
    with open(p, "w") as f:
        f.write(f"200, 250, {m.nnz}\n")
        f.write(" ".join(map(str, np.asarray(m.offsets).tolist())) + "\n")
        f.write(" ".join(map(str, np.asarray(m.indices).tolist())) + "\n")
    csr = dlmc.load_smtx(str(p))
    assert csr.shape == (200, 250) and csr.nnz == m.nnz
    bsr = dlmc.load_smtx_bsr(str(p), 128)
    assert bsr.shape == (256, 256)  # padded to block multiple
    # Topology containment: every CSR nonzero lands in a BSR block.
    dense = np.asarray(bsr.to_dense())
    rid = np.asarray(csr.row_indices)
    cid = np.asarray(csr.indices)
    assert (np.asarray(dense[rid, cid]) != 0).mean() > 0.95  # random values


def test_synthetic_dlmc(rng):
    m = dlmc.synthetic_dlmc(rng, 512, 256, 0.9)
    assert m.shape == (512, 256)
    realized = m.nnz / (512 * 256)
    assert 0.05 < realized < 0.15


def test_pack_rows_native_matches_fallback(rng):
    """The C planner and the vectorized numpy fallback agree exactly
    (ragged rows, empty rows, non-dividing pack)."""
    from sputnik_tpu import native

    counts = rng.integers(0, 9, 64)
    counts[5] = 0
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    nnz = int(offsets[-1])
    indices = rng.integers(0, 40, nnz).astype(np.int32)
    for pack in (2, 3, 4, 8):
        got = native.pack_rows(offsets, indices, pack)
        # Force the numpy path by invoking the fallback logic directly:
        # re-derive with a broken lib handle via monkeypatched _load.
        import sputnik_tpu.native as nat
        orig = nat._load
        nat._load = lambda: None
        try:
            ref = nat.pack_rows(offsets, indices, pack)
        finally:
            nat._load = orig
        assert got[3] == ref[3]
        for g, r in zip(got[:3], ref[:3]):
            np.testing.assert_array_equal(g, r)
        # Invariant: every nonzero lands in a slot whose step's row is its own.
        rows, cols, src, n_steps = got
        if n_steps:
            row_of_slot = np.repeat(rows, pack)
            from sputnik_tpu.native import row_indices
            rid = row_indices(offsets)
            np.testing.assert_array_equal(row_of_slot[src], rid)
            np.testing.assert_array_equal(cols[src], indices)
