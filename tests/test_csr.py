"""CSR engine tests: SpMM / SDDMM / sparse softmax vs dense oracles,
mirroring the north-star configs (90-95% sparsity, n=64, k=64)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sputnik_tpu.ops import csr as csr_ops
from sputnik_tpu.utils import testing
from sputnik_tpu.utils.testing import ATOL


def test_spmm_90pct(rng):
    a = testing.random_csr(rng, 512, 512, int(512 * 512 * 0.1))
    b = jnp.asarray(rng.standard_normal((512, 64)).astype(np.float32))
    out = csr_ops.spmm(a, b)
    exp = np.asarray(a.to_dense()) @ np.asarray(b)
    np.testing.assert_allclose(np.asarray(out), exp, atol=ATOL)


def test_spmm_padded_rows(rng):
    a = testing.random_csr(rng, 128, 256, 2000, pad_rows_to=4)
    b = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32))
    out = csr_ops.spmm(a, b)
    exp = np.asarray(a.to_dense()) @ np.asarray(b)
    np.testing.assert_allclose(np.asarray(out), exp, atol=ATOL)


def test_spmm_transpose_b(rng):
    a = testing.random_csr(rng, 256, 128, 3000)
    b = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    out = csr_ops.spmm(a, b, transpose_b=True)
    exp = np.asarray(a.to_dense()) @ np.asarray(b).T
    np.testing.assert_allclose(np.asarray(out), exp, atol=ATOL)


def test_sddmm_95pct(rng):
    topo = testing.random_csr(rng, 1024, 1024, int(1024 * 1024 * 0.05))
    a = jnp.asarray(rng.standard_normal((1024, 64)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1024, 64)).astype(np.float32))
    out = csr_ops.sddmm(a, b, topo)  # transpose_b=True default
    full = np.asarray(a) @ np.asarray(b).T
    ridx = np.asarray(topo.row_indices)
    cidx = np.asarray(topo.indices)
    np.testing.assert_allclose(np.asarray(out.values), full[ridx, cidx], atol=ATOL)


def test_sparse_softmax(rng):
    a = testing.random_csr(rng, 128, 128, 2000)
    out = csr_ops.sparse_softmax(a)
    # Oracle: softmax over the nonzero entries per row.
    offs = np.asarray(a.offsets)
    vals = np.asarray(a.values)
    exp = np.zeros_like(vals)
    for r in range(a.rows):
        seg = vals[offs[r] : offs[r + 1]]
        if len(seg):
            e = np.exp(seg - seg.max())
            exp[offs[r] : offs[r + 1]] = e / e.sum()
    np.testing.assert_allclose(np.asarray(out.values), exp, atol=1e-5)


def test_sparse_softmax_scaled_rowsums(rng):
    a = testing.random_csr(rng, 64, 256, 1000)
    out = csr_ops.sparse_softmax(a, scale=0.125)
    dense = np.asarray(out.to_dense())
    sums = dense.sum(-1)
    nz = sums != 0
    np.testing.assert_allclose(sums[nz], 1.0, atol=1e-5)


def test_row_swizzle(rng):
    a = testing.random_csr(rng, 64, 128, 900)
    order = np.asarray(csr_ops.row_swizzle(a))
    offs = np.asarray(a.offsets)
    lens = offs[1:] - offs[:-1]
    assert (np.diff(lens[order]) <= 0).all()


def test_ell_round_trip(rng):
    a = testing.random_csr(rng, 64, 128, 800)
    offs = np.asarray(a.offsets)
    width = int((offs[1:] - offs[:-1]).max())
    vals, cols, valid = csr_ops.ell_from_csr(a, width)
    dense = np.zeros((64, 128), np.float32)
    v, c, m = np.asarray(vals), np.asarray(cols), np.asarray(valid)
    for r in range(64):
        for w in range(width):
            if m[r, w]:
                dense[r, c[r, w]] += v[r, w]
    np.testing.assert_allclose(dense, np.asarray(a.to_dense()), atol=1e-6)


# ---------------------------------------------------------------------------
# ELL fast paths
# ---------------------------------------------------------------------------


def test_ell_format_round_trip(rng):
    from sputnik_tpu.formats import EllMatrix

    m = testing.random_csr(rng, 96, 160, 1200)
    e = EllMatrix.from_csr(m)
    np.testing.assert_allclose(
        np.asarray(e.to_dense()), np.asarray(m.to_dense()), atol=1e-6
    )


def test_spmm_ell_matches_csr(rng):
    from sputnik_tpu.formats import EllMatrix

    m = testing.random_csr(rng, 256, 512, int(256 * 512 * 0.1))
    b = jnp.asarray(rng.standard_normal((512, 128)).astype(np.float32))
    e = EllMatrix.from_csr(m)
    out = csr_ops.spmm_ell(e, b)
    exp = np.asarray(m.to_dense()) @ np.asarray(b)
    np.testing.assert_allclose(np.asarray(out), exp, atol=ATOL)
    # spmm() auto-converts concrete CSR to the ELL path: same result.
    out2 = csr_ops.spmm(m, b)
    np.testing.assert_allclose(np.asarray(out2), exp, atol=ATOL)


def test_sddmm_ell(rng):
    from sputnik_tpu.formats import EllMatrix

    topo = testing.random_csr(rng, 256, 256, int(256 * 256 * 0.05))
    e = EllMatrix.from_csr(topo)
    a = jnp.asarray(rng.standard_normal((256, 64)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((256, 64)).astype(np.float32))
    out = csr_ops.sddmm(a, b, e)
    full = np.asarray(a) @ np.asarray(b).T
    np.testing.assert_allclose(
        np.asarray(out.to_dense()), full * (np.asarray(topo.to_dense()) != 0), atol=ATOL
    )


def test_sparse_softmax_ell(rng):
    from sputnik_tpu.formats import EllMatrix

    m = testing.random_csr(rng, 64, 256, 900)
    e = EllMatrix.from_csr(m)
    out = csr_ops.sparse_softmax(e)
    exp = np.asarray(csr_ops.sparse_softmax(m).to_dense())
    np.testing.assert_allclose(np.asarray(out.to_dense()), exp, atol=1e-5)
