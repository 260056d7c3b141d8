"""SellMatrix (sliced-ELL) format + kernel tests.

The SELL engine is the CSR fast path: format roundtrip, SpMM/SDDMM vs the
fp64 oracle (awkward shapes included), sparse softmax equivalence with the
CSR path, the dense-mirror fast path, and the full SDDMM -> softmax -> SpMM
attention-score chain staying inside the format.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sputnik_tpu.formats import CsrMatrix, SellMatrix
from sputnik_tpu.ops import csr as csr_ops
from sputnik_tpu.utils import testing
from sputnik_tpu.utils.testing import ATOL

SHAPES = [
    (128, 128, 0.5),
    (256, 512, 0.1),
    (200, 300, 0.15),   # rows/cols not multiples of 128
    (512, 96, 0.3),     # cols < one chunk
    (384, 384, 0.02),   # very sparse
]


def _mk(rng, rows, cols, density, **kw):
    return testing.random_csr(rng, rows, cols, int(rows * cols * density), **kw)


@pytest.mark.parametrize("rows,cols,density", SHAPES)
def test_roundtrip(rng, rows, cols, density):
    c = _mk(rng, rows, cols, density)
    s = SellMatrix.from_csr(c)
    np.testing.assert_allclose(
        np.asarray(s.to_dense()), np.asarray(c.to_dense()), atol=1e-6
    )


@pytest.mark.parametrize("rows,cols,density", SHAPES)
@pytest.mark.parametrize("n", [64, 256, 100])
def test_spmm(rng, rows, cols, density, n):
    c = _mk(rng, rows, cols, density)
    s = SellMatrix.from_csr(c)
    b = jnp.asarray(rng.standard_normal((cols, n)).astype(np.float32))
    out = csr_ops.spmm(s, b)
    expected = testing.dense_oracle_matmul(np.asarray(c.to_dense()), np.asarray(b))
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=ATOL)


def test_spmm_auto_sell_for_concrete_csr(rng):
    c = _mk(rng, 256, 256, 0.1)
    b = jnp.asarray(rng.standard_normal((256, 64)).astype(np.float32))
    out = csr_ops.spmm(c, b)  # dispatches through SellMatrix.from_csr
    expected = testing.dense_oracle_matmul(np.asarray(c.to_dense()), np.asarray(b))
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=ATOL)


def test_spmm_dense_mirror(rng):
    c = _mk(rng, 256, 256, 0.1).with_dense_mirror()
    assert c.dense_mirror is not None
    b = jnp.asarray(rng.standard_normal((256, 64)).astype(np.float32))
    out = csr_ops.spmm(c, b)
    expected = testing.dense_oracle_matmul(np.asarray(c.to_dense()), np.asarray(b))
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=ATOL)
    # New values invalidate the mirror (it would be stale).
    c2 = c.with_values(c.values * 2)
    assert c2.dense_mirror is None


@pytest.mark.parametrize("rows,cols,density", SHAPES[:4])
@pytest.mark.parametrize("k", [64, 128])
def test_sddmm(rng, rows, cols, density, k):
    topo = SellMatrix.from_csr(_mk(rng, rows, cols, density))
    a = jnp.asarray(rng.standard_normal((rows, k)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((cols, k)).astype(np.float32))
    out = csr_ops.sddmm(a, b, topo)
    assert isinstance(out, SellMatrix)
    # Oracle: full scores masked by the topology pattern.
    scores = testing.dense_oracle_matmul(np.asarray(a), np.asarray(b), transpose_b=True)
    pattern = np.asarray(topo.to_dense()) != 0
    np.testing.assert_allclose(
        np.asarray(out.to_dense(), np.float32),
        scores * pattern,
        atol=ATOL,
    )
    # Padding slots stay exactly zero.
    assert np.all(np.asarray(out.values)[~np.asarray(out.valid_mask())] == 0)


def test_softmax_matches_csr_path(rng):
    c = _mk(rng, 256, 256, 0.1)
    s = SellMatrix.from_csr(c)
    out_sell = csr_ops.sparse_softmax(s, scale=0.5)
    out_csr = csr_ops.sparse_softmax(c, scale=0.5)
    np.testing.assert_allclose(
        np.asarray(out_sell.to_dense(), np.float32),
        np.asarray(out_csr.to_dense(), np.float32),
        atol=1e-5,
    )


def test_attention_chain_stays_in_sell(rng):
    """sddmm -> sparse softmax -> spmm, the Sputnik attention pipeline."""
    seq, dk = 256, 64
    topo = SellMatrix.from_csr(_mk(rng, seq, seq, 0.08))
    q = jnp.asarray(rng.standard_normal((seq, dk)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((seq, dk)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((seq, dk)).astype(np.float32))

    scores = csr_ops.sddmm(q, k, topo)
    probs = csr_ops.sparse_softmax(scores, scale=1.0 / np.sqrt(dk))
    out = csr_ops.spmm(probs, v)

    # Dense oracle with -inf masking.
    s = (np.asarray(q, np.float64) @ np.asarray(k, np.float64).T) / np.sqrt(dk)
    pattern = np.asarray(topo.to_dense()) != 0
    s = np.where(pattern, s, -np.inf)
    p = np.exp(s - s.max(1, keepdims=True))
    p = np.nan_to_num(p / np.maximum(p.sum(1, keepdims=True), 1e-30))
    expected = p @ np.asarray(v, np.float64)
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=ATOL)


def test_from_csr_inside_jit_raises(rng):
    c = _mk(rng, 128, 128, 0.5)

    @jax.jit
    def bad(c_):
        return SellMatrix.from_csr(c_).values

    with pytest.raises(ValueError, match="concrete"):
        bad(c)


def test_sell_is_pytree(rng):
    s = SellMatrix.from_csr(_mk(rng, 256, 256, 0.1))
    b = jnp.ones((256, 64), jnp.float32)

    @jax.jit
    def run(s_, b_):
        return csr_ops.spmm(s_, b_)

    out = run(s, b)
    expected = np.asarray(s.to_dense(), np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=ATOL)


@pytest.mark.parametrize("rows,cols,density", [(256, 512, 0.05), (200, 300, 0.15)])
def test_sorted_rows_roundtrip_and_ops(rng, rows, cols, density):
    """sort_rows=True: the SortedRowSwizzle at construction. All ops must be
    order-transparent (outputs in logical row order)."""
    c = _mk(rng, rows, cols, density)
    s = SellMatrix.from_csr(c, sort_rows=True)
    assert s.row_perm is not None and s.tile_widths is not None
    np.testing.assert_allclose(
        np.asarray(s.to_dense()), np.asarray(c.to_dense()), atol=1e-6
    )
    b = jnp.asarray(rng.standard_normal((cols, 64)).astype(np.float32))
    out = csr_ops.spmm(s, b)
    expected = testing.dense_oracle_matmul(np.asarray(c.to_dense()), np.asarray(b))
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=ATOL)

    a = jnp.asarray(rng.standard_normal((rows, 64)).astype(np.float32))
    bb = jnp.asarray(rng.standard_normal((cols, 64)).astype(np.float32))
    got = csr_ops.sddmm(a, bb, s)
    scores = testing.dense_oracle_matmul(np.asarray(a), np.asarray(bb), transpose_b=True)
    pattern = np.asarray(s.to_dense()) != 0
    np.testing.assert_allclose(
        np.asarray(got.to_dense(), np.float32), scores * pattern, atol=ATOL
    )


def test_sorted_rows_attention_chain(rng):
    seq, dk = 256, 64
    topo = SellMatrix.from_csr(_mk(rng, seq, seq, 0.08), sort_rows=True)
    q, k, v = (jnp.asarray(rng.standard_normal((seq, dk)).astype(np.float32)) for _ in range(3))
    scores = csr_ops.sddmm(q, k, topo)
    probs = csr_ops.sparse_softmax(scores, scale=1.0 / np.sqrt(dk))
    out = csr_ops.spmm(probs, v)
    # unsorted reference
    topo_u = SellMatrix.from_csr(_mk(np.random.default_rng(0), seq, seq, 0.08))
    del topo_u
    s = (np.asarray(q, np.float64) @ np.asarray(k, np.float64).T) / np.sqrt(dk)
    pattern = np.asarray(topo.to_dense()) != 0
    s = np.where(pattern, s, -np.inf)
    p = np.exp(s - s.max(1, keepdims=True))
    p = np.nan_to_num(p / np.maximum(p.sum(1, keepdims=True), 1e-30))
    expected = p @ np.asarray(v, np.float64)
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=ATOL)


def test_auto_chunk_and_variants(rng):
    """chunk="auto" narrows chunks at high sparsity; all spmm/sddmm
    variants agree with the oracle on both chunk widths."""
    dense_c = _mk(rng, 512, 512, 0.30)
    sparse_c = _mk(rng, 512, 512, 0.02)
    assert SellMatrix.from_csr(dense_c, chunk="auto").chunk == 128
    s = SellMatrix.from_csr(sparse_c, chunk="auto", sort_rows=True)
    assert s.chunk == 64
    b = jnp.asarray(rng.standard_normal((512, 64)).astype(np.float32))
    expected = testing.dense_oracle_matmul(np.asarray(sparse_c.to_dense()), np.asarray(b))
    from sputnik_tpu.kernels import sell as sell_kernels

    for kw in (dict(variant="chunked"), dict(variant="fused", row_tile=128)):
        out = sell_kernels.spmm(s, b, **kw)
        np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=ATOL)
    # sddmm variants on the chunk=64 topology
    q = jnp.asarray(rng.standard_normal((512, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((512, 64)).astype(np.float32))
    vals = {
        name: np.asarray(
            sell_kernels.sddmm(q, k, s, variant=name).to_dense(), np.float32
        )
        for name in ("fused", "chunked")
    }
    scores = np.asarray(q, np.float64) @ np.asarray(k, np.float64).T
    mask = np.asarray(sparse_c.to_dense()) != 0
    np.testing.assert_allclose(vals["fused"], scores * mask, atol=ATOL)
    np.testing.assert_allclose(vals["chunked"], scores * mask, atol=ATOL)


def test_sorted_rows_grads(rng):
    s = SellMatrix.from_csr(_mk(rng, 256, 256, 0.08), sort_rows=True)
    b = jnp.asarray(rng.standard_normal((256, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((256, 64)).astype(np.float32))
    gs, gb = jax.grad(
        lambda s_, b_: jnp.sum(csr_ops.spmm(s_, b_) * w), argnums=(0, 1),
        allow_int=True,
    )(s, b)
    dense = np.asarray(s.to_dense(), np.float64)
    np.testing.assert_allclose(
        np.asarray(gb, np.float32), dense.T @ np.asarray(w, np.float64), atol=ATOL
    )
    got_da = np.asarray(s.with_values(gs.values).to_dense(), np.float64)
    exp_da = (np.asarray(w, np.float64) @ np.asarray(b, np.float64).T) * (dense != 0)
    np.testing.assert_allclose(got_da, exp_da, atol=ATOL)


def test_softmax_pallas_variant_matches_jnp(rng):
    """The round-3 Pallas SELL softmax stays available as variant='pallas'
    (round-4 measured it LOSING to the jnp chain — 16.8 vs 6.6 us — so
    jnp is the default; this pins the kernel's correctness either way)."""
    c = testing.random_csr(rng, 384, 384, 6000)
    s = SellMatrix.from_csr(c)
    out_j = csr_ops.sparse_softmax(s, scale=0.5)
    out_p = csr_ops.sparse_softmax(s, scale=0.5, variant="pallas")
    np.testing.assert_allclose(
        np.asarray(out_p.values, np.float32),
        np.asarray(out_j.values, np.float32), atol=1e-5)


def test_softmax_counts_kernel_matches(rng):
    """The round-5 counts-masked Pallas softmax (mask from slot_counts,
    the int32 indices rectangle never streams) matches the jnp oracle;
    a matrix WITHOUT slot_counts (shard-local construction) falls back
    to the sentinel-mask kernel with identical results."""
    import dataclasses
    from sputnik_tpu.kernels import sell as sell_kernels

    c = testing.random_csr(rng, 384, 384, 6000)
    for sort_rows in (False, True):
        s = SellMatrix.from_csr(c, sort_rows=sort_rows)
        assert s.slot_counts is not None
        ref = csr_ops.sparse_softmax(s, scale=0.5)
        out_c = sell_kernels.sparse_softmax(s, scale=0.5)
        out_i = sell_kernels.sparse_softmax(
            dataclasses.replace(s, slot_counts=None), scale=0.5)
        for out in (out_c, out_i):
            np.testing.assert_allclose(
                np.asarray(out.values, np.float32),
                np.asarray(ref.values, np.float32), atol=1e-5)
