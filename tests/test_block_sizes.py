"""Non-128 block sizes + packed bitmask parity tests.

The reference reserves BlockSize {16, 32, 64, 128} but wires only 128
(``arguments.h:13-19``); here every size constructs, round-trips, and
computes correctly — sizes that are not multiples of 128 dispatch to the
XLA fallback variant via the registry's ``can_implement`` gate, the same
position the reference's 128-only gate occupies.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sputnik_tpu import ops
from sputnik_tpu.formats import block_bitmask, bsr_from_dense
from sputnik_tpu.utils import testing
from sputnik_tpu.utils.testing import ATOL


@pytest.mark.parametrize("bs", [16, 32, 64])
def test_small_block_matmuls(rng, bs):
    m = k = n = 4 * bs
    a = testing.random_bsr(rng, m, k, m * k // 2, bs)
    b = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    topo = testing.random_bsr(rng, m, n, m * n // 2, bs)

    expected = testing.dense_oracle_matmul(np.asarray(a.to_dense()), np.asarray(b))
    out = ops.matmul_dsd(a, b)
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=ATOL)

    out_s = ops.matmul_ssd(a, b, topo)
    from sputnik_tpu.kernels import reference
    exp_s = np.asarray(
        reference.extract_blocks(jnp.asarray(expected.astype(np.float32)), topo)
    )
    np.testing.assert_allclose(np.asarray(out_s.data, np.float32), exp_s, atol=ATOL)


@pytest.mark.parametrize("bs", [16, 64])
def test_small_block_roundtrip_and_transpose(rng, bs):
    d = 6 * bs
    dense = rng.standard_normal((d, d)).astype(np.float32)
    mask = rng.random((d // bs, d // bs)) < 0.5
    dense *= np.repeat(np.repeat(mask, bs, 0), bs, 1)
    m = bsr_from_dense(dense, bs)
    assert m.block_size == bs
    np.testing.assert_allclose(np.asarray(m.to_dense()), dense, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.transpose().to_dense()), dense.T, atol=1e-6)


def test_small_blocks_use_fallback_variant(rng):
    """The registry's Pallas gate rejects non-128 blocks; dispatch lands on
    the jnp fallback (reference: block_size == k128 gate, dsd.cu:13)."""
    from sputnik_tpu.ops.matmul import _dsd_can

    a = testing.random_bsr(rng, 128, 128, 128 * 128, 64)
    b = jnp.ones((128, 64 * 2), jnp.float32)
    assert not _dsd_can(a, b)
    out = ops.matmul_dsd(a, b)  # still computes via fallback
    assert out.shape == (128, 128)


def test_block_bitmask_layout(rng):
    m = testing.random_bsr(rng, 10 * 128, 40 * 128, 10 * 40 * 128 * 128 // 4, 128)
    mask = np.asarray(
        block_bitmask(m.offsets, m.indices, m.block_rows, m.block_cols)
    )
    assert mask.shape == (10, 2) and mask.dtype == np.uint32
    pos = np.asarray(m.position_map())
    for r in range(10):
        for c in range(40):
            bit = (mask[r, c // 32] >> (c % 32)) & 1
            assert bool(bit) == (pos[r, c] >= 0)


def test_bitmask_and_is_dss_intersection(rng):
    a = testing.random_bsr(rng, 512, 512, 512 * 512 // 4, 128)
    b = testing.random_bsr(rng, 512, 512, 512 * 512 // 4, 128)
    ma = np.asarray(block_bitmask(a.offsets, a.indices, a.block_rows, a.block_cols))
    # b iterated k-major (its rows ARE the contraction dim already).
    mb = np.asarray(block_bitmask(b.offsets, b.indices, b.block_rows, b.block_cols))
    sched = ops.plan_dss(a, b)
    # Count of work items per (m, n) tile == popcount(row_a AND col_b).
    pa = np.asarray(a.position_map()) >= 0
    pb = np.asarray(b.position_map()) >= 0
    expected_items = int((pa.astype(np.int64) @ pb.astype(np.int64)).sum())
    assert sched.total == expected_items
    del ma, mb


@pytest.mark.parametrize("bs", [16, 32, 64])
@pytest.mark.parametrize("tb", [False, True])
def test_smallblock_packed_dsd(rng, bs, tb):
    """bs in {16, 32, 64} now dispatches to the PACKED sparse-saving kernel
    (pack = 128/bs blocks per MXU dot) instead of densifying — the
    capability the reference reserved via BlockSize but never wired."""
    from sputnik_tpu.ops import registry

    m = k = n = 512
    a = testing.random_bsr(rng, m, k, m * k // 3, bs)
    b_kn = rng.standard_normal((k, n)).astype(np.float32)
    b = jnp.asarray(b_kn.T.copy() if tb else b_kn)
    assert any(
        v.name == "pallas_smallblock"
        and v.can_implement(a, b, transpose_b=tb)
        for v in registry.variants_for("dsd")
    )
    out = ops.matmul_dsd(a, b, transpose_b=tb)
    expected = testing.dense_oracle_matmul(np.asarray(a.to_dense()), b_kn)
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=ATOL)


@pytest.mark.parametrize("bs", [32, 64])
@pytest.mark.parametrize("ta,tb", [(False, False), (True, False),
                                   (False, True), (True, True)])
def test_smallblock_dsd_all_modes(rng, bs, ta, tb):
    """Round-3: transposed small-block streams ride the transpose metadata
    (dot dims, never data movement) — all four modes."""
    m, k, n = 384, 256, 512
    a_shape = (k, m) if ta else (m, k)
    a = testing.random_bsr(rng, *a_shape, a_shape[0] * a_shape[1] // 3, bs)
    b_kn = rng.standard_normal((k, n)).astype(np.float32)
    b = jnp.asarray(b_kn.T.copy() if tb else b_kn)
    out = ops.matmul_dsd(a, b, transpose_a=ta, transpose_b=tb,
                         variant="pallas_smallblock")
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), b_kn, transpose_a=ta
    )
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=ATOL)


@pytest.mark.parametrize("bs", [32, 64])
@pytest.mark.parametrize("ta,tb", [(False, False), (True, False),
                                   (False, True), (True, True)])
def test_smallblock_dds_all_modes(rng, bs, ta, tb):
    """Small-block DDS through the operand-swap mirror."""
    m, k, n = 512, 256, 384
    b_shape = (n, k) if tb else (k, n)
    bsp = testing.random_bsr(rng, *b_shape, b_shape[0] * b_shape[1] // 3, bs)
    a_mk = rng.standard_normal((m, k)).astype(np.float32)
    a = jnp.asarray(a_mk.T.copy() if ta else a_mk)
    out = ops.matmul_dds(a, bsp, transpose_a=ta, transpose_b=tb,
                         variant="pallas_smallblock")
    expected = testing.dense_oracle_matmul(
        a_mk, np.asarray(bsp.to_dense()), transpose_b=tb
    )
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=ATOL)


@pytest.mark.parametrize("bs", [16, 64])
@pytest.mark.parametrize("ta,tb", [(False, False), (True, False),
                                   (False, True), (True, True)])
def test_smallblock_sdd_all_modes(rng, bs, ta, tb):
    """Native packed small-block SDD (SDDMM): compute = exactly the
    nonzero output blocks, pack blocks per MXU dot."""
    from sputnik_tpu.kernels import reference as ref_kernels

    m, k, n = 384, 256, 512
    topo = testing.random_bsr(rng, m, n, m * n // 3, bs)
    a_mk = rng.standard_normal((m, k)).astype(np.float32)
    b_kn = rng.standard_normal((k, n)).astype(np.float32)
    a = jnp.asarray(a_mk.T.copy() if ta else a_mk)
    b = jnp.asarray(b_kn.T.copy() if tb else b_kn)
    out = ops.matmul_sdd(a, b, topo, transpose_a=ta, transpose_b=tb,
                         variant="pallas_smallblock")
    full = testing.dense_oracle_matmul(a_mk, b_kn)
    expected = np.asarray(
        ref_kernels.extract_blocks(jnp.asarray(full.astype(np.float32)), topo)
    )
    np.testing.assert_allclose(np.asarray(out.data, np.float32), expected,
                               atol=ATOL)


def test_smallblock_unordered_and_ragged(rng):
    """Unordered column ids and rows whose nnz is not a multiple of the
    pack width exercise the zero-block padding path."""
    bs = 64
    ones = np.ones((bs, bs), np.float32)
    # row 0: 3 blocks (ragged vs pack=2), unordered columns; row 5: 1 block.
    a = testing.bsr_from_blocks(
        8 * bs, 8 * bs, [0, 0, 0, 5], [6, 1, 3, 2],
        np.stack([ones, 2 * ones, 3 * ones, 4 * ones]),
    )
    b = jnp.asarray(rng.standard_normal((8 * bs, 128)).astype(np.float32))
    out = ops.matmul_dsd(a, b, variant="pallas_smallblock")
    expected = testing.dense_oracle_matmul(np.asarray(a.to_dense()), np.asarray(b))
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=ATOL)


@pytest.mark.parametrize("bs", [32, 64])
@pytest.mark.parametrize("ta,tb", [(False, False), (True, False),
                                   (False, True), (True, True)])
def test_smallblock_ssd_all_modes(rng, bs, ta, tb):
    """Small-block SSD: packed sparse-saving DSD + block extract — the
    reserved-enum sizes now cover the sparse-output ops too."""
    from sputnik_tpu.kernels import reference as ref_kernels
    from sputnik_tpu.ops import registry

    m, k, n = 384, 256, 512
    a_shape = (k, m) if ta else (m, k)
    a = testing.random_bsr(rng, *a_shape, a_shape[0] * a_shape[1] // 3, bs)
    topo = testing.random_bsr(rng, m, n, m * n // 3, bs)
    b_kn = rng.standard_normal((k, n)).astype(np.float32)
    b = jnp.asarray(b_kn.T.copy() if tb else b_kn)
    assert registry.dispatch_name(
        "ssd", a, b, topo, transpose_a=ta, transpose_b=tb
    ) == "pallas_smallblock"
    out = ops.matmul_ssd(a, b, topo, transpose_a=ta, transpose_b=tb)
    full = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), b_kn, transpose_a=ta
    )
    expected = np.asarray(
        ref_kernels.extract_blocks(jnp.asarray(full.astype(np.float32)), topo)
    )
    np.testing.assert_allclose(np.asarray(out.data, np.float32), expected,
                               atol=ATOL)


@pytest.mark.parametrize("bs", [32, 64])
@pytest.mark.parametrize("ta,tb", [(False, False), (False, True)])
def test_smallblock_sds_modes(rng, bs, ta, tb):
    """Small-block SDS via the packed DDS mirror + block extract."""
    from sputnik_tpu.kernels import reference as ref_kernels
    from sputnik_tpu.ops import registry

    m, k, n = 512, 256, 384
    b_shape = (n, k) if tb else (k, n)
    bsp = testing.random_bsr(rng, *b_shape, b_shape[0] * b_shape[1] // 3, bs)
    topo = testing.random_bsr(rng, m, n, m * n // 3, bs)
    a_mk = rng.standard_normal((m, k)).astype(np.float32)
    a = jnp.asarray(a_mk.T.copy() if ta else a_mk)
    assert registry.dispatch_name(
        "sds", a, bsp, topo, transpose_a=ta, transpose_b=tb
    ) == "pallas_smallblock"
    out = ops.matmul_sds(a, bsp, topo, transpose_a=ta, transpose_b=tb)
    full = testing.dense_oracle_matmul(
        a_mk, np.asarray(bsp.to_dense()), transpose_b=tb
    )
    expected = np.asarray(
        ref_kernels.extract_blocks(jnp.asarray(full.astype(np.float32)), topo)
    )
    np.testing.assert_allclose(np.asarray(out.data, np.float32), expected,
                               atol=ATOL)


@pytest.mark.parametrize("bs", [32, 64])
@pytest.mark.parametrize("denser_side", ["a", "b"])
def test_smallblock_dss(rng, bs, denser_side):
    """Small-block DSS: the smaller side densifies, the denser side keeps
    its packed sparse-saving kernel (static nnz-based side choice)."""
    from sputnik_tpu.ops import registry

    m, k, n = 384, 256, 512
    na = m * k // (6 if denser_side == "b" else 2)
    nb = k * n // (6 if denser_side == "a" else 2)
    a = testing.random_bsr(rng, m, k, na, bs)
    b = testing.random_bsr(rng, k, n, nb, bs)
    assert registry.dispatch_name("dss", a, b) == "pallas_smallblock"
    out = ops.matmul_dss(a, b)
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b.to_dense())
    )
    np.testing.assert_allclose(np.asarray(out, np.float32), expected,
                               atol=ATOL)
