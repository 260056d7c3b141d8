"""int8 quantized SpMM: exact int32 accumulation vs the integer oracle.

The int32 MXU path is exact, so the only error vs the dequantized-operand
oracle is the final flush rounding — tested tight, unlike the float paths'
reference tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sputnik_tpu import ops
from sputnik_tpu.ops.quant import (
    matmul_dds_q8,
    matmul_dsd_q8,
    quantize,
    quantize_bsr,
)
from sputnik_tpu.utils import testing


def test_quantize_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32))
    q, scale = quantize(x)
    assert q.dtype == jnp.int8
    err = np.max(np.abs(np.asarray(q, np.float32) * scale - np.asarray(x)))
    assert err <= scale * 0.5 + 1e-7


@pytest.mark.parametrize("ta,tb", [(False, False), (True, True)])
def test_dsd_q8(rng, ta, tb):
    m, k, n = 512, 384, 256
    a_shape = (k, m) if ta else (m, k)
    b_shape = (n, k) if tb else (k, n)
    a = testing.random_bsr(rng, *a_shape, a_shape[0] * a_shape[1] // 3, 128)
    b = jnp.asarray(rng.standard_normal(b_shape).astype(np.float32))
    a_q, sa = quantize_bsr(a)
    b_q, sb = quantize(b)
    out = matmul_dsd_q8(a_q, b_q, scale_a=sa, scale_b=sb,
                        transpose_a=ta, transpose_b=tb,
                        out_dtype=jnp.float32)
    # Integer oracle: the dequantized int8 operands through fp64.
    deq_a = np.asarray(a.with_data(
        jnp.asarray(a_q.data, jnp.float32) * sa).to_dense())
    deq_b = np.asarray(b_q, np.float32) * sb
    expected = testing.dense_oracle_matmul(deq_a, deq_b, transpose_a=ta,
                                           transpose_b=tb)
    np.testing.assert_allclose(np.asarray(out, np.float32), expected,
                               rtol=1e-5, atol=1e-4)


def test_dds_q8(rng):
    m, k, n = 256, 384, 512
    b = testing.random_bsr(rng, k, n, k * n // 3, 128)
    a = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    b_q, sb = quantize_bsr(b)
    a_q, sa = quantize(a)
    out = matmul_dds_q8(a_q, b_q, scale_a=sa, scale_b=sb,
                        out_dtype=jnp.float32)
    deq_b = np.asarray(b.with_data(
        jnp.asarray(b_q.data, jnp.float32) * sb).to_dense())
    deq_a = np.asarray(a_q, np.float32) * sa
    expected = testing.dense_oracle_matmul(deq_a, deq_b)
    np.testing.assert_allclose(np.asarray(out, np.float32), expected,
                               rtol=1e-5, atol=1e-4)


def test_q8_rejects_float_operands(rng):
    a = testing.random_bsr(rng, 256, 256, 256 * 256 // 2, 128)
    b = jnp.ones((256, 128), jnp.float32)
    with pytest.raises(ValueError, match="int8"):
        matmul_dsd_q8(a, b, scale_a=1.0, scale_b=1.0)


def test_dsd_q8_bres_and_jit(rng):
    """int8 through the dense-resident kernel, and the whole quantized
    matmul under jit (serving shape)."""
    m, k, n = 512, 384, 256
    a = testing.random_bsr(rng, m, k, m * k // 3, 128)
    b = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    a_q, sa = quantize_bsr(a)
    b_q, sb = quantize(b)
    deq_a = np.asarray(a.with_data(
        jnp.asarray(a_q.data, jnp.float32) * sa).to_dense())
    deq_b = np.asarray(b_q, np.float32) * sb
    expected = testing.dense_oracle_matmul(deq_a, deq_b)
    out = matmul_dsd_q8(a_q, b_q, scale_a=sa, scale_b=sb, kernel="bres",
                        out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out, np.float32), expected,
                               rtol=1e-5, atol=1e-4)
    jitted = jax.jit(lambda aq, bq: matmul_dsd_q8(
        aq, bq, scale_a=sa, scale_b=sb, out_dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(jitted(a_q, b_q), np.float32),
                               expected, rtol=1e-5, atol=1e-4)


def test_dsd_q8_per_block_row_scales(rng):
    """Per-block-row scales keep SMALL rows accurate when row magnitudes
    are heterogeneous (a per-tensor scale crushes them to a few int8
    levels); dequant runs as the fused epilogue over exact int32."""
    m, k, n = 512, 384, 256
    a = testing.random_bsr(rng, m, k, m * k // 3, 128)
    row_gain = 10.0 ** rng.uniform(-2, 2, m // 128)
    a = a.with_data(
        a.data
        * jnp.asarray(row_gain, jnp.float32)[a.row_indices][:, None, None]
    )
    b = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    b_q, sb = quantize(b)
    deq_b = np.asarray(b_q, np.float32) * sb
    exact = testing.dense_oracle_matmul(np.asarray(a.to_dense()), deq_b)
    norms = np.linalg.norm(exact, axis=1) + 1e-30

    worst = {}
    for per in ("tensor", "block_row"):
        a_q, sa = quantize_bsr(a, per=per)
        out = np.asarray(
            matmul_dsd_q8(a_q, b_q, scale_a=sa, scale_b=sb,
                          out_dtype=jnp.float32), np.float32)
        worst[per] = float(
            (np.linalg.norm(out - exact, axis=1) / norms).max())
        # Exactness vs the dequantized-A oracle (int32 path is exact).
        sa_blocks = (
            sa if isinstance(sa, float)
            else jnp.asarray(sa, jnp.float32)[a_q.row_indices][:, None, None]
        )
        deq_a = np.asarray(
            a.with_data(jnp.asarray(a_q.data, jnp.float32) * sa_blocks)
            .to_dense())
        expected = testing.dense_oracle_matmul(deq_a, deq_b)
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-3)
    # The per-tensor scheme's worst row is catastrically coarse; per-row
    # keeps every row at ordinary int8 precision.
    assert worst["block_row"] < worst["tensor"] / 10, worst
