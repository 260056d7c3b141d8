"""Autodiff through the SELL CSR engine (Pallas kernels need custom VJPs).

Gradients checked against jax.grad of the dense reference computation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sputnik_tpu.formats import SellMatrix
from sputnik_tpu.kernels import sell as sell_kernels
from sputnik_tpu.ops import csr as csr_ops
from sputnik_tpu.utils import testing


def _mk(rng, rows, cols, density):
    return SellMatrix.from_csr(
        testing.random_csr(rng, rows, cols, int(rows * cols * density))
    )


def test_spmm_t_matches_oracle(rng):
    s = _mk(rng, 200, 300, 0.1)
    x = jnp.asarray(rng.standard_normal((200, 64)).astype(np.float32))
    out = sell_kernels.spmm_t(s, x)
    expected = np.asarray(s.to_dense(), np.float64).T @ np.asarray(x, np.float64)
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=testing.ATOL)


def test_spmm_grads(rng):
    s = _mk(rng, 256, 256, 0.1)
    b = jnp.asarray(rng.standard_normal((256, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((256, 64)).astype(np.float32))

    def loss(s_, b_):
        return jnp.sum(csr_ops.spmm(s_, b_) * w)

    gs, gb = jax.grad(loss, argnums=(0, 1), allow_int=True)(s, b)

    dense = np.asarray(s.to_dense(), np.float64)
    # dB = A^T @ W;  dA values = (W @ B^T) at A's pattern.
    exp_db = dense.T @ np.asarray(w, np.float64)
    np.testing.assert_allclose(np.asarray(gb, np.float32), exp_db, atol=testing.ATOL)

    exp_da_dense = np.asarray(w, np.float64) @ np.asarray(b, np.float64).T
    got_da_dense = np.asarray(s.with_values(gs.values).to_dense(), np.float64)
    pattern = (dense != 0).astype(np.float64)
    np.testing.assert_allclose(
        got_da_dense, exp_da_dense * pattern, atol=testing.ATOL
    )


def test_sddmm_grads(rng):
    topo = _mk(rng, 256, 200, 0.08)
    a = jnp.asarray(rng.standard_normal((256, 64)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((200, 64)).astype(np.float32))

    def loss(a_, b_):
        out = csr_ops.sddmm(a_, b_, topo)
        return jnp.sum(out.values**2)

    ga, gb = jax.grad(loss, argnums=(0, 1))(a, b)

    def dense_loss(a_, b_):
        scores = a_ @ b_.T
        pattern = jnp.asarray(np.asarray(topo.to_dense()) != 0, jnp.float32)
        return jnp.sum((scores * pattern) ** 2)

    ega, egb = jax.grad(dense_loss, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ega), atol=testing.ATOL)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(egb), atol=testing.ATOL)


def test_attention_chain_grads(rng):
    """End-to-end gradient through sddmm -> softmax -> spmm."""
    seq, dk = 256, 64
    topo = _mk(rng, seq, seq, 0.08)
    q = jnp.asarray(rng.standard_normal((seq, dk)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((seq, dk)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((seq, dk)).astype(np.float32))

    def loss(q_, k_, v_):
        scores = csr_ops.sddmm(q_, k_, topo)
        probs = csr_ops.sparse_softmax(scores, scale=1.0 / np.sqrt(dk))
        return jnp.sum(csr_ops.spmm(probs, v_) ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    pattern = jnp.asarray(np.asarray(topo.to_dense()) != 0)

    def dense_loss(q_, k_, v_):
        s = (q_ @ k_.T) / np.sqrt(dk)
        s = jnp.where(pattern, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        p = jnp.where(jnp.isnan(p), 0.0, p)
        return jnp.sum((p @ v_) ** 2)

    eq, ek, ev = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(eq), atol=testing.ATOL)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(ek), atol=testing.ATOL)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ev), atol=testing.ATOL)
