"""Gradient tests: custom VJPs vs dense-autodiff oracle.

The reference has no autodiff (MegaBlocks drives backward by hand with
transposed calls); here grads must agree with differentiating the densified
computation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sputnik_tpu import ops
from sputnik_tpu.formats import bsr_from_dense
from sputnik_tpu.kernels import reference
from sputnik_tpu.utils import testing

MODES = [(False, False), (False, True), (True, False), (True, True)]


def _mk(rng, rows, cols, density=0.5):
    """Pad-free random BSR via dense round trip (unique blocks)."""
    br, bc = rows // 128, cols // 128
    mask = rng.random((br, bc)) < density
    if not mask.any():
        mask[0, 0] = True
    x = rng.standard_normal((rows, cols)).astype(np.float32)
    x = x * np.repeat(np.repeat(mask, 128, 0), 128, 1)
    return bsr_from_dense(x, 128), x


@pytest.mark.parametrize("ta,tb", MODES)
def test_dsd_grads(rng, ta, tb):
    m, k, n = 256, 384, 256
    a_shape = (k, m) if ta else (m, k)
    b_shape = (n, k) if tb else (k, n)
    a, a_dense = _mk(rng, *a_shape)
    b = jnp.asarray(rng.standard_normal(b_shape).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))

    def loss(a_, b_):
        return jnp.sum(ops.dsd(a_, b_, transpose_a=ta, transpose_b=tb) * w)

    ga, gb = ops.grad(loss, argnums=(0, 1))(a, b)

    def loss_ref(ad, b_):
        lhs = ad.T if ta else ad
        rhs = b_.T if tb else b_
        return jnp.sum((lhs @ rhs) * w)

    gad, gbd = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(a_dense), b)
    expected_blocks = np.asarray(reference.extract_blocks(gad, a))
    np.testing.assert_allclose(np.asarray(ga.data), expected_blocks, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gbd), atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("ta,tb", MODES)
def test_dds_grads(rng, ta, tb):
    m, k, n = 256, 256, 384
    a_shape = (k, m) if ta else (m, k)
    b_shape = (n, k) if tb else (k, n)
    a = jnp.asarray(rng.standard_normal(a_shape).astype(np.float32))
    b, b_dense = _mk(rng, *b_shape)
    w = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))

    def loss(a_, b_):
        return jnp.sum(ops.dds(a_, b_, transpose_a=ta, transpose_b=tb) * w)

    ga, gb = ops.grad(loss, argnums=(0, 1))(a, b)

    def loss_ref(a_, bd):
        lhs = a_.T if ta else a_
        rhs = bd.T if tb else bd
        return jnp.sum((lhs @ rhs) * w)

    gad, gbd = jax.grad(loss_ref, argnums=(0, 1))(a, jnp.asarray(b_dense))
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gad), atol=1e-3, rtol=1e-3)
    expected_blocks = np.asarray(reference.extract_blocks(gbd, b))
    np.testing.assert_allclose(np.asarray(gb.data), expected_blocks, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("ta,tb", MODES[:2])
def test_sdd_grads(rng, ta, tb):
    m, k, n = 256, 256, 256
    a_shape = (k, m) if ta else (m, k)
    b_shape = (n, k) if tb else (k, n)
    a = jnp.asarray(rng.standard_normal(a_shape).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(b_shape).astype(np.float32))
    topo, topo_dense = _mk(rng, m, n)
    mask = jnp.asarray((topo_dense != 0).astype(np.float32))
    # Not elementwise: mask at block granularity (whole blocks present).
    wdata = jnp.asarray(
        rng.standard_normal((topo.nnz_blocks, 128, 128)).astype(np.float32)
    )

    def loss(a_, b_):
        out = ops.sdd(a_, b_, topo, transpose_a=ta, transpose_b=tb)
        return jnp.sum(out.data * wdata)

    ga, gb = ops.grad(loss, argnums=(0, 1))(a, b)

    w_dense = reference.dsd(topo.with_data(wdata), jnp.eye(n), out_dtype=jnp.float32)

    def loss_ref(a_, b_):
        lhs = a_.T if ta else a_
        rhs = b_.T if tb else b_
        return jnp.sum((lhs @ rhs) * w_dense)

    gad, gbd = jax.grad(loss_ref, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gad), atol=1e-2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gbd), atol=1e-2, rtol=1e-2)


def test_ssd_dss_grads(rng):
    m, k, n = 256, 256, 256
    a, a_dense = _mk(rng, m, k)
    b = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    topo, topo_dense = _mk(rng, m, n)
    wdata = jnp.asarray(
        rng.standard_normal((topo.nnz_blocks, 128, 128)).astype(np.float32)
    )

    def loss(a_, b_):
        out = ops.ssd(a_, b_, topo)
        return jnp.sum(out.data * wdata)

    ga, gb = ops.grad(loss, argnums=(0, 1))(a, b)

    w_dense = reference.dsd(topo.with_data(wdata), jnp.eye(n), out_dtype=jnp.float32)
    a_mask = jnp.asarray((a_dense != 0).astype(np.float32))

    def loss_ref(ad, b_):
        return jnp.sum((ad @ b_) * w_dense)

    gad, gbd = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(a_dense), b)
    expected = np.asarray(reference.extract_blocks(gad, a))
    np.testing.assert_allclose(np.asarray(ga.data), expected, atol=1e-2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gbd), atol=1e-2, rtol=1e-2)


@pytest.mark.parametrize("ta,tb", [(False, False), (True, True)])
def test_sss_grads(rng, ta, tb):
    """SSS closes under differentiation with itself: both operand grads are
    sparse-sparse products masked to the operand's own topology."""
    m, k, n = 256, 384, 256
    a_shape = (k, m) if ta else (m, k)
    b_shape = (n, k) if tb else (k, n)
    a, a_dense = _mk(rng, *a_shape)
    b, b_dense = _mk(rng, *b_shape)
    topo, _ = _mk(rng, m, n)
    wdata = jnp.asarray(
        rng.standard_normal((topo.nnz_blocks, 128, 128)).astype(np.float32)
    )

    def loss(a_, b_):
        out = ops.sss(a_, b_, topo, transpose_a=ta, transpose_b=tb)
        return jnp.sum(out.data * wdata)

    ga, gb = ops.grad(loss, argnums=(0, 1))(a, b)

    w_dense = reference.dsd(topo.with_data(wdata), jnp.eye(n),
                            out_dtype=jnp.float32)

    def loss_ref(ad, bd):
        lhs = ad.T if ta else ad
        rhs = bd.T if tb else bd
        return jnp.sum((lhs @ rhs) * w_dense)

    gad, gbd = jax.grad(loss_ref, argnums=(0, 1))(
        jnp.asarray(a_dense), jnp.asarray(b_dense)
    )
    np.testing.assert_allclose(
        np.asarray(ga.data), np.asarray(reference.extract_blocks(gad, a)),
        atol=1e-2, rtol=1e-2)
    np.testing.assert_allclose(
        np.asarray(gb.data), np.asarray(reference.extract_blocks(gbd, b)),
        atol=1e-2, rtol=1e-2)
