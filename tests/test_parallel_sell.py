"""Sharded SELL SpMM (row- and contraction-partitioned) + sequence-parallel
block-sparse attention, on the 8-device CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sputnik_tpu import parallel
from sputnik_tpu.models import attention as attn
from sputnik_tpu.utils import testing
from sputnik_tpu.utils.testing import ATOL


@pytest.fixture
def mesh():
    devs = np.array(jax.devices()[:4])
    return Mesh(devs, ("x",))


def test_sharded_spmm_sell_rows(rng, mesh):
    rows, cols, n = 4 * 256, 512, 64
    c = testing.random_csr(rng, rows, cols, int(rows * cols * 0.1))
    sharded = parallel.partition_sell_rows(c, 4)
    b = jnp.asarray(rng.standard_normal((cols, n)).astype(np.float32))
    out = parallel.sharded_spmm_sell(sharded, b, mesh)
    expected = testing.dense_oracle_matmul(np.asarray(c.to_dense()), np.asarray(b))
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=ATOL)


def test_sharded_spmm_sell_kshard_b(rng, mesh):
    rows, cols, n = 4 * 256, 4 * 128, 64
    c = testing.random_csr(rng, rows, cols, int(rows * cols * 0.1))
    sharded = parallel.partition_sell_rows(c, 4)
    b = jnp.asarray(rng.standard_normal((cols, n)).astype(np.float32))
    out = parallel.sharded_spmm_sell(sharded, b, mesh, b_sharded_k=True)
    expected = testing.dense_oracle_matmul(np.asarray(c.to_dense()), np.asarray(b))
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=ATOL)


def test_sharded_spmm_kshard_reduce_scatter(rng, mesh):
    rows, cols, n = 4 * 128, 4 * 256, 64
    c = testing.random_csr(rng, rows, cols, int(rows * cols * 0.1))
    sharded = parallel.partition_sell_cols(c, 4)
    assert sharded.partition == "cols"
    b = jnp.asarray(rng.standard_normal((cols, n)).astype(np.float32))
    out = parallel.sharded_spmm_kshard(sharded, b, mesh, out_dtype=jnp.float32)
    expected = testing.dense_oracle_matmul(np.asarray(c.to_dense()), np.asarray(b))
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=ATOL)


def test_partition_sell_cols_misaligned_raises(rng):
    c = testing.random_csr(rng, 256, 300, 1000)
    with pytest.raises(ValueError, match="divisible"):
        parallel.partition_sell_cols(c, 4)


@pytest.mark.parametrize("kv_replicated", [True, False])
def test_sharded_attention(rng, mesh, kv_replicated):
    seq, dh = 4 * 256, 64
    topo = attn.band_topology(seq, 3, 128)
    sharded_topo = parallel.partition_topology_rows(topo, 4)
    q = jnp.asarray(rng.standard_normal((seq, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((seq, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((seq, dh)).astype(np.float32))

    out = parallel.sharded_block_sparse_attention(
        q, k, v, sharded_topo, mesh, kv_replicated=kv_replicated
    )
    expected = attn.block_sparse_attention(q, k, v, topo)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expected, np.float32), atol=ATOL
    )
    # The unfused local chain (the verified round-1 path) must agree.
    out_u = parallel.sharded_block_sparse_attention(
        q, k, v, sharded_topo, mesh, kv_replicated=kv_replicated, fused=False
    )
    np.testing.assert_allclose(
        np.asarray(out_u, np.float32), np.asarray(expected, np.float32),
        atol=ATOL,
    )


def test_sharded_attention_causal(rng, mesh):
    seq, dh = 4 * 256, 64
    topo = attn.causal_block_topology(seq, block_size=128, window_blocks=3)
    sharded_topo = parallel.partition_topology_rows(topo, 4)
    q = jnp.asarray(rng.standard_normal((seq, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((seq, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((seq, dh)).astype(np.float32))

    out = parallel.sharded_block_sparse_attention(
        q, k, v, sharded_topo, mesh, causal=True
    )
    expected = attn.block_sparse_attention(q, k, v, topo, causal=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expected, np.float32), atol=ATOL
    )


def test_sharded_attention_under_jit(rng, mesh):
    seq, dh = 4 * 128, 64
    topo = attn.band_topology(seq, 2, 128)
    sharded_topo = parallel.partition_topology_rows(topo, 4)
    q = jnp.asarray(rng.standard_normal((seq, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((seq, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((seq, dh)).astype(np.float32))

    @jax.jit
    def run(q_, k_, v_, t_):
        return parallel.sharded_block_sparse_attention(q_, k_, v_, t_, mesh)

    out = run(q, k, v, sharded_topo)
    expected = attn.block_sparse_attention(q, k, v, topo)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expected, np.float32), atol=ATOL
    )
