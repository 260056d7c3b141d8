"""Distributed layer tests on the virtual 8-device CPU mesh — the JAX-native
'fake backend' (SURVEY.md section 4's note on multi-host testing)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from sputnik_tpu import parallel
from sputnik_tpu.ops import csr as csr_ops
from sputnik_tpu.utils import testing
from sputnik_tpu.utils.testing import ATOL


@pytest.fixture
def mesh():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must force 8 CPU devices"
    return Mesh(np.array(devs[:8]), ("x",))


def test_partition_bsr_round_trip(rng, mesh):
    m = testing.random_bsr(rng, 1024, 512, 20 * 128 * 128, 128)
    sm = parallel.partition_bsr_rows(m, 8)
    # Stitch shards back and compare densified.
    full = np.zeros((1024, 512), np.float32)
    for s in range(8):
        local = np.asarray(sm.local_matrix(s).to_dense())
        full[s * 128 : (s + 1) * 128] = local
    np.testing.assert_allclose(full, np.asarray(m.to_dense()), atol=1e-6)


def test_sharded_dsd_matches_single(rng, mesh):
    m = testing.random_bsr(rng, 1024, 512, 30 * 128 * 128, 128)
    b = jnp.asarray(rng.standard_normal((512, 256)).astype(np.float32))
    sm = parallel.partition_bsr_rows(m, 8)
    out = parallel.sharded_dsd(sm, b, mesh)
    exp = testing.dense_oracle_matmul(np.asarray(m.to_dense()), np.asarray(b))
    np.testing.assert_allclose(np.asarray(out, np.float32), exp, atol=ATOL)


def test_sharded_dsd_allgather_k(rng, mesh):
    m = testing.random_bsr(rng, 1024, 1024, 40 * 128 * 128, 128)
    b = jnp.asarray(rng.standard_normal((1024, 256)).astype(np.float32))
    sm = parallel.partition_bsr_rows(m, 8)
    out = parallel.sharded_dsd(sm, b, mesh, b_sharded_k=True)
    exp = testing.dense_oracle_matmul(np.asarray(m.to_dense()), np.asarray(b))
    np.testing.assert_allclose(np.asarray(out, np.float32), exp, atol=ATOL)


def test_sharded_sdd_matches_single(rng, mesh):
    topo = testing.random_bsr(rng, 1024, 512, 25 * 128 * 128, 128)
    a = jnp.asarray(rng.standard_normal((1024, 256)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((256, 512)).astype(np.float32))
    st = parallel.partition_bsr_rows(topo, 8)
    out = parallel.sharded_sdd(a, b, st, mesh)
    full = testing.dense_oracle_matmul(np.asarray(a), np.asarray(b))
    # Compare per shard against extracted blocks.
    for s in range(8):
        local = st.local_matrix(s)
        lo = s * 128
        from sputnik_tpu.kernels import reference

        expected = np.asarray(
            reference.extract_blocks(
                jnp.asarray(full[lo : lo + 128].astype(np.float32)), local
            )
        )
        np.testing.assert_allclose(np.asarray(out.data[s]), expected, atol=ATOL)


def test_sharded_csr_spmm(rng, mesh):
    m = testing.random_csr(rng, 1024, 512, int(1024 * 512 * 0.05))
    b = jnp.asarray(rng.standard_normal((512, 64)).astype(np.float32))
    sm = parallel.partition_csr_rows(m, 8)
    out = parallel.sharded_spmm(sm, b, mesh)
    exp = np.asarray(m.to_dense()) @ np.asarray(b)
    np.testing.assert_allclose(np.asarray(out), exp, atol=ATOL)
