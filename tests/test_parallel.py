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


def test_expert_parallel_moe(rng):
    """EP MoE (all_to_all over 'expert') matches the per-token dense oracle."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from sputnik_tpu.models import moe as moe_lib
    from sputnik_tpu.models import moe_parallel

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "expert"))
    cfg = moe_lib.MoEConfig(
        d_model=128, d_ff=128, n_experts=8, capacity=512, dtype=jnp.float32
    )
    params = moe_parallel.reshape_params_for_mesh(
        moe_lib.init_moe_params(jax.random.PRNGKey(0), cfg), cfg
    )
    # EP layout: w1 (d, E, F) on 'expert' dim 1; w2 (E, F, d) on dim 0.
    params = {
        "router": jax.device_put(params["router"], NamedSharding(mesh, P())),
        "w1": jax.device_put(params["w1"], NamedSharding(mesh, P(None, "expert", None))),
        "w2": jax.device_put(params["w2"], NamedSharding(mesh, P("expert", None, None))),
    }
    x = jnp.asarray(rng.standard_normal((64, cfg.d_model)).astype(np.float32))
    x = jax.device_put(x, NamedSharding(mesh, P(("data", "expert"), None)))

    fwd = jax.jit(moe_parallel.make_ep_moe_forward(mesh, cfg))
    y = np.asarray(fwd(params, x), np.float32)

    # Oracle: per-token dense expert FFN (generous capacity -> no drops).
    router = np.asarray(params["router"])
    w1 = np.asarray(params["w1"], np.float32).reshape(cfg.d_model, -1)
    w2 = np.asarray(params["w2"], np.float32).reshape(-1, cfg.d_model)
    xs = np.asarray(x, np.float32)
    logits = xs @ router
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    expert = probs.argmax(-1)
    prob = probs.max(-1)
    exp = np.zeros_like(xs)
    for t in range(xs.shape[0]):
        e = expert[t]
        w1_e = w1[:, e * cfg.d_ff : (e + 1) * cfg.d_ff]
        w2_e = w2[e * cfg.d_ff : (e + 1) * cfg.d_ff, :]
        h = np.asarray(jax.nn.gelu(xs[t] @ w1_e))
        exp[t] = (h @ w2_e) * prob[t]
    np.testing.assert_allclose(y, exp, atol=5e-2, rtol=5e-2)


def test_banded_partition_round_trip(rng, mesh):
    m = testing.random_bsr(rng, 1024, 1024, 40 * 128 * 128, 128)
    bm = parallel.partition_bsr_rows_kbands(m, 8)
    assert bm.data.shape[:2] == (8, 8)
    # Stitch every (shard, band) cell back into the dense matrix.
    full = np.zeros((1024, 1024), np.float32)
    bs, kbb = 128, 1024 // 128 // 8
    for s in range(8):
        for j in range(8):
            d = np.asarray(bm.data[s, j])
            r = np.asarray(bm.row_indices[s, j])
            c = np.asarray(bm.indices[s, j])
            for blk, rr, cc in zip(d, r, c):
                full[(s + rr) * bs : (s + rr + 1) * bs,
                     (j * kbb + cc) * bs : (j * kbb + cc + 1) * bs] += blk
    np.testing.assert_allclose(full, np.asarray(m.to_dense()), atol=1e-6)


def test_sharded_dsd_ring_matches_single(rng, mesh):
    m = testing.random_bsr(rng, 1024, 1024, 40 * 128 * 128, 128)
    b = jnp.asarray(rng.standard_normal((1024, 256)).astype(np.float32))
    bm = parallel.partition_bsr_rows_kbands(m, 8)
    out = parallel.sharded_dsd_ring(bm, b, mesh)
    exp = testing.dense_oracle_matmul(np.asarray(m.to_dense()), np.asarray(b))
    np.testing.assert_allclose(np.asarray(out, np.float32), exp, atol=ATOL)
    # Same result under jit (traced metadata, dynamic band selection).
    outj = jax.jit(lambda a_, b_: parallel.sharded_dsd_ring(a_, b_, mesh))(bm, b)
    np.testing.assert_allclose(np.asarray(outj, np.float32), exp, atol=ATOL)


def test_sharded_dsd_ring_skewed_rows(rng, mesh):
    # Heavily skewed row occupancy: some (shard, band) cells are EMPTY,
    # exercising the padded inert-block path.
    dense = np.zeros((1024, 1024), np.float32)
    dense[:128, :] = rng.standard_normal((128, 1024))  # one full band row
    dense[512:640, :128] = rng.standard_normal((128, 128))
    from sputnik_tpu.formats import bsr_from_dense

    m = bsr_from_dense(dense, 128)
    b = jnp.asarray(rng.standard_normal((1024, 128)).astype(np.float32))
    bm = parallel.partition_bsr_rows_kbands(m, 8)
    out = parallel.sharded_dsd_ring(bm, b, mesh)
    exp = testing.dense_oracle_matmul(dense, np.asarray(b))
    np.testing.assert_allclose(np.asarray(out, np.float32), exp, atol=ATOL)


def test_sharded_dsd_ring_validation(rng, mesh):
    m = testing.random_bsr(rng, 1024, 1024, 10 * 128 * 128, 128)
    bm = parallel.partition_bsr_rows_kbands(m, 8)
    with pytest.raises(ValueError):  # contraction mismatch
        parallel.sharded_dsd_ring(bm, jnp.zeros((512, 64)), mesh)
    with pytest.raises(ValueError):  # wrong shard count for the mesh
        parallel.sharded_dsd_ring(
            parallel.partition_bsr_rows_kbands(m, 4), jnp.zeros((1024, 64)), mesh
        )
    with pytest.raises(ValueError):  # non-dividing K
        parallel.partition_bsr_rows_kbands(testing.random_bsr(rng, 1024, 640, 5 * 128 * 128, 128), 8)
