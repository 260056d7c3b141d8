"""GPipe-style pipeline parallelism over the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from sputnik_tpu import models
from sputnik_tpu.parallel.pipeline import pipeline_apply, stack_stage_params


@pytest.fixture
def mesh():
    return Mesh(np.array(jax.devices()[:4]), ("pipe",))


def test_pipeline_matches_sequential_mlp(rng, mesh):
    """4 stages of a simple MLP layer == running the layers in sequence."""
    d, batch = 64, 8 * 32
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    per_stage = [
        {"w": jax.random.normal(k, (d, d)) * 0.1, "b": jnp.zeros((d,))}
        for k in keys
    ]

    def stage_fn(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    x = jnp.asarray(rng.standard_normal((batch, d)).astype(np.float32))
    out = pipeline_apply(
        stage_fn, stack_stage_params(per_stage), x, mesh, n_micro=8
    )
    ref = x
    for p in per_stage:
        ref = stage_fn(p, ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_grads(rng, mesh):
    d, batch = 64, 4 * 32
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    per_stage = [{"w": jax.random.normal(k, (d, d)) * 0.1} for k in keys]
    stacked = stack_stage_params(per_stage)

    def stage_fn(p, x):
        return jnp.tanh(x @ p["w"])

    x = jnp.asarray(rng.standard_normal((batch, d)).astype(np.float32))

    @jax.jit
    def loss(params, x_):
        return jnp.sum(pipeline_apply(stage_fn, params, x_, mesh, n_micro=4) ** 2)

    g = jax.grad(loss)(stacked, x)

    def ref_loss(params_list, x_):
        h = x_
        for p in params_list:
            h = stage_fn(p, h)
        return jnp.sum(h**2)

    g_ref = jax.grad(ref_loss)(per_stage, x)
    for s in range(4):
        np.testing.assert_allclose(
            np.asarray(g["w"][s]), np.asarray(g_ref[s]["w"]), atol=1e-4
        )


def test_pipeline_sparse_transformer_blocks(rng, mesh):
    """Pipeline the sparse transformer block itself: each stage is one
    block (attention + MoE) — the sparse kernels compose inside stages."""
    cfg = models.TransformerConfig(
        d_model=128, n_heads=2, seq_len=128, window_blocks=1,
        n_experts=2, d_ff=128, capacity=128, n_layers=4, vocab=64,
        dtype=jnp.float32,
    )
    topo, moe_topo = models.lm_topologies(cfg)
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    per_stage = [models.init_block_params(k, cfg) for k in keys]

    def stage_fn(p, x):
        y, _aux = models.block_forward(p, x, cfg, topo, moe_topo)
        return y

    # n_micro microbatches of one full sequence each: the block operates on
    # (seq_len, d) activations, so the microbatch IS the sequence.
    n_micro = 4
    x = jnp.asarray(
        rng.standard_normal((n_micro * cfg.seq_len, cfg.d_model)).astype(np.float32)
    )

    def micro_stage(p, xm):  # pipeline carries (seq_len, d) microbatches
        return stage_fn(p, xm)

    out = pipeline_apply(
        micro_stage, stack_stage_params(per_stage), x, mesh, n_micro=n_micro
    )
    ref = x.reshape(n_micro, cfg.seq_len, cfg.d_model)
    for p in per_stage:
        ref = jax.vmap(lambda xm, p_=p: stage_fn(p_, xm))(ref)
    np.testing.assert_allclose(
        np.asarray(out, np.float32),
        np.asarray(ref.reshape(-1, cfg.d_model), np.float32),
        atol=5e-2,
    )


def test_bad_micro_count_raises(rng, mesh):
    with pytest.raises(ValueError, match="divisible"):
        pipeline_apply(
            lambda p, x: x,
            stack_stage_params([{"w": jnp.zeros(())}] * 4),
            jnp.zeros((30, 8)),
            mesh,
            n_micro=4,
        )
