"""GPipe-style pipeline parallelism over the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from sputnik_tpu import models
from sputnik_tpu.parallel.pipeline import (
    pipeline_apply,
    pipeline_train_step,
    simulate_1f1b,
    stack_stage_params,
)


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


@pytest.mark.parametrize("S,M", [(4, 4), (4, 8), (2, 6), (8, 8)])
def test_1f1b_schedule_valid(S, M):
    """The precomputed tables satisfy 1F1B's invariants: dependency order,
    one fwd + one bwd max per (slot, stage), in-flight <= S - s, and every
    microbatch completes both passes everywhere."""
    ftab, btab = simulate_1f1b(S, M)
    T = ftab.shape[0]
    for s in range(S):
        f_times = {int(ftab[t, s]): t for t in range(T) if ftab[t, s] >= 0}
        b_times = {int(btab[t, s]): t for t in range(T) if btab[t, s] >= 0}
        assert set(f_times) == set(range(M))
        assert set(b_times) == set(range(M))
        # forwards/backwards in microbatch order
        assert sorted(f_times, key=f_times.get) == list(range(M))
        assert sorted(b_times, key=b_times.get) == list(range(M))
        inflight = 0
        for t in range(T):
            if btab[t, s] >= 0:
                inflight -= 1
            if ftab[t, s] >= 0:
                inflight += 1
            assert inflight <= S - s  # the 1F1B memory cap
        if s > 0:
            up = {int(ftab[t, s - 1]): t for t in range(T) if ftab[t, s - 1] >= 0}
            for m, t in f_times.items():
                assert up[m] < t  # activation arrived strictly earlier
        if s < S - 1:
            down = {int(btab[t, s + 1]): t for t in range(T) if btab[t, s + 1] >= 0}
            for m, t in b_times.items():
                assert down[m] < t
        last_b = {int(btab[t, S - 1]): t for t in range(T) if btab[t, S - 1] >= 0}
        last_f = {int(ftab[t, S - 1]): t for t in range(T) if ftab[t, S - 1] >= 0}
        for m in range(M):
            assert last_f[m] < last_b[m]


@pytest.mark.parametrize("n_micro", [4, 8])
def test_1f1b_train_step_matches_reference(rng, mesh, n_micro):
    """1F1B loss and stage grads == autodiff of the sequential model."""
    d, micro = 32, 16
    batch = n_micro * micro
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    per_stage = [
        {"w": jax.random.normal(k, (d, d)) * 0.3, "b": jnp.zeros((d,))}
        for k in keys
    ]
    stacked = stack_stage_params(per_stage)

    def stage_fn(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    def loss_fn(y, tgt):
        return jnp.mean((y - tgt) ** 2)

    x = jnp.asarray(rng.standard_normal((batch, d)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((batch, d)).astype(np.float32))

    loss, grads = jax.jit(
        lambda p, x_, t_: pipeline_train_step(
            stage_fn, loss_fn, p, x_, t_, mesh, n_micro=n_micro
        )
    )(stacked, x, tgt)

    def ref(params_list, x_, t_):
        h = x_.reshape(n_micro, micro, d)
        for p in params_list:
            h = jax.vmap(lambda xm, p_=p: stage_fn(p_, xm))(h)
        per_micro = jax.vmap(loss_fn)(h, t_.reshape(n_micro, micro, d))
        return jnp.mean(per_micro)

    ref_loss, ref_grads = jax.value_and_grad(ref)(per_stage, x, tgt)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for s in range(4):
        for k in ("w", "b"):
            np.testing.assert_allclose(
                np.asarray(grads[k][s]), np.asarray(ref_grads[s][k]),
                atol=1e-4,
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
