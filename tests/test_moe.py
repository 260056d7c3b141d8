"""MoE model tests: forward vs per-expert dense oracle, and a training step
through the custom-VJP sparse backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sputnik_tpu import models


@pytest.fixture
def cfg():
    return models.MoEConfig(
        d_model=128, d_ff=128, n_experts=4, capacity=128, dtype=jnp.float32
    )


def _dense_oracle(params, x, cfg):
    """Per-expert dense FFN, same routing math."""
    logits = np.asarray(x, np.float32) @ np.asarray(params["router"])
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    expert = probs.argmax(-1)
    prob = probs.max(-1)
    w1 = np.asarray(params["w1"], np.float32)
    w2 = np.asarray(params["w2"], np.float32)
    counts = np.zeros(cfg.n_experts, np.int64)
    y = np.zeros((x.shape[0], cfg.d_model), np.float32)
    for t in range(x.shape[0]):
        e = expert[t]
        if counts[e] >= cfg.capacity:
            continue  # dropped
        counts[e] += 1
        w1_e = w1[:, e * cfg.d_ff : (e + 1) * cfg.d_ff]
        w2_e = w2[e * cfg.d_ff : (e + 1) * cfg.d_ff, :]
        h = np.asarray(jax.nn.gelu(np.asarray(x, np.float32)[t] @ w1_e))
        y[t] = (h @ w2_e) * prob[t]
    return y


@pytest.mark.parametrize("impl", ["grouped", "bsr"])
def test_moe_forward_matches_dense(rng, cfg, impl):
    key = jax.random.PRNGKey(0)
    params = models.init_moe_params(key, cfg)
    topo = models.block_diag_topology(cfg)
    x = jnp.asarray(rng.standard_normal((96, cfg.d_model)).astype(np.float32))
    y, aux = models.moe_forward(params, x, cfg, topo, impl=impl)
    exp = _dense_oracle(params, x, cfg)
    np.testing.assert_allclose(np.asarray(y, np.float32), exp, atol=5e-2, rtol=5e-2)
    assert float(aux) > 0


def test_moe_grouped_matches_bsr(rng, cfg):
    key = jax.random.PRNGKey(0)
    params = models.init_moe_params(key, cfg)
    topo = models.block_diag_topology(cfg)
    x = jnp.asarray(rng.standard_normal((200, cfg.d_model)).astype(np.float32))
    yg, _ = models.moe_forward(params, x, cfg, topo, impl="grouped")
    yb, _ = models.moe_forward(params, x, cfg, topo, impl="bsr")
    np.testing.assert_allclose(
        np.asarray(yg, np.float32), np.asarray(yb, np.float32), atol=1e-3
    )


def test_moe_fused_matches_unfused(rng, cfg):
    """impl='bsr' (fused SDD->gelu->DSD kernel) vs the three-kernel chain."""
    key = jax.random.PRNGKey(0)
    params = models.init_moe_params(key, cfg)
    topo = models.block_diag_topology(cfg)
    x = jnp.asarray(rng.standard_normal((200, cfg.d_model)).astype(np.float32))
    yf, _ = models.moe_forward(params, x, cfg, topo, impl="bsr")
    yu, _ = models.moe_forward(params, x, cfg, topo, impl="bsr_unfused")
    np.testing.assert_allclose(
        np.asarray(yf, np.float32), np.asarray(yu, np.float32), atol=1e-3
    )


def test_moe_fused_grads(rng, cfg):
    key = jax.random.PRNGKey(0)
    params = models.init_moe_params(key, cfg)
    topo = models.block_diag_topology(cfg)
    x = jnp.asarray(rng.standard_normal((96, cfg.d_model)).astype(np.float32))

    def loss(impl):
        def f(p):
            y, aux = models.moe_forward(p, x, cfg, topo, impl=impl)
            return jnp.sum(y.astype(jnp.float32) ** 2) + aux
        return jax.grad(f)(params)

    gf, gu = loss("bsr"), loss("bsr_unfused")
    for k in gf:
        np.testing.assert_allclose(
            np.asarray(gf[k], np.float32), np.asarray(gu[k], np.float32),
            atol=1e-2, rtol=1e-2,
        )


def test_plan_group_ffn_rejects_ragged(rng):
    from sputnik_tpu.kernels.bsr_ffn import plan_group_ffn
    from sputnik_tpu.utils import testing

    # Random topology: rows don't share column runs -> not group-structured.
    topo = testing.random_bsr(rng, 512, 512, 512 * 512 // 4, 128)
    assert plan_group_ffn(topo) is None
    # The block-diagonal MoE topology IS group-structured.
    cfg2 = models.MoEConfig(
        d_model=128, d_ff=256, n_experts=2, capacity=256, dtype=jnp.float32
    )
    plan = plan_group_ffn(models.block_diag_topology(cfg2))
    assert plan is not None
    group_cols, rows_per_group = plan
    assert group_cols.shape == (2, 2) and rows_per_group == 2


def test_moe_train_step_decreases_loss(rng, cfg):
    import optax

    key = jax.random.PRNGKey(1)
    params = models.init_moe_params(key, cfg)
    topo = models.block_diag_topology(cfg)
    x = jnp.asarray(rng.standard_normal((128, cfg.d_model)).astype(np.float32))
    target = jnp.asarray(rng.standard_normal((128, cfg.d_model)).astype(np.float32))

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(models.moe_loss)(
            params, x, target, cfg, topo
        )
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


@pytest.mark.parametrize("impl", ["ragged", "bsr", "bsr_fused"])
def test_dropless_moe_matches_dense(rng, impl):
    cfg = models.MoEConfig(
        d_model=128, d_ff=128, n_experts=4, capacity=128, dtype=jnp.float32
    )
    key = jax.random.PRNGKey(2)
    params = models.init_moe_params(key, cfg)
    x = jnp.asarray(rng.standard_normal((200, cfg.d_model)).astype(np.float32))

    @jax.jit
    def fwd(params, x):
        return models.dropless_moe_forward(params, x, cfg, impl=impl)

    y, aux = fwd(params, x)
    # Dense per-token oracle WITHOUT capacity (dropless: nothing dropped).
    logits = np.asarray(x) @ np.asarray(params["router"])
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    expert = probs.argmax(-1)
    prob = probs.max(-1)
    w1 = np.asarray(params["w1"], np.float32)
    w2 = np.asarray(params["w2"], np.float32)
    exp = np.zeros((x.shape[0], cfg.d_model), np.float32)
    for t in range(x.shape[0]):
        e = expert[t]
        w1_e = w1[:, e * cfg.d_ff : (e + 1) * cfg.d_ff]
        w2_e = w2[e * cfg.d_ff : (e + 1) * cfg.d_ff, :]
        h = np.asarray(jax.nn.gelu(np.asarray(x, np.float32)[t] @ w1_e))
        exp[t] = (h @ w2_e) * prob[t]
    np.testing.assert_allclose(np.asarray(y, np.float32), exp, atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("impl", ["ragged", "bsr_fused"])
def test_dropless_moe_grads(rng, impl):
    cfg = models.MoEConfig(
        d_model=128, d_ff=128, n_experts=2, capacity=128, dtype=jnp.float32
    )
    params = models.init_moe_params(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray(rng.standard_normal((150, cfg.d_model)).astype(np.float32))

    @jax.jit
    def loss(params, x):
        y, aux = models.dropless_moe_forward(params, x, cfg, impl=impl)
        return jnp.sum(y**2) * 1e-3 + 0.01 * aux

    grads = jax.grad(loss)(params, x)
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k
    assert float(jnp.abs(grads["w1"]).max()) > 0

    # Dense per-token oracle autodiff, INCLUDING d/dx: the routing glue
    # clamps padding slots onto a real token (moe.py round-3), so a value
    # or cotangent leak through those slots would corrupt dx for that
    # token — compare against an einsum formulation with no permutation.
    def dense_loss(params, x):
        logits = x @ params["router"]
        probs = jax.nn.softmax(logits, axis=-1)
        expert = jnp.argmax(probs, axis=-1)
        prob = jnp.max(probs, axis=-1)
        oh = jax.nn.one_hot(expert, cfg.n_experts, dtype=jnp.float32)
        w1 = params["w1"].reshape(cfg.d_model, cfg.n_experts, cfg.d_ff)
        w2 = params["w2"].reshape(cfg.n_experts, cfg.d_ff, cfg.d_model)
        h = jax.nn.gelu(jnp.einsum("td,def,te->tf", x, w1, oh))
        y = jnp.einsum("tf,efd,te->td", h, w2, oh) * prob[:, None]
        me = jnp.mean(probs, axis=0)
        ce = jnp.mean(oh, axis=0)
        aux = cfg.n_experts * jnp.sum(me * ce)
        return jnp.sum(y**2) * 1e-3 + 0.01 * aux

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    gp_d, gx_d = jax.grad(dense_loss, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(
        np.asarray(gx), np.asarray(gx_d), atol=2e-3, rtol=2e-2
    )
    for k in gp:
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(gp_d[k]), atol=2e-3, rtol=2e-2,
            err_msg=k,
        )
