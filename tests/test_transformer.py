"""Sparse transformer block / LM tests + format serialization."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sputnik_tpu import models
from sputnik_tpu.formats import SellMatrix
from sputnik_tpu.utils import testing
from sputnik_tpu.utils.serialization import load_matrix, save_matrix


@pytest.fixture
def cfg():
    return models.TransformerConfig(
        d_model=128, n_heads=2, seq_len=256, window_blocks=2,
        n_experts=2, d_ff=128, n_layers=2, vocab=128, dtype=jnp.float32,
    )


def test_block_forward_shapes_and_finite(rng, cfg):
    params = models.init_block_params(jax.random.PRNGKey(0), cfg)
    topo, moe_topo = models.lm_topologies(cfg)
    x = jnp.asarray(rng.standard_normal((cfg.seq_len, cfg.d_model)).astype(np.float32))
    y, aux = models.block_forward(params, x, cfg, topo, moe_topo)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y, np.float32)).all()
    assert float(aux) > 0


def test_attention_is_causal(rng, cfg):
    """Changing a future token must not change earlier logits."""
    params = models.init_lm_params(jax.random.PRNGKey(1), cfg)
    topos = models.lm_topologies(cfg)
    toks = jnp.asarray(rng.integers(0, cfg.vocab, cfg.seq_len), jnp.int32)
    logits1, _ = models.lm_forward(params, toks, cfg, topos)
    toks2 = toks.at[-1].set((toks[-1] + 1) % cfg.vocab)
    logits2, _ = models.lm_forward(params, toks2, cfg, topos)
    np.testing.assert_allclose(
        np.asarray(logits1[:-1], np.float32),
        np.asarray(logits2[:-1], np.float32),
        atol=1e-4,
    )


def test_lm_train_step_decreases_loss(rng, cfg):
    import optax

    params = models.init_lm_params(jax.random.PRNGKey(2), cfg)
    topos = models.lm_topologies(cfg)
    toks = jnp.asarray(rng.integers(0, cfg.vocab, cfg.seq_len), jnp.int32)

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: models.lm_loss(p, toks, cfg, topos)
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


@pytest.mark.parametrize("kind", ["bsr", "csr", "sell", "sell_sorted", "ell"])
def test_save_load_roundtrip(rng, tmp_path, kind):
    from sputnik_tpu.formats import EllMatrix

    c = testing.random_csr(rng, 256, 300, 2000)
    if kind == "bsr":
        m = testing.random_bsr(rng, 256, 256, 256 * 256 // 4, 128)
    elif kind == "csr":
        m = c
    elif kind == "sell":
        m = SellMatrix.from_csr(c)
    elif kind == "sell_sorted":
        m = SellMatrix.from_csr(c, sort_rows=True)
    else:
        m = EllMatrix.from_csr(c)
    p = str(tmp_path / "m.npz")
    save_matrix(p, m)
    m2 = load_matrix(p)
    np.testing.assert_allclose(
        np.asarray(m.to_dense(), np.float32),
        np.asarray(m2.to_dense(), np.float32),
        atol=1e-6,
    )


def test_decode_matches_full_forward(rng):
    """Teacher-forced incremental decoding (band mode) reproduces the full
    sparse forward pass's logits at every decoded position."""
    cfg = models.TransformerConfig(
        d_model=128, n_heads=2, seq_len=256, window_blocks=2, n_experts=2,
        d_ff=128, n_layers=2, vocab=64, dtype=jnp.float32, capacity=256,
    )
    params = models.init_lm_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab, cfg.seq_len), jnp.int32)
    full_logits, _ = models.lm_forward(params, tokens, cfg)

    tp = 128
    caches, pre_logits = models.lm_prefill(params, tokens[:tp], cfg, cfg.seq_len)
    np.testing.assert_allclose(
        np.asarray(pre_logits), np.asarray(full_logits[tp - 1]), atol=2e-3
    )
    step = jax.jit(
        lambda p, t, c, pos: models.lm_decode_step(p, t, c, pos, cfg)
    )
    for pos in range(tp, cfg.seq_len):
        logits, caches = step(params, tokens[pos], caches, jnp.int32(pos))
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full_logits[pos]), atol=2e-3,
            err_msg=f"decode logits diverge at position {pos}",
        )


def test_lm_generate_runs_and_is_deterministic(rng):
    cfg = models.TransformerConfig(
        d_model=128, n_heads=2, seq_len=256, window_blocks=2, n_experts=2,
        d_ff=128, n_layers=1, vocab=64, dtype=jnp.float32, capacity=256,
    )
    params = models.init_lm_params(jax.random.PRNGKey(1), cfg)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab, 128), jnp.int32)
    out1 = models.lm_generate(params, prompt, cfg, 16)
    out2 = models.lm_generate(params, prompt, cfg, 16)
    assert out1.shape == (16,)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert ((np.asarray(out1) >= 0) & (np.asarray(out1) < cfg.vocab)).all()
    # topk mode also runs (content-selected pages).
    out3 = models.lm_generate(params, prompt, cfg, 4, mode="topk", k_pages=1)
    assert out3.shape == (4,)


def test_lm_generate_validation(rng):
    cfg = models.TransformerConfig(
        d_model=128, n_heads=2, seq_len=256, window_blocks=2, n_experts=2,
        d_ff=128, n_layers=1, vocab=64, dtype=jnp.float32, capacity=256,
    )
    params = models.init_lm_params(jax.random.PRNGKey(1), cfg)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab, 128), jnp.int32)
    with pytest.raises(ValueError):
        models.lm_generate(params, prompt, cfg, 0)
    with pytest.raises(ValueError):
        models.lm_generate(params, prompt, cfg, 1000)  # exceeds max_len
    with pytest.raises(ValueError):
        models.lm_generate(params, prompt[:100], cfg, 4)  # non-128 prompt


def test_lm_generate_sampling(rng):
    cfg = models.TransformerConfig(
        d_model=128, n_heads=2, seq_len=256, window_blocks=2, n_experts=2,
        d_ff=128, n_layers=1, vocab=64, dtype=jnp.float32, capacity=256,
    )
    params = models.init_lm_params(jax.random.PRNGKey(1), cfg)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab, 128), jnp.int32)
    s1 = models.lm_generate(params, prompt, cfg, 8, temperature=1.0,
                            key=jax.random.PRNGKey(0))
    s2 = models.lm_generate(params, prompt, cfg, 8, temperature=1.0,
                            key=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))  # same key
    assert ((np.asarray(s1) >= 0) & (np.asarray(s1) < cfg.vocab)).all()
    with pytest.raises(ValueError):
        models.lm_generate(params, prompt, cfg, 4, temperature=1.0)  # no key


def test_prefill_keeps_training_capacity(rng):
    """capacity=None derives from seq_len; prefill must resolve it at the
    TRAINING length, not the prompt length, or an imbalanced router makes
    prefill drop prompt tokens the model keeps (review regression)."""
    cfg = models.TransformerConfig(
        d_model=128, n_heads=2, seq_len=512, window_blocks=2, n_experts=2,
        d_ff=128, n_layers=1, vocab=64, dtype=jnp.float32, capacity=None,
    )
    params = models.init_lm_params(jax.random.PRNGKey(0), cfg)
    # Bias the router so every token routes to expert 0: a 256-token
    # prompt then exceeds a prompt-derived capacity (128) but not the
    # training capacity (256).
    params["blocks"][0]["moe"]["router"] = (
        params["blocks"][0]["moe"]["router"].at[:, 0].add(100.0)
    )
    prompt = jnp.asarray(rng.integers(0, cfg.vocab, 256), jnp.int32)
    _, logits = models.lm_prefill(params, prompt, cfg, cfg.seq_len)
    import dataclasses as dc
    ref_cfg = dc.replace(cfg, seq_len=256, capacity=cfg.moe_cfg().capacity)
    ref_logits, _ = models.lm_forward(params, prompt, ref_cfg)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits[-1]), atol=2e-3
    )


def test_lm_batched_training_via_vmap(rng):
    """Batched sequences vmap through the whole sparse stack (custom-VJP
    ops included), forward and backward."""
    cfg = models.TransformerConfig(
        d_model=128, n_heads=2, seq_len=256, window_blocks=2, n_experts=2,
        d_ff=128, n_layers=1, vocab=64, dtype=jnp.float32, capacity=256,
    )
    params = models.init_lm_params(jax.random.PRNGKey(0), cfg)
    topos = models.lm_topologies(cfg)
    batch = jnp.asarray(rng.integers(0, 64, (4, 256)), jnp.int32)

    def batch_loss(p):
        return jax.vmap(lambda t: models.lm_loss(p, t, cfg, topos))(batch).mean()

    loss, g = jax.jit(jax.value_and_grad(batch_loss))(params)
    assert np.isfinite(float(loss))
    assert float(jnp.abs(g["embed"]).max()) > 0
    # Batched loss == mean of per-sequence losses.
    per_seq = [float(models.lm_loss(params, batch[i], cfg, topos)) for i in range(4)]
    np.testing.assert_allclose(float(loss), np.mean(per_seq), rtol=1e-5)


def test_lm_generate_batched_matches_single(rng):
    """Batched scan-fused decode == per-sequence lm_generate: greedy at any
    batch, sampled at batch 1 (the batched path draws ONE categorical field
    per step across the whole batch, so per-sequence sampled parity holds
    only when the batch IS one sequence — the (1, vocab) Gumbel field then
    equals the single path's (vocab,) draw under the same key)."""
    cfg = models.TransformerConfig(
        d_model=128, n_heads=2, seq_len=256, window_blocks=2, n_experts=2,
        d_ff=128, n_layers=2, vocab=64, dtype=jnp.float32,
    )
    params = models.init_lm_params(jax.random.PRNGKey(0), cfg)
    prompts = jnp.asarray(rng.integers(0, 64, (3, 128)), jnp.int32)
    out_b = models.lm_generate_batched(params, prompts, cfg, 6)
    assert out_b.shape == (3, 6)
    for i in range(3):
        out_1 = models.lm_generate(params, prompts[i], cfg, 6)
        np.testing.assert_array_equal(np.asarray(out_b[i]), np.asarray(out_1))
    # topk mode runs batched too.
    out_t = models.lm_generate_batched(
        params, prompts, cfg, 4, mode="topk", k_pages=1
    )
    assert out_t.shape == (3, 4)
    # Sampled parity at batch 1 (see docstring for why B=1 only).
    k = jax.random.PRNGKey(11)
    s_b = models.lm_generate_batched(
        params, prompts[:1], cfg, 5, temperature=0.8, key=k
    )
    s_1 = models.lm_generate(
        params, prompts[0], cfg, 5, temperature=0.8, key=k
    )
    np.testing.assert_array_equal(np.asarray(s_b[0]), np.asarray(s_1))
    # Validation mirrors lm_generate's.
    import pytest as _pytest

    with _pytest.raises(ValueError):
        models.lm_generate_batched(params, prompts[0], cfg, 4)  # not (B, Tp)
    with _pytest.raises(ValueError):
        models.lm_generate_batched(params, prompts, cfg, 1000)
    with _pytest.raises(ValueError):
        models.lm_generate_batched(params, prompts, cfg, 4, temperature=1.0)


def test_lm_generate_batched_sampling_deterministic(rng):
    cfg = models.TransformerConfig(
        d_model=128, n_heads=2, seq_len=256, window_blocks=2, n_experts=2,
        d_ff=128, n_layers=1, vocab=64, dtype=jnp.float32,
    )
    params = models.init_lm_params(jax.random.PRNGKey(0), cfg)
    prompts = jnp.asarray(rng.integers(0, 64, (2, 128)), jnp.int32)
    k = jax.random.PRNGKey(7)
    s1 = models.lm_generate_batched(params, prompts, cfg, 5,
                                    temperature=1.0, key=k)
    s2 = models.lm_generate_batched(params, prompts, cfg, 5,
                                    temperature=1.0, key=k)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
