"""Train a tiny sparse transformer LM: block-sparse causal attention +
MoE FFN blocks, next-token loss, everything through the sparse kernels.

Run: python examples/sparse_transformer_lm.py
"""

import numpy as np
import _common  # noqa: F401  (repo path + JAX_PLATFORMS bootstrap)
import jax
import jax.numpy as jnp
import optax

from sputnik_tpu import models


def main():
    cfg = models.TransformerConfig(
        d_model=128, n_heads=2, seq_len=512, window_blocks=2,
        n_experts=2, d_ff=256, n_layers=2, vocab=256, dtype=jnp.float32,
    )
    params = models.init_lm_params(jax.random.PRNGKey(0), cfg)
    topos = models.lm_topologies(cfg)
    rng = np.random.default_rng(0)
    # A synthetic repeating-pattern corpus the model can actually learn.
    base = rng.integers(0, cfg.vocab, 64)
    tokens = jnp.asarray(np.tile(base, cfg.seq_len // 64 + 1)[: cfg.seq_len], jnp.int32)

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: models.lm_loss(p, tokens, cfg, topos)
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(50):
        params, opt_state, loss = step(params, opt_state)
        if i % 5 == 0:
            print(f"step {i:2d}: loss {float(loss):.4f}")
    print("final:", float(step(params, opt_state)[2]))

    # Incremental generation through the paged KV caches (band decode ==
    # the training mask, so the model continues the pattern it learned).
    prompt = tokens[:128]
    gen = models.lm_generate(params, prompt, cfg, 32)
    expect = np.asarray(tokens[128:160])
    acc = float((np.asarray(gen) == expect).mean())
    print(f"generated 32 tokens via paged-KV decode; "
          f"pattern accuracy vs corpus: {acc:.0%}")


if __name__ == "__main__":
    main()
