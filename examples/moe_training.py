"""Train a MegaBlocks-style MoE FFN — grouped, block-sparse, and dropless.

Run: python examples/moe_training.py
"""

import numpy as np
import _common  # noqa: F401  (repo path + JAX_PLATFORMS bootstrap)
import jax
import jax.numpy as jnp
import optax

from sputnik_tpu import models


def main():
    cfg = models.MoEConfig(
        d_model=256, d_ff=512, n_experts=4, capacity=256, dtype=jnp.float32
    )
    topo = models.block_diag_topology(cfg)
    params = models.init_moe_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((512, cfg.d_model)).astype(np.float32))
    target = jnp.asarray(rng.standard_normal((512, cfg.d_model)).astype(np.float32))

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(models.moe_loss)(
            params, x, target, cfg, topo
        )
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(10):
        params, opt_state, loss = step(params, opt_state)
        if i % 3 == 0:
            print(f"step {i}: loss {float(loss):.4f}")

    # Dropless: no capacity, no dropped tokens, traced group sizes.
    y, aux = jax.jit(
        lambda p, x_: models.dropless_moe_forward(p, x_, cfg)
    )(params, x)
    print(f"dropless forward: {y.shape}, router aux {float(aux):.3f}")


if __name__ == "__main__":
    main()
