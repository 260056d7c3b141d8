"""Sparse transformer block / tiny LM: the two sparse subsystems assembled.

Block-sparse attention (SDD -> masked softmax -> DSD over a band/causal
topology) + a MoE FFN (grouped / dropless), with layernorms and residuals —
the end-to-end workload the reference's kernels exist to serve (MegaBlocks
trains exactly this shape on top of them).

Everything is a pytree of plain arrays + static config; the train step
differentiates through the custom-VJP sparse ops. Multi-device training
composes with ``sputnik_tpu.parallel`` (see ``models/moe_parallel.py`` for
the dp x tp x ep sharded step and ``parallel/attention.py`` for
sequence-parallel attention).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sputnik_tpu.formats import BlockSparseMatrix
from sputnik_tpu.models import attention as attn_lib
from sputnik_tpu.models import moe as moe_lib

__all__ = [
    "TransformerConfig",
    "init_block_params",
    "block_forward",
    "init_lm_params",
    "lm_forward",
    "lm_loss",
]


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    d_model: int = 256
    n_heads: int = 4
    seq_len: int = 512
    window_blocks: int = 2  # attention band half-width, in 128-blocks
    # MoE FFN
    n_experts: int = 4
    d_ff: int = 512
    capacity: Optional[int] = None  # None -> seq_len // n_experts
    n_layers: int = 2
    vocab: int = 1024
    dtype: object = jnp.bfloat16
    # Flash-style fused attention kernel (O(T*dh) memory, faster forward;
    # backward recomputes through the unfused chain).
    fused_attention: bool = False

    @property
    def d_head(self) -> int:
        return self.d_model // self.n_heads

    def moe_cfg(self) -> moe_lib.MoEConfig:
        cap = self.capacity or max(self.seq_len // self.n_experts, 128)
        return moe_lib.MoEConfig(
            d_model=self.d_model,
            d_ff=self.d_ff,
            n_experts=self.n_experts,
            capacity=cap,
            dtype=self.dtype,
        )


def _layernorm(x, scale, bias, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias).astype(x.dtype)


def init_block_params(key, cfg: TransformerConfig) -> Dict:
    ks = jax.random.split(key, 6)
    d, h = cfg.d_model, cfg.n_heads
    s = 1.0 / np.sqrt(d)
    moe_cfg = cfg.moe_cfg()
    return {
        "wqkv": (jax.random.normal(ks[0], (d, 3 * d)) * s).astype(cfg.dtype),
        "wo": (jax.random.normal(ks[1], (d, d)) * s).astype(cfg.dtype),
        "ln1_scale": jnp.ones((d,), jnp.float32),
        "ln1_bias": jnp.zeros((d,), jnp.float32),
        "ln2_scale": jnp.ones((d,), jnp.float32),
        "ln2_bias": jnp.zeros((d,), jnp.float32),
        "moe": moe_lib.init_moe_params(ks[2], moe_cfg),
    }


def block_forward(
    params: Dict,
    x: jax.Array,  # (T, d_model)
    cfg: TransformerConfig,
    topology: BlockSparseMatrix,
    moe_topology: BlockSparseMatrix,
) -> Tuple[jax.Array, jax.Array]:
    """One block: causal block-sparse attention + MoE FFN. Returns (y, aux)."""
    t, d = x.shape
    h, dh = cfg.n_heads, cfg.d_head

    a_in = _layernorm(x, params["ln1_scale"], params["ln1_bias"])
    qkv = jnp.dot(a_in, params["wqkv"], preferred_element_type=jnp.float32)
    qkv = qkv.astype(cfg.dtype).reshape(t, 3, h, dh)
    q = jnp.transpose(qkv[:, 0], (1, 0, 2))  # (H, T, dh)
    k = jnp.transpose(qkv[:, 1], (1, 0, 2))
    v = jnp.transpose(qkv[:, 2], (1, 0, 2))
    o = attn_lib.multihead_block_sparse_attention(
        q, k, v, topology, causal=True, fused=cfg.fused_attention
    )
    o = jnp.transpose(o, (1, 0, 2)).reshape(t, d)
    x = x + jnp.dot(o, params["wo"], preferred_element_type=jnp.float32).astype(
        cfg.dtype
    )

    f_in = _layernorm(x, params["ln2_scale"], params["ln2_bias"])
    f_out, aux = moe_lib.moe_forward(params["moe"], f_in, cfg.moe_cfg(), moe_topology)
    return x + f_out.astype(cfg.dtype), aux


def init_lm_params(key, cfg: TransformerConfig) -> Dict:
    ks = jax.random.split(key, cfg.n_layers + 2)
    s = 1.0 / np.sqrt(cfg.d_model)
    return {
        "embed": (jax.random.normal(ks[0], (cfg.vocab, cfg.d_model)) * s).astype(
            cfg.dtype
        ),
        "blocks": [init_block_params(ks[i + 1], cfg) for i in range(cfg.n_layers)],
        "lnf_scale": jnp.ones((cfg.d_model,), jnp.float32),
        "lnf_bias": jnp.zeros((cfg.d_model,), jnp.float32),
    }


def lm_topologies(cfg: TransformerConfig):
    """(attention topology, moe topology) — build once, reuse every step."""
    topo = attn_lib.causal_block_topology(
        cfg.seq_len, block_size=128, window_blocks=cfg.window_blocks,
        dtype=cfg.dtype,
    )
    moe_topo = moe_lib.block_diag_topology(cfg.moe_cfg())
    return topo, moe_topo


def lm_forward(params: Dict, tokens: jax.Array, cfg: TransformerConfig, topos=None):
    """tokens (T,) int32 -> logits (T, vocab); returns (logits, aux_sum)."""
    if topos is None:
        topos = lm_topologies(cfg)
    topo, moe_topo = topos
    x = jnp.take(params["embed"], tokens, axis=0)
    aux_total = 0.0
    for bp in params["blocks"]:
        x, aux = block_forward(bp, x, cfg, topo, moe_topo)
        aux_total = aux_total + aux
    x = _layernorm(x, params["lnf_scale"], params["lnf_bias"])
    logits = jnp.dot(
        x, params["embed"].T, preferred_element_type=jnp.float32
    )
    return logits, aux_total


def lm_loss(params, tokens, cfg: TransformerConfig, topos=None) -> jax.Array:
    """Next-token cross-entropy + router balance aux."""
    logits, aux = lm_forward(params, tokens, cfg, topos)
    targets = tokens[1:]
    lp = jax.nn.log_softmax(logits[:-1].astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(lp, targets[:, None], axis=-1).mean()
    return nll + 0.01 * aux
