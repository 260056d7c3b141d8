"""Mesh-parallel MoE training: data parallel over tokens + tensor parallel
over each expert's hidden dimension, with the block-sparse FFN running the
single-chip Pallas kernels per device under shard_map.

Sharding layout (mesh axes ``('data', 'model')``):
  * tokens/targets:   P('data', None)
  * router weights:   replicated
  * w1 (d, E, F):     P(None, None, 'model')   — each device owns F/tp
    hidden columns of every expert; the block-diagonal topology shrinks to
    d_ff_local = F/tp with no communication in SDD.
  * w2 (E, F, d):     P(None, 'model', None)   — partial y psum'd over
    'model' (the tensor-parallel reduce), riding ICI.
Gradients flow through shard_map + the custom sparse VJPs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sputnik_tpu import ops
from sputnik_tpu.models import moe as moe_lib

__all__ = ["reshape_params_for_mesh", "make_sharded_moe_loss", "param_specs"]


def reshape_params_for_mesh(params: Dict, cfg: moe_lib.MoEConfig) -> Dict:
    """(d, E*F) / (E*F, d) -> (d, E, F) / (E, F, d) so the F dim shards."""
    e, f, d = cfg.n_experts, cfg.d_ff, cfg.d_model
    return {
        "router": params["router"],
        "w1": params["w1"].reshape(d, e, f),
        "w2": params["w2"].reshape(e, f, d),
    }


def param_specs() -> Dict:
    return {
        "router": P(),
        "w1": P(None, None, "model"),
        "w2": P(None, "model", None),
    }


def make_sharded_moe_loss(mesh: Mesh, cfg: moe_lib.MoEConfig, total_tokens: int):
    """Returns loss_fn(params, x, target) -> replicated scalar, where the
    MoE FFN runs tensor-parallel over 'model' and data-parallel over 'data'.
    """
    tp = mesh.shape["model"]
    dp = mesh.shape["data"]
    if cfg.d_ff % (tp * cfg.block_size):
        raise ValueError(f"d_ff {cfg.d_ff} must be a multiple of tp*block")
    cfg_local = dataclasses.replace(cfg, d_ff=cfg.d_ff // tp)
    topo_local = moe_lib.block_diag_topology(cfg_local)

    def inner(router, w1_l, w2_l, x_l, t_l):
        # w1_l: (d, E, F/tp); w2_l: (E, F/tp, d); x_l: (T/dp, d)
        w1_flat = w1_l.reshape(w1_l.shape[0], -1)
        w2_flat = w2_l.reshape(-1, w2_l.shape[-1])
        logits = x_l.astype(jnp.float32) @ router
        slot, keep, prob, aux = moe_lib._route(logits, cfg_local)
        slot_or_drop = jnp.where(keep, slot, cfg_local.padded_tokens)
        x_perm = jnp.zeros((cfg_local.padded_tokens + 1, x_l.shape[1]), cfg.dtype)
        x_perm = x_perm.at[slot_or_drop].set(x_l.astype(cfg.dtype))[
            : cfg_local.padded_tokens
        ]
        h = ops.sdd(x_perm, w1_flat, topo_local)
        h = h.with_data(jax.nn.gelu(h.data.astype(jnp.float32)).astype(cfg.dtype))
        y_perm = ops.dsd(h, w2_flat)
        # tensor-parallel reduce of the partial expert outputs
        y_perm = jax.lax.psum(y_perm.astype(jnp.float32), "model")
        y = jnp.take(y_perm, slot, axis=0)
        y = y * (prob * keep.astype(jnp.float32))[:, None]
        sse = jnp.sum((y - t_l.astype(jnp.float32)) ** 2)
        sse = jax.lax.psum(sse, "data")
        aux = jax.lax.pmean(aux, "data")
        return sse / (total_tokens * cfg.d_model) + cfg.router_aux_weight * aux

    sharded = shard_map(
        inner,
        mesh=mesh,
        in_specs=(
            P(),
            P(None, None, "model"),
            P(None, "model", None),
            P("data", None),
            P("data", None),
        ),
        out_specs=P(),
        check_vma=False,
    )

    def loss_fn(params, x, target):
        return sharded(params["router"], params["w1"], params["w2"], x, target)

    return loss_fn
