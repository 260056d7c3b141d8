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

__all__ = [
    "reshape_params_for_mesh",
    "make_sharded_moe_loss",
    "param_specs",
    "make_ep_moe_forward",
]


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


def make_ep_moe_forward(mesh: Mesh, cfg: moe_lib.MoEConfig):
    """Expert-parallel MoE forward over mesh axes ('data', 'expert').

    The reference expresses expert parallelism "through the data"
    (block-diagonal BSR, SURVEY.md section 2.8); across chips it needs the
    collective the reference never had: tokens routed locally, exchanged
    with ``all_to_all`` over the 'expert' axis (ICI), processed by the local
    expert shard's block-diagonal SDD+DSD, and exchanged back. Differentiable
    end-to-end (all_to_all is linear).

    Layout:
      tokens x:  P(('data','expert'), None)   — flat token parallelism
      router:    replicated
      w1 (d,E,F): P(None,'expert',None); w2 (E,F,d): P('expert',None,None)
    Per-expert capacity is split evenly across source shards
    (cfg.capacity must be divisible by the 'expert' axis size).
    """
    ep = mesh.shape["expert"]
    e = cfg.n_experts
    if e % ep:
        raise ValueError(f"n_experts {e} not divisible by expert axis {ep}")
    if cfg.capacity % (ep * cfg.block_size):
        raise ValueError("capacity must be divisible by ep * block_size")
    cap_send = cfg.capacity // ep  # per expert, per source shard
    e_local = e // ep
    cfg_local = dataclasses.replace(cfg, n_experts=e_local)
    topo_local = moe_lib.block_diag_topology(cfg_local)

    def inner(router, w1_l, w2_l, x_l):
        # Route local tokens to all E experts.
        logits = x_l.astype(jnp.float32) @ router
        probs = jax.nn.softmax(logits, axis=-1)
        expert = jnp.argmax(probs, axis=-1)
        prob = jnp.max(probs, axis=-1)
        onehot = jax.nn.one_hot(expert, e, dtype=jnp.int32)
        pos = jnp.sum((jnp.cumsum(onehot, axis=0) - onehot) * onehot, axis=-1)
        keep = pos < cap_send
        slot = expert * cap_send + jnp.minimum(pos, cap_send - 1)
        slot_or_drop = jnp.where(keep, slot, e * cap_send)
        send = jnp.zeros((e * cap_send + 1, x_l.shape[1]), cfg.dtype)
        send = send.at[slot_or_drop].set(x_l.astype(cfg.dtype))[: e * cap_send]
        send = send.reshape(e, cap_send, x_l.shape[1])

        # Exchange: each expert shard receives its experts' tokens from all
        # source shards -> (e_local, ep * cap_send, d).
        recv = jax.lax.all_to_all(
            send, "expert", split_axis=0, concat_axis=1, tiled=True
        )
        xp = recv.reshape(e_local * cfg.capacity, x_l.shape[1])

        w1_flat = w1_l.reshape(w1_l.shape[0], -1)  # (d, e_local * F)
        w2_flat = w2_l.reshape(-1, x_l.shape[1])  # (e_local * F, d)
        h = ops.sdd(xp, w1_flat, topo_local)
        h = h.with_data(jax.nn.gelu(h.data.astype(jnp.float32)).astype(cfg.dtype))
        yp = ops.dsd(h, w2_flat)  # (e_local * capacity, d)

        # Exchange back to source shards: regroup rows by SOURCE shard so
        # split_axis=0 sends shard s its slice of every local expert.
        yp = yp.reshape(e_local, ep, cap_send, x_l.shape[1])
        yp = jnp.transpose(yp, (1, 0, 2, 3)).reshape(
            ep * e_local, cap_send, x_l.shape[1]
        )
        back = jax.lax.all_to_all(
            yp, "expert", split_axis=0, concat_axis=0, tiled=True
        )  # (e, cap_send, d) in global expert order on each source shard
        back = back.reshape(e * cap_send, x_l.shape[1])
        y = jnp.take(back, slot, axis=0).astype(jnp.float32)
        y = y * (prob * keep.astype(jnp.float32))[:, None]
        return y.astype(x_l.dtype)

    sharded = shard_map(
        inner,
        mesh=mesh,
        in_specs=(
            P(),
            P(None, "expert", None),
            P("expert", None, None),
            P(("data", "expert"), None),
        ),
        out_specs=P(("data", "expert"), None),
        check_vma=False,
    )

    def forward(params, x):
        return sharded(params["router"], params["w1"], params["w2"], x)

    return forward
