"""Pipeline parallelism: GPipe-style microbatching over a 'pipe' mesh axis.

Completes the parallelism taxonomy (SURVEY.md §2.8: DP / TP / PP / SP / EP
— the reference has none of them; DP/TP live in ``models/moe_parallel``,
SP in ``parallel/attention``, EP in the MoE all_to_all path).

Design: each pipeline stage owns a contiguous slice of layers,
shard-stacked so ``shard_map`` splits them over the ``pipe`` axis. The
classic GPipe schedule runs ``n_micro + n_stages - 1`` ticks; at each tick
every stage processes the microbatch it holds and the activations rotate
one stage forward via ``ppermute`` over ICI. Bubble fraction =
(S-1)/(M+S-1) — pick n_micro >= 4x stages. Layer compute inside a stage is
whatever the layer function does — the sparse Pallas kernels compose
untouched.

Stage functions must be shape-preserving (activations (micro_tokens, d)),
which transformer blocks are. The driver is jit-able end to end;
gradients flow through ``ppermute`` like any collective (GPipe recompute
is the caller's choice via ``jax.checkpoint`` on the stage function).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

__all__ = ["pipeline_apply", "stack_stage_params"]


def stack_stage_params(per_stage_params) -> object:
    """Stack a list of per-stage parameter pytrees into shard-stacked
    arrays (leading axis = stage) for the ``pipe`` mesh axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage_params)


def pipeline_apply(
    stage_fn: Callable,  # (stage_params, x_micro) -> x_micro
    stacked_params,  # pytree with leading stage axis
    x: jax.Array,  # (n_micro * micro_tokens, d) — full batch
    mesh: Mesh,
    *,
    axis: str = "pipe",
    n_micro: int,
) -> jax.Array:
    """Run ``stage_fn`` as a GPipe pipeline over ``mesh[axis]``.

    Returns the full batch after all stages, microbatches re-assembled in
    order. ``x`` is replicated in; the output is replicated (all stages
    hold it after the final rotation) — outer dp/tp sharding composes by
    nesting this mesh axis with others.
    """
    n_stages = mesh.shape[axis]
    if x.shape[0] % n_micro:
        raise ValueError(f"batch {x.shape[0]} not divisible by n_micro {n_micro}")
    micro = x.shape[0] // n_micro
    d = x.shape[1]
    n_ticks = n_micro + n_stages - 1

    def local(params_slab, x_full):
        # params_slab: this stage's params (leading axis 1); x replicated.
        params = jax.tree.map(lambda p: p[0], params_slab)
        stage = jax.lax.axis_index(axis)
        micros = x_full.reshape(n_micro, micro, d)
        # buf: the microbatch currently held by this stage.
        buf = jnp.zeros((micro, d), x_full.dtype)
        outs = jnp.zeros((n_micro, micro, d), x_full.dtype)

        def tick(t, carry):
            buf, outs = carry
            # Stage 0 injects microbatch t (when still in range).
            inject = jnp.logical_and(stage == 0, t < n_micro)
            feed = micros[jnp.minimum(t, n_micro - 1)]
            buf = jnp.where(inject, feed, buf)
            # Every stage processes what it holds; stages not yet fed (or
            # drained) compute on zeros — wasted but uniform (SPMD).
            buf = stage_fn(params, buf)
            # The LAST stage's result for microbatch m = t - (S-1) is final.
            m_idx = t - (n_stages - 1)
            done = jnp.logical_and(stage == n_stages - 1, m_idx >= 0)
            outs = jax.lax.dynamic_update_slice(
                outs,
                jnp.where(done, buf, outs[jnp.maximum(m_idx, 0)])[None],
                (jnp.maximum(m_idx, 0), 0, 0),
            )
            # Rotate activations one stage forward (ring over ICI).
            perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
            buf = jax.lax.ppermute(buf, axis, perm)
            return buf, outs

        _, outs = jax.lax.fori_loop(0, n_ticks, tick, (buf, outs))
        # Only the last stage ever writes real outputs (the rest stay
        # zero), so a psum broadcasts them to every stage.
        outs = jax.lax.psum(outs, axis)
        return outs.reshape(n_micro * micro, d)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(stacked_params, x)
