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

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

__all__ = ["pipeline_apply", "pipeline_train_step", "stack_stage_params",
           "simulate_1f1b"]


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


# ---------------------------------------------------------------------------
# 1F1B training schedule
# ---------------------------------------------------------------------------


def simulate_1f1b(n_stages: int, n_micro: int):
    """Precompute the 1F1B slot tables on the host.

    Each slot, every stage may do one forward AND one backward (the
    steady-state "one forward, one backward" pairing). Decisions follow the
    classic PipeDream-flush rules: a stage backwards a microbatch as soon
    as its cotangent has arrived, and forwards the next microbatch only
    while its in-flight count stays under ``n_stages - stage`` — the cap
    that bounds stashed activations to O(stages) instead of GPipe's
    O(n_micro). Deterministic, so the whole schedule is two static
    ``(n_slots, n_stages)`` int32 tables (microbatch id or -1) the SPMD
    loop just reads.

    Returns (fwd_tab, bwd_tab) as numpy arrays.
    """
    S, M = n_stages, n_micro
    avail_f = [list(range(M)) if s == 0 else [] for s in range(S)]
    avail_b = [[] for _ in range(S)]
    inflight = [0] * S
    done_b0 = 0
    fwd_rows, bwd_rows = [], []
    for _ in range(2 * (M + S) + 4):
        frow = [-1] * S
        brow = [-1] * S
        for s in range(S):
            if avail_b[s]:
                brow[s] = avail_b[s].pop(0)
                inflight[s] -= 1
            if avail_f[s] and inflight[s] < S - s:
                frow[s] = avail_f[s].pop(0)
                inflight[s] += 1
        # Arrivals land at the END of the slot (after the rotation), so
        # they become consumable one slot later — matching the SPMD loop.
        for s in range(S):
            if frow[s] >= 0:
                if s + 1 < S:
                    avail_f[s + 1].append(frow[s])
                else:
                    avail_b[S - 1].append(frow[s])  # self-seeded cotangent
            if brow[s] >= 0 and s > 0:
                avail_b[s - 1].append(brow[s])
        fwd_rows.append(frow)
        bwd_rows.append(brow)
        if brow[0] >= 0:
            done_b0 += 1
        if done_b0 == M:
            break
    else:
        raise AssertionError("1F1B schedule did not converge")
    return (np.asarray(fwd_rows, np.int32), np.asarray(bwd_rows, np.int32))


def pipeline_train_step(
    stage_fn: Callable,  # (stage_params, x_micro) -> y_micro
    loss_fn: Callable,  # (y_micro, target_micro) -> scalar
    stacked_params,  # pytree with leading stage axis
    x: jax.Array,  # (n_micro * micro_tokens, d)
    targets: jax.Array,  # (n_micro * micro_tokens, ...) per-token targets
    mesh: Mesh,
    *,
    axis: str = "pipe",
    n_micro: int,
):
    """One 1F1B pipeline training step: returns ``(mean_loss, grads)`` with
    ``grads`` stage-stacked exactly like ``stacked_params``.

    TPU-native 1F1B (PipeDream-flush): the host-precomputed slot tables
    (:func:`simulate_1f1b`) drive a single ``fori_loop`` whose body does a
    table-selected forward and/or backward per stage under ``lax.cond`` —
    per-device control flow is fine inside ``shard_map`` as long as the
    ``ppermute`` rotations stay outside the conds (every device always
    participates in both rotations). Backward recomputes the stage forward
    from the stashed INPUT (``jax.vjp`` inside the bwd branch), so stashed
    state is one (S+2)-slot ring of microbatch inputs + one of cotangents:
    memory O(stages * micro), the 1F1B claim, vs autodiff-through-GPipe's
    O(n_micro * micro). The last stage seeds its own cotangent from
    ``loss_fn``'s gradient during its backward slot.
    """
    n_stages = mesh.shape[axis]
    if x.shape[0] % n_micro:
        raise ValueError(f"batch {x.shape[0]} not divisible by n_micro {n_micro}")
    micro = x.shape[0] // n_micro
    d = x.shape[1]
    ftab_np, btab_np = simulate_1f1b(n_stages, n_micro)
    n_slots = ftab_np.shape[0]
    # Arrival tables: who wrote my stash at the end of slot t.
    farr_np = np.full_like(ftab_np, -1)
    farr_np[:, 1:] = ftab_np[:, :-1]
    barr_np = np.full_like(btab_np, -1)
    barr_np[:, :-1] = btab_np[:, 1:]
    R = n_stages + 2  # stash ring slots (in-flight <= S, +margin for arrivals)

    ftab = jnp.asarray(ftab_np)
    btab = jnp.asarray(btab_np)
    farr = jnp.asarray(farr_np)
    barr = jnp.asarray(barr_np)

    def local(params_slab, x_full, tgt_full):
        params = jax.tree.map(lambda p: p[0], params_slab)
        stage = jax.lax.axis_index(axis)
        micros = x_full.reshape(n_micro, micro, d)
        tgts = tgt_full.reshape(n_micro, micro, *tgt_full.shape[1:])
        stash = jnp.zeros((R, micro, d), x_full.dtype)
        bstash = jnp.zeros((R, micro, d), x_full.dtype)
        grads0 = jax.tree.map(jnp.zeros_like, params)
        loss0 = jnp.zeros((), jnp.float32)
        last = n_stages - 1

        def slot(t, carry):
            stash, bstash, grads, loss = carry
            fid = ftab[t, stage]
            bid = btab[t, stage]
            do_fwd = fid >= 0
            do_bwd = bid >= 0
            fslot = jnp.maximum(fid, 0) % R
            bslot = jnp.maximum(bid, 0) % R

            x_in = jnp.where(
                stage == 0,
                micros[jnp.maximum(fid, 0) % n_micro],
                stash[fslot],
            )
            y = jax.lax.cond(
                do_fwd,
                lambda: stage_fn(params, x_in).astype(x_in.dtype),
                lambda: jnp.zeros((micro, d), x_in.dtype),
            )
            stash = jnp.where(do_fwd, stash.at[fslot].set(x_in), stash)

            def bwd_branch():
                x_saved = stash[bslot]
                y2, vjp = jax.vjp(
                    lambda p, xx: stage_fn(p, xx).astype(xx.dtype),
                    params, x_saved,
                )
                tgt = tgts[jnp.maximum(bid, 0) % n_micro]

                def seed():
                    lval, cot = jax.value_and_grad(
                        lambda yy: loss_fn(yy, tgt)
                    )(y2)
                    return lval.astype(jnp.float32), cot.astype(y2.dtype)

                lval, cot = jax.lax.cond(
                    stage == last,
                    seed,
                    lambda: (jnp.zeros((), jnp.float32), bstash[bslot]),
                )
                dp, dx = vjp(cot)
                return dp, dx.astype(x_full.dtype), lval

            dp, dx, lval = jax.lax.cond(
                do_bwd,
                bwd_branch,
                lambda: (
                    jax.tree.map(jnp.zeros_like, params),
                    jnp.zeros((micro, d), x_full.dtype),
                    jnp.zeros((), jnp.float32),
                ),
            )
            grads = jax.tree.map(lambda g, d_: g + d_, grads, dp)
            loss = loss + lval

            # Rotations EVERY slot on every device (no cond): activations
            # forward, cotangents backward over the ICI ring.
            y_send = jnp.where(do_fwd, y, jnp.zeros_like(y))
            dx_send = jnp.where(do_bwd, dx, jnp.zeros_like(dx))
            fperm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
            bperm = [(i, (i - 1) % n_stages) for i in range(n_stages)]
            y_rot = jax.lax.ppermute(y_send, axis, fperm)
            dx_rot = jax.lax.ppermute(dx_send, axis, bperm)
            fa = farr[t, stage]
            ba = barr[t, stage]
            stash = jnp.where(
                fa >= 0, stash.at[jnp.maximum(fa, 0) % R].set(y_rot), stash
            )
            bstash = jnp.where(
                ba >= 0, bstash.at[jnp.maximum(ba, 0) % R].set(dx_rot), bstash
            )
            return stash, bstash, grads, loss

        _, _, grads, loss = jax.lax.fori_loop(
            0, n_slots, slot, (stash, bstash, grads0, loss0)
        )
        # Returned loss is the MEAN over microbatches; scale the summed
        # per-microbatch grads to match d(mean)/dp.
        loss = jax.lax.psum(loss, axis) / n_micro
        grads = jax.tree.map(lambda g: g[None] / n_micro, grads)
        return loss, grads

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=(P(), P(axis)),
        check_vma=False,
    )
    return fn(stacked_params, x, targets)
