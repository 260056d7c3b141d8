"""MegaBlocks-style Mixture-of-Experts FFN as block-sparse matmuls.

This is the workload the reference was built for (its README's citation is
the MegaBlocks paper, ``README.md:29-43``): a top-1-routed expert FFN where
the token x hidden computation is expressed as block-sparse matmuls over a
**block-diagonal** topology instead of per-expert loops:

    h = SDD(x_perm, W1, block_diag_topology)    # tokens hit only their
    h = gelu(h)                                 # expert's hidden columns
    y = DSD(h, W2)

Tokens are routed top-1 and scattered into per-expert capacity slots
(capacity factor padding keeps shapes static for XLA; MegaBlocks' dropless
variable topology is a planned variant — the ops already accept traced
metadata). The backward pass runs through the custom VJPs in
``ops.autodiff``: dW1 arrives via DDS, dx via DSD, all sparse.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sputnik_tpu import ops
from sputnik_tpu.formats import BlockSparseMatrix

__all__ = [
    "MoEConfig",
    "block_diag_topology",
    "init_moe_params",
    "moe_forward",
    "moe_loss",
]


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    d_model: int = 512
    d_ff: int = 1024  # hidden units per expert
    n_experts: int = 8
    capacity: int = 256  # token slots per expert (multiple of block_size)
    block_size: int = 128
    dtype: object = jnp.bfloat16
    router_aux_weight: float = 0.01

    def __post_init__(self):
        bs = self.block_size
        assert self.capacity % bs == 0, "capacity must be a block multiple"
        assert self.d_ff % bs == 0, "d_ff must be a block multiple"

    @property
    def padded_tokens(self) -> int:
        return self.n_experts * self.capacity

    @property
    def ff_total(self) -> int:
        return self.n_experts * self.d_ff


def block_diag_topology(cfg: MoEConfig) -> BlockSparseMatrix:
    """Static block-diagonal topology: expert e's capacity rows hit only
    columns [e*d_ff, (e+1)*d_ff). The grouped-GEMM-as-BSR trick."""
    bs = cfg.block_size
    rows_per = cfg.capacity // bs
    cols_per = cfg.d_ff // bs
    e = np.arange(cfg.n_experts)
    # block-row r of expert e -> cols_per blocks at columns e*cols_per + j
    rows, cols = [], []
    for ei in e:
        for r in range(rows_per):
            for c in range(cols_per):
                rows.append(ei * rows_per + r)
                cols.append(ei * cols_per + c)
    nnz = len(rows)
    offsets = np.zeros(cfg.padded_tokens // bs + 1, np.int32)
    np.add.at(offsets[1:], np.asarray(rows), 1)
    offsets = np.cumsum(offsets).astype(np.int32)
    return BlockSparseMatrix.create(
        jnp.zeros((nnz, bs, bs), cfg.dtype),
        jnp.asarray(offsets),
        jnp.asarray(np.asarray(cols, np.int32)),
        (cfg.padded_tokens, cfg.ff_total),
    )


def init_moe_params(rng: jax.Array, cfg: MoEConfig) -> Dict[str, jax.Array]:
    k1, k2, k3 = jax.random.split(rng, 3)
    scale1 = 1.0 / np.sqrt(cfg.d_model)
    scale2 = 1.0 / np.sqrt(cfg.d_ff)
    return {
        "router": (jax.random.normal(k1, (cfg.d_model, cfg.n_experts)) * scale1).astype(
            jnp.float32
        ),
        "w1": (jax.random.normal(k2, (cfg.d_model, cfg.ff_total)) * scale1).astype(
            cfg.dtype
        ),
        "w2": (jax.random.normal(k3, (cfg.ff_total, cfg.d_model)) * scale2).astype(
            cfg.dtype
        ),
    }


def _route(logits: jax.Array, cfg: MoEConfig):
    """Top-1 routing with capacity slots. Returns (slot, keep, prob, aux)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    expert = jnp.argmax(probs, axis=-1)
    prob = jnp.max(probs, axis=-1)
    onehot = jax.nn.one_hot(expert, cfg.n_experts, dtype=jnp.int32)
    pos_in_expert = jnp.cumsum(onehot, axis=0) - onehot
    pos = jnp.sum(pos_in_expert * onehot, axis=-1)
    keep = pos < cfg.capacity
    slot = expert * cfg.capacity + jnp.minimum(pos, cfg.capacity - 1)
    # Standard Switch-style load-balancing auxiliary loss.
    me = jnp.mean(probs, axis=0)
    ce = jnp.mean(onehot.astype(jnp.float32), axis=0)
    aux = cfg.n_experts * jnp.sum(me * ce)
    return slot, keep, prob, aux


def _unfused_bsr_ffn(x_perm, w1, w2, cfg: MoEConfig, topology):
    h = ops.sdd(x_perm, w1, topology)  # sparse (EC, E*F)
    h = h.with_data(jax.nn.gelu(h.data.astype(jnp.float32)).astype(cfg.dtype))
    return ops.dsd(h, w2)  # (EC, d)


def _fused_bsr_ffn(x_perm, w1, w2, cfg: MoEConfig, topology, *, plan=None):
    """Differentiable fused FFN: forward through the one-kernel fused path,
    backward recomputed through the unfused sparse chain (every gradient
    stays sparse — the flash-attention trade applied to the FFN)."""
    from sputnik_tpu.kernels.bsr_ffn import fused_group_ffn

    @jax.custom_vjp
    def f(x_, w1_, w2_):
        return fused_group_ffn(
            x_, w1_, w2_, topology, activation="gelu", out_dtype=cfg.dtype,
            plan=plan,
        )

    def fwd(x_, w1_, w2_):
        return f(x_, w1_, w2_), (x_, w1_, w2_)

    def bwd(res, g):
        x_, w1_, w2_ = res
        _, vjp = jax.vjp(
            lambda x2, w12, w22: _unfused_bsr_ffn(x2, w12, w22, cfg, topology),
            x_, w1_, w2_,
        )
        return vjp(g.astype(cfg.dtype))

    f.defvjp(fwd, bwd)
    return f(x_perm, w1, w2)


def moe_forward(
    params: Dict[str, jax.Array],
    x: jax.Array,  # (tokens, d_model)
    cfg: MoEConfig,
    topology: BlockSparseMatrix,
    *,
    impl: str = "grouped",
) -> Tuple[jax.Array, jax.Array]:
    """Returns (y, aux_loss). y has x's shape.

    ``impl="grouped"`` (default): with fixed capacity the block-diagonal
    sparse matmul degenerates to a batched per-expert GEMM — one einsum
    per layer, pure MXU at peak (MegaBlocks makes the same specialization;
    its general kernels exist for the *variable*-group dropless case, which
    here is :func:`dropless_moe_forward` on the BSR kernels).
    ``impl="bsr"``: the block-sparse path — ONE fused SDD -> gelu -> DSD
    Pallas kernel for group-structured topologies (W strips read once, h
    never in HBM), unfused chain otherwise. ``impl="bsr_unfused"`` forces
    the three-kernel chain (kept measurable for the bench).
    """
    t = x.shape[0]
    # One storage-dtype MXU pass with f32 accumulation (see
    # dropless_moe_forward: the f32 .astype detour copied all of x).
    logits = jax.lax.dot_general(
        x.astype(cfg.dtype), params["router"].astype(cfg.dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    slot, keep, prob, aux = _route(logits, cfg)

    # Scatter tokens into expert capacity slots; dropped tokens go to a
    # sacrificial extra row that is sliced off. (A masked scatter-add
    # without the extra row measured ~85 us SLOWER end-to-end: XLA's
    # .add scatter pays a read-modify-write that .set does not.)
    slot_or_drop = jnp.where(keep, slot, cfg.padded_tokens)
    x_perm = jnp.zeros((cfg.padded_tokens + 1, x.shape[1]), cfg.dtype)
    x_perm = x_perm.at[slot_or_drop].set(x.astype(cfg.dtype))[: cfg.padded_tokens]

    if impl == "grouped":
        e, c, d, f = cfg.n_experts, cfg.capacity, cfg.d_model, cfg.d_ff
        xg = x_perm.reshape(e, c, d)
        w1 = params["w1"].reshape(d, e, f)
        w2 = params["w2"].reshape(e, f, d)
        h = jnp.einsum("ecd,def->ecf", xg, w1, preferred_element_type=jnp.float32)
        h = jax.nn.gelu(h).astype(cfg.dtype)
        y_perm = jnp.einsum(
            "ecf,efd->ecd", h, w2, preferred_element_type=jnp.float32
        ).reshape(e * c, d)
    elif impl == "bsr":
        # Fused SDD -> gelu -> DSD kernel when the topology is
        # group-structured (the block-diagonal MoE pattern always is);
        # W strips read once, h never hits HBM. Falls back to the unfused
        # chain for irregular topologies.
        from sputnik_tpu.kernels.bsr_ffn import plan_group_ffn

        ffn_plan = plan_group_ffn(topology)
        if ffn_plan is not None:
            y_perm = _fused_bsr_ffn(
                x_perm, params["w1"], params["w2"], cfg, topology,
                plan=ffn_plan,
            )
        else:
            y_perm = _unfused_bsr_ffn(
                x_perm, params["w1"], params["w2"], cfg, topology
            )
    elif impl == "bsr_unfused":
        y_perm = _unfused_bsr_ffn(
            x_perm, params["w1"], params["w2"], cfg, topology
        )
    else:
        raise ValueError(
            f"impl must be 'grouped', 'bsr' or 'bsr_unfused', got {impl!r}"
        )

    # Scale in the storage dtype (the f32 detour cost two extra full
    # passes; the router prob is a per-row scalar — see dropless path).
    y = jnp.take(y_perm, slot, axis=0)
    y = y * (prob * keep.astype(jnp.float32)).astype(y.dtype)[:, None]
    return y.astype(x.dtype), aux


def moe_loss(params, x, target, cfg: MoEConfig, topology) -> jax.Array:
    y, aux = moe_forward(params, x, cfg, topology)
    mse = jnp.mean((y.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return mse + cfg.router_aux_weight * aux


# ---------------------------------------------------------------------------
# Dropless MoE — variable block-diagonal topology computed inside jit
# ---------------------------------------------------------------------------


def dropless_topology(expert_rows: jax.Array, cfg: MoEConfig, max_block_rows: int) -> BlockSparseMatrix:
    """Block-diagonal topology whose group sizes are TRACED (MegaBlocks'
    dropless construction): padded block-row r of the permuted token buffer
    belongs to expert ``expert_of_row(r)`` and hits that expert's d_ff
    column blocks. Offsets are static (every row has d_ff/bs blocks), so
    the DSD/SDD static grids and hints stay intact; only the column ids are
    data-dependent — exactly what the scalar-prefetch kernels allow."""
    bs = cfg.block_size
    f_blocks = cfg.d_ff // bs
    nnz = max_block_rows * f_blocks
    offsets = np.arange(max_block_rows + 1, dtype=np.int32) * f_blocks  # static
    row_of = np.repeat(np.arange(max_block_rows, dtype=np.int32), f_blocks)
    # expert of padded block row r (rows beyond the last group clamp to E-1;
    # their token rows are zero so their blocks compute zeros).
    bounds = jnp.cumsum(expert_rows)
    expert_of_row = jnp.searchsorted(
        bounds, jnp.arange(max_block_rows, dtype=jnp.int32), side="right"
    ).astype(jnp.int32)
    expert_of_row = jnp.minimum(expert_of_row, cfg.n_experts - 1)
    col_within = np.tile(np.arange(f_blocks, dtype=np.int32), max_block_rows)
    indices = expert_of_row[row_of] * f_blocks + jnp.asarray(col_within)
    data = jnp.zeros((nnz, bs, bs), cfg.dtype)
    return BlockSparseMatrix.create(
        data,
        jnp.asarray(offsets),
        indices,
        (max_block_rows * bs, cfg.ff_total),
        row_indices=jnp.asarray(row_of),
        max_row_nnz=f_blocks,
    )


def _int_cotangent(x):
    return np.zeros(np.shape(x), jax.dtypes.float0)


def _fused_dropless_diff(x_perm, w1, w2, e_of_row, expert_rows,
                         cfg: MoEConfig, max_block_rows: int):
    """Differentiable fused dropless FFN: forward through the one-kernel
    path, backward recomputed through the unfused traced-topology chain
    (every gradient sparse)."""
    from sputnik_tpu.kernels.bsr_ffn import fused_dropless_ffn

    @jax.custom_vjp
    def f(x_, w1_, w2_, e_row_, e_rows_):
        tile_rows = x_.shape[0] // e_row_.shape[0]
        # Actual routed tiles this step (traced): tiles past it skip all
        # compute in the kernel; their rows are never gathered by `dest`.
        live = (jnp.sum(e_rows_) * cfg.block_size) // tile_rows
        return fused_dropless_ffn(
            x_, w1_, w2_, e_row_, cfg.d_ff, bs=cfg.block_size,
            tile_rows=tile_rows, live_rows=live,
            activation="gelu", out_dtype=cfg.dtype,
        )

    def fwd(x_, w1_, w2_, e_row_, e_rows_):
        return f(x_, w1_, w2_, e_row_, e_rows_), (x_, w1_, w2_, e_row_, e_rows_)

    def bwd(res, g):
        x_, w1_, w2_, e_row_, e_rows_ = res
        topo = dropless_topology(e_rows_, cfg, max_block_rows)

        def unfused(x2, w12, w22):
            h = ops.sdd(x2, w12, topo)
            h = h.with_data(
                jax.nn.gelu(h.data.astype(jnp.float32)).astype(cfg.dtype)
            )
            return ops.dsd(h, w22)

        _, vjp = jax.vjp(unfused, x_, w1_, w2_)
        dx, dw1, dw2 = vjp(g.astype(cfg.dtype))
        return dx, dw1, dw2, _int_cotangent(e_row_), _int_cotangent(e_rows_)

    f.defvjp(fwd, bwd)
    return f(x_perm, w1, w2, e_of_row, expert_rows)


def dropless_moe_forward(
    params: Dict[str, jax.Array],
    x: jax.Array,  # (tokens, d_model)
    cfg: MoEConfig,
    *,
    impl: str = "ragged",
    row_group: int | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Dropless top-1 MoE FFN: NO capacity, no dropped tokens. Every expert's
    token group is padded up to a block multiple; the total padded rows are
    statically bounded by tokens + n_experts * block (XLA-safe), and the
    block-diagonal topology's metadata is computed on device per step.
    Reference behavior: MegaBlocks (arXiv 2211.15841) on top of the
    reference's BSR kernels.
    """
    t = x.shape[0]
    bs = cfg.block_size
    e = cfg.n_experts
    # bsr_fused pads expert groups to row_group block rows: the fused
    # kernel's W traffic is (padded tiles) x W_expert, so wider tiles trade
    # worst-case static padding for W bytes. Round-3 sweep on v5e at the
    # bench config: 469/461/483/537 us at row_group 1/2/3/4 — the static
    # pad tiles dominate past 2, so 2 stays the default and the kernel now
    # skips compute on tiles past the step's ACTUAL routed total
    # (live_rows), which is where the real headroom was.
    if row_group is None:
        row_group = 2 if impl == "bsr_fused" else 1
    max_block_rows = (-(-t // bs) // row_group + e) * row_group  # static
    t_pad = max_block_rows * bs

    # Route with ONE bf16 MXU pass + f32 accumulation: the f32 .astype
    # detour materialized a full (tokens, d_model) f32 copy of x AND ran
    # the slow f32 MXU path (~30-40 us of the round-3 glue budget). The
    # logits accumulate in f32; only the operands are storage-rounded,
    # the standard production-MoE routing precision.
    logits = jax.lax.dot_general(
        x.astype(cfg.dtype), params["router"].astype(cfg.dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    probs = jax.nn.softmax(logits, axis=-1)
    expert = jnp.argmax(probs, axis=-1)
    prob = jnp.max(probs, axis=-1)
    onehot = jax.nn.one_hot(expert, e, dtype=jnp.int32)
    counts = jnp.sum(onehot, axis=0)
    expert_rows = -(-counts // bs)  # padded block rows per expert (traced)
    if row_group > 1:
        expert_rows = -(-expert_rows // row_group) * row_group
    group_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(expert_rows[:-1]).astype(jnp.int32)]
    ) * bs
    pos_in_expert = jnp.sum((jnp.cumsum(onehot, axis=0) - onehot) * onehot, axis=-1)
    dest = group_start[expert] + pos_in_expert  # always < t_pad (no drops)

    # Permute by GATHER, not payload scatter: scatter only the int32 source
    # map (16 KB vs 4 MB), then one fused gather pass builds x_perm
    # (measured round-2: .set scatter beats .add, and this beats .set by
    # skipping the dense zero fill). Padding slots CLAMP to a real token
    # instead of reading an appended zero row (round-3: drops the
    # concatenate's extra copy of x): their FFN outputs are never gathered
    # back (dest only maps real tokens) and their cotangents are exactly
    # zero (the FFN is row-wise), so no value or gradient leaks.
    src = jnp.full((t_pad,), t - 1, jnp.int32).at[dest].set(
        jnp.arange(t, dtype=jnp.int32)
    )
    x_perm = x.astype(cfg.dtype)[src]
    if impl == "ragged":
        # TPU-native variable-group grouped GEMM: XLA's ragged matmul keeps
        # the MXU at peak with traced group sizes — the dropless case that
        # motivated MegaBlocks' kernels, expressed as one primitive.
        group_sizes = (expert_rows * bs).astype(jnp.int32)
        w1 = jnp.transpose(
            params["w1"].reshape(cfg.d_model, e, cfg.d_ff), (1, 0, 2)
        )
        w2 = params["w2"].reshape(e, cfg.d_ff, cfg.d_model)
        h = jax.lax.ragged_dot(x_perm, w1, group_sizes)
        h = jax.nn.gelu(h.astype(jnp.float32)).astype(cfg.dtype)
        y_perm = jax.lax.ragged_dot(h, w2, group_sizes)
    elif impl == "bsr":
        topo = dropless_topology(expert_rows, cfg, max_block_rows)
        h = ops.sdd(x_perm, params["w1"], topo)
        h = h.with_data(jax.nn.gelu(h.data.astype(jnp.float32)).astype(cfg.dtype))
        y_perm = ops.dsd(h, params["w2"])
    elif impl == "bsr_fused":
        # ONE kernel; the variable block-diagonal topology is consumed as
        # the TRACED per-row expert id (scalar prefetch) — true dropless
        # with per-step on-device topology, MegaBlocks' headline case.
        bounds = jnp.cumsum(expert_rows)
        # expert id per KERNEL TILE (row_group block rows each; groups are
        # padded to row_group multiples so tiles never straddle experts).
        tile_first_row = jnp.arange(
            max_block_rows // row_group, dtype=jnp.int32
        ) * row_group
        e_of_row = jnp.searchsorted(
            bounds, tile_first_row, side="right"
        ).astype(jnp.int32)
        e_of_row = jnp.minimum(e_of_row, e - 1)
        y_perm = _fused_dropless_diff(
            x_perm, params["w1"], params["w2"], e_of_row, expert_rows,
            cfg, max_block_rows,
        )
    else:
        raise ValueError(
            f"impl must be 'ragged', 'bsr' or 'bsr_fused', got {impl!r}"
        )

    # Scale in the storage dtype: the f32 detour materialized 2 extra
    # (tokens, d_model) fp32 passes (~25 us of the round-3 glue budget);
    # the router prob is a per-row scalar, bf16 multiply loses nothing
    # beyond the storage rounding the output gets anyway.
    y = jnp.take(y_perm, dest, axis=0) * prob.astype(y_perm.dtype)[:, None]
    me = jnp.mean(probs, axis=0)
    ce = jnp.mean(onehot.astype(jnp.float32), axis=0)
    aux = e * jnp.sum(me * ce)
    return y.astype(x.dtype), aux
