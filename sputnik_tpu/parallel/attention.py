"""Sequence-parallel block-sparse attention over a device mesh.

The long-context / sequence-parallel subsystem (SURVEY.md §5: absent from
the reference; the closest structure there is SDD's output-stationary
decomposition, which is exactly what block-sparse attention shards on).

Design: shard the QUERY sequence dimension. The score topology is
row-partitioned with the queries (each device owns the score block-rows of
its query band), so SDD, the row softmax, and the DSD against V are all
LOCAL — row softmax never crosses shards. K/V move instead of scores:

  * ``kv_replicated=True``  — K/V replicated; zero communication.
  * ``kv_replicated=False`` — K/V sequence-sharded; each device
    ``all_gather``s them over ICI before its local chain (XLA pipelines the
    gather against the first SDD steps). For a banded topology the gather
    is the halo exchange of the survey's design note. For contexts too long
    to gather at all, use ``parallel/ring_attention.py``: K/V bands
    ``ppermute`` around the ring with online-softmax merging.

Causal masking composes: ``causal=True`` masks each 128-block on the
GLOBAL diagonal — the local topology's row ids are offset by the query
band, which ``bsr_softmax`` sees through pre-offset row indices, so we
mask inside the local call by shifting the topology's diagonal instead.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sputnik_tpu.formats import BlockSparseMatrix
from sputnik_tpu.ops.matmul import matmul_dsd, matmul_sdd
from sputnik_tpu.ops.softmax import bsr_softmax
from sputnik_tpu.parallel.sharding import (
    ShardedBlockSparseMatrix,
    partition_bsr_rows,
    _local_bsr,
)

__all__ = ["sharded_block_sparse_attention", "partition_topology_rows"]


def partition_topology_rows(
    topology: BlockSparseMatrix, n_shards: int
) -> ShardedBlockSparseMatrix:
    """Row-partition a score topology with the query bands (host-side)."""
    return partition_bsr_rows(topology, n_shards)


def sharded_block_sparse_attention(
    q: jax.Array,  # (T, dh) — sharded over the mesh axis
    k: jax.Array,  # (T, dh)
    v: jax.Array,  # (T, dh)
    topology: ShardedBlockSparseMatrix,
    mesh: Mesh,
    *,
    axis: str = "x",
    kv_replicated: bool = True,
    causal: bool = False,
    scale: Optional[float] = None,
    fused: bool = True,
) -> jax.Array:
    """Sequence-parallel single-head block-sparse attention.

    Returns the attention output sharded over the query dimension like
    ``q``. Compute per device ~ O(local nnz_blocks * 128^2 * dh); comm is
    zero (replicated K/V) or one K/V all-gather (sequence-sharded K/V).

    ``fused=True`` runs each device's local chain through ONE flash
    band-fold kernel (scores never materialize; exact elementwise causal
    at global coordinates); ``fused=False`` keeps the verified unfused
    SDD -> softmax -> DSD chain.
    """
    if scale is None:
        scale = 1.0 / float(np.sqrt(q.shape[-1]))
    n_shards = topology.n_shards
    local_block_rows = (topology.shape[0] // n_shards) // topology.block_size
    bs = topology.block_size
    dh = q.shape[-1]

    def local(q_l, k_l, v_l, data, offsets, indices, row_indices, vc):
        topo_l = _local_bsr(topology, data, offsets, indices, row_indices)
        if kv_replicated:
            k_full, v_full = k_l, v_l
        else:
            k_full = jax.lax.all_gather(k_l, axis, axis=0, tiled=True)
            v_full = jax.lax.all_gather(v_l, axis, axis=0, tiled=True)
        if fused:
            from sputnik_tpu.kernels.flash_attention import flash_band_fold

            t_local = q_l.shape[0]
            shard = jax.lax.axis_index(axis)
            nnz_local = topo_l.data.shape[0]
            flags = (
                jnp.arange(nnz_local, dtype=jnp.int32) < vc[0]
            ).astype(jnp.int32)
            state = (
                jnp.zeros((t_local, dh), jnp.float32),
                jnp.full((t_local, 128), -1e30, jnp.float32),
                jnp.zeros((t_local, 128), jnp.float32),
            )
            acc, _m, l = flash_band_fold(
                q_l, k_full, v_full,
                topo_l.row_indices, topo_l.indices, flags,
                state, bs=bs, scale=scale, causal=causal,
                row_offset_blocks=shard * local_block_rows,
                col_offset_blocks=0,
            )
            l_col = l[:, 0:1]
            out = acc / jnp.maximum(l_col, 1e-30)
            return jnp.where(l_col > 0, out, 0.0).astype(q_l.dtype)
        scores = matmul_sdd(q_l, k_full, topo_l, transpose_b=True)
        # Shard-padding blocks are duplicate slots: SDD WRITES scores into
        # them, which would double-count in the row softmax. Mask to -inf
        # so they carry zero probability (and add zero in the DSD).
        nnz_local = scores.data.shape[0]
        pad_mask = (
            jnp.arange(nnz_local, dtype=jnp.int32) < vc[0]
        )[:, None, None]
        scores = scores.with_data(
            jnp.where(pad_mask, scores.data, jnp.asarray(-jnp.inf, scores.dtype))
        )
        if causal:
            # Shift local row ids to global so the diagonal lands right.
            shard = jax.lax.axis_index(axis)
            topo_g = topo_l.__class__(
                data=scores.data,
                offsets=topo_l.offsets,
                indices=topo_l.indices,
                row_indices=topo_l.row_indices + shard * local_block_rows,
                offsets_t=None,
                indices_t=None,
                block_offsets=None,
                shape=(topology.shape[0], topology.shape[1]),
                block_size=topology.block_size,
            )
            probs_g = bsr_softmax(topo_g, scale=scale, causal=True)
            probs = topo_l.with_data(probs_g.data)
        else:
            probs = bsr_softmax(scores, scale=scale)
        return matmul_dsd(probs, v_full, out_dtype=q_l.dtype)

    valid_counts = topology.valid_counts
    if valid_counts is None:  # pre-valid_counts pytrees: everything is real
        valid_counts = jnp.full(
            (topology.n_shards,), topology.data.shape[1], jnp.int32
        )
    kv_spec = P() if kv_replicated else P(axis)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(axis), kv_spec, kv_spec, P(axis), P(axis), P(axis), P(axis), P(axis),
        ),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(
        q, k, v, topology.data, topology.offsets, topology.indices,
        topology.row_indices, valid_counts,
    )
