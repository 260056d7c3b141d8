"""Ring block-sparse attention: context parallelism for sequences too long
to all-gather K/V.

`parallel/attention.py` shards queries and gathers K/V — fine until K/V
stop fitting. Here K/V stay sequence-sharded and ROTATE around the ring
(`ppermute` over ICI) while each query shard folds one K/V band per step
into a flash-style online softmax state (m, l, acc). Comm per device per
step = one K/V band; memory = one band + O(T_local * dh) state. The score
topology is partitioned into an (S x S) band grid on the host; each
(query-band, kv-band) cell is a small local BSR whose blocks are computed
with the standard SDD kernel and folded with numerically-stable
logsumexp merging — empty cells (banded topologies have many) cost one
masked no-op step.

Two band-fold paths:

  * ``fused=True`` (default): each band folds through ONE Pallas kernel
    (``flash_band_fold`` — the fused flash kernel threading UNnormalized
    (acc, m, l) state across ring steps). ``causal=True`` applies exact
    elementwise causal masking: block ids are rebased to GLOBAL
    coordinates inside the kernel, so diagonal blocks get the intra-block
    triangle and the result matches single-device causal attention.
  * ``fused=False``: the verified unfused chain (SDD + segment stats +
    DSD) with block-granular masking from the topology pattern only.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sputnik_tpu.formats import BlockSparseMatrix
from sputnik_tpu.ops.matmul import matmul_dsd, matmul_sdd

__all__ = ["RingTopology", "partition_topology_ring", "ring_block_sparse_attention"]

_NEG = -1e30


class RingTopology:
    """(S x S) band grid of a score topology, shard-stacked (host-built).

    ``rows/cols``: (S, S, P) int32 — cell (i, j) holds query-band i's
    blocks over kv-band j, row/col ids rebased into the bands, padded to
    the global max cell size P (padding slots duplicate the cell's LAST
    real slot, keeping rows non-decreasing for the DSD stream kernel, and
    are masked via ``valid``). ``valid``: (S, S) int32 real block counts.
    """

    def __init__(self, rows, cols, valid, n_shards, band_blocks, block_size):
        self.rows = rows
        self.cols = cols
        self.valid = valid
        self.n_shards = n_shards
        self.band_blocks = band_blocks
        self.block_size = block_size


def partition_topology_ring(topology: BlockSparseMatrix, n_shards: int) -> RingTopology:
    """Partition a (T, T)-block topology into the (S x S) band grid."""
    if topology.block_rows % n_shards or topology.block_cols % n_shards:
        raise ValueError(
            f"block grid {topology.block_rows}x{topology.block_cols} not "
            f"divisible by {n_shards}"
        )
    band = topology.block_rows // n_shards
    ri = np.asarray(topology.row_indices)
    ci = np.asarray(topology.indices)
    bi, bj = ri // band, ci // band
    cells = [[None] * n_shards for _ in range(n_shards)]
    p = 1
    for i in range(n_shards):
        for j in range(n_shards):
            sel = (bi == i) & (bj == j)
            cells[i][j] = (ri[sel] - i * band, ci[sel] - j * band)
            p = max(p, int(sel.sum()))
    rows = np.zeros((n_shards, n_shards, p), np.int32)
    cols = np.zeros((n_shards, n_shards, p), np.int32)
    valid = np.zeros((n_shards, n_shards), np.int32)
    for i in range(n_shards):
        for j in range(n_shards):
            r, c = cells[i][j]
            n = len(r)
            valid[i, j] = n
            rows[i, j, :n] = r
            cols[i, j, :n] = c
            if n:
                # Pad by duplicating the LAST real slot so the row ids stay
                # non-decreasing — the DSD stream kernel's contract. Zero
                # padding would revisit output block-row 0 after the real
                # rows and overwrite it with the masked (zero) contribution.
                rows[i, j, n:] = r[-1]
                cols[i, j, n:] = c[-1]
    return RingTopology(
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(valid),
        n_shards, band, topology.block_size,
    )


def _band_fold(q_l, k_band, v_band, rows, cols, valid, band_blocks, bs, scale, state):
    """Fold one K/V band into the (acc, m, l) online-softmax state."""
    acc, m, l = state
    t_local = q_l.shape[0]
    p = rows.shape[0]
    offsets = jnp.concatenate(
        [
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(
                jnp.zeros((band_blocks,), jnp.int32).at[rows].add(1)
            ).astype(jnp.int32),
        ]
    )
    topo = BlockSparseMatrix(
        data=jnp.zeros((p, bs, bs), q_l.dtype),
        offsets=offsets,
        indices=cols,
        row_indices=rows,
        offsets_t=None,
        indices_t=None,
        block_offsets=None,
        shape=(t_local, band_blocks * bs),
        block_size=bs,
    )
    scores = matmul_sdd(q_l, k_band, topo, transpose_b=True)
    sdata = scores.data.astype(jnp.float32) * scale
    # Mask cell-padding blocks (duplicates of the last real slot) to -inf.
    ok = (jnp.arange(p) < valid)[:, None, None]
    sdata = jnp.where(ok, sdata, _NEG)
    # Band row stats.
    blk_max = jnp.max(sdata, axis=2)  # (p, bs)
    m_band = jax.ops.segment_max(blk_max, rows, num_segments=band_blocks)
    m_band = jnp.maximum(m_band, _NEG).reshape(-1)  # (t_local,)
    m_new = jnp.maximum(m, m_band)
    e = jnp.exp(sdata - m_new.reshape(band_blocks, bs)[rows][:, :, None])
    # Rows that have seen no valid block anywhere still carry m_new = -1e30,
    # where a padded block's exp(-1e30 - (-1e30)) = 1 would leak in: mask.
    e = jnp.where(ok, e, 0.0)
    l_band = jax.ops.segment_sum(
        jnp.sum(e, axis=2), rows, num_segments=band_blocks
    ).reshape(-1)
    o_band = matmul_dsd(
        scores.with_data(e.astype(q_l.dtype)), v_band, out_dtype=jnp.float32
    )
    corr = jnp.exp(m - m_new)
    acc = acc * corr[:, None] + o_band
    l = l * corr + l_band
    return acc, m_new, l


def ring_block_sparse_attention(
    q: jax.Array,  # (T, dh) — sharded over the mesh axis
    k: jax.Array,  # (T, dh) — sharded
    v: jax.Array,  # (T, dh) — sharded
    topology: RingTopology,
    mesh: Mesh,
    *,
    axis: str = "x",
    scale: Optional[float] = None,
    causal: bool = False,
    fused: bool = True,
) -> jax.Array:
    """Ring attention over ``mesh[axis]``; all of q/k/v stay sharded.

    ``causal=True`` (fused path only) masks each score block to the exact
    global causal triangle — with a block-lower-triangular topology the
    result equals single-device elementwise-causal attention.
    """
    if scale is None:
        scale = 1.0 / float(np.sqrt(q.shape[-1]))
    if causal and not fused:
        raise ValueError("causal masking requires the fused band fold")
    s = topology.n_shards
    bs = topology.block_size
    band_blocks = topology.band_blocks
    dh = q.shape[1]
    p = topology.rows.shape[-1]

    from sputnik_tpu.kernels.flash_attention import flash_band_fold

    def local(q_l, k_l, v_l, rows_l, cols_l, valid_l):
        i = jax.lax.axis_index(axis)
        t_local = q_l.shape[0]
        k_buf, v_buf = k_l, v_l
        perm = [(a, (a + 1) % s) for a in range(s)]
        if fused:
            acc = jnp.zeros((t_local, dh), jnp.float32)
            m = jnp.full((t_local, 128), _NEG, jnp.float32)
            l = jnp.zeros((t_local, 128), jnp.float32)
            slot = jnp.arange(p, dtype=jnp.int32)
            for r in range(s):
                j = (i - r) % s  # kv band currently held
                flags = (slot < valid_l[0, j]).astype(jnp.int32)
                acc, m, l = flash_band_fold(
                    q_l, k_buf, v_buf,
                    rows_l[0, j], cols_l[0, j], flags,
                    (acc, m, l),
                    bs=bs, scale=scale, causal=causal,
                    row_offset_blocks=i * band_blocks,
                    col_offset_blocks=j * band_blocks,
                )
                if r != s - 1:
                    k_buf = jax.lax.ppermute(k_buf, axis, perm)
                    v_buf = jax.lax.ppermute(v_buf, axis, perm)
            l_col = l[:, 0:1]
            out = acc / jnp.maximum(l_col, 1e-30)
            return jnp.where(l_col > 0, out, 0.0).astype(q_l.dtype)
        acc = jnp.zeros((t_local, dh), jnp.float32)
        m = jnp.full((t_local,), _NEG, jnp.float32)
        l = jnp.zeros((t_local,), jnp.float32)
        for r in range(s):
            j = (i - r) % s  # kv band currently held
            acc, m, l = _band_fold(
                q_l,
                k_buf,
                v_buf,
                rows_l[0, j],
                cols_l[0, j],
                valid_l[0, j],
                band_blocks,
                bs,
                scale,
                (acc, m, l),
            )
            if r != s - 1:
                k_buf = jax.lax.ppermute(k_buf, axis, perm)
                v_buf = jax.lax.ppermute(v_buf, axis, perm)
        out = acc / jnp.maximum(l, 1e-30)[:, None]
        # Rows with no blocks anywhere: l == 0 -> zero output.
        return jnp.where((l > 0)[:, None], out, 0.0).astype(q_l.dtype)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(q, k, v, topology.rows, topology.cols, topology.valid)
