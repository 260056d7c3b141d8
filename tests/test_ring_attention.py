"""Ring (context-parallel) block-sparse attention vs the single-device chain.

Coverage map (kept lean — interpret-mode ring folds are the slowest tests
in the suite):
  * fused band-fold path (the default): band + random topologies, jit,
    empty rows, exact elementwise-causal at dh=128.
  * unfused chain (fused=False): one band case + the dh=128 random-topology
    regression (zero-padded cell slots used to violate the DSD stream
    kernel's non-decreasing row contract and overwrite block-row 0; dh=64
    silently falls back to the jnp reference, so the regression needs 128).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from sputnik_tpu import parallel
from sputnik_tpu.parallel.ring_attention import (
    partition_topology_ring,
    ring_block_sparse_attention,
)
from sputnik_tpu.models import attention as attn
from sputnik_tpu.utils import testing
from sputnik_tpu.utils.testing import ATOL


@pytest.fixture
def mesh():
    return Mesh(np.array(jax.devices()[:4]), ("x",))


def _qkv(rng, seq, dh):
    return tuple(
        jnp.asarray(rng.standard_normal((seq, dh)).astype(np.float32))
        for _ in range(3)
    )


@pytest.mark.parametrize("topo_kind", ["band"])
def test_ring_matches_single_device(rng, mesh, topo_kind):
    seq, dh = 4 * 256, 64
    if topo_kind == "band":
        topo = attn.band_topology(seq, 3, 128, dtype=jnp.float32)
    else:
        topo = testing.random_bsr(rng, seq, seq, seq * seq // 4, 128)
    ring_topo = partition_topology_ring(topo, 4)
    q, k, v = _qkv(rng, seq, dh)
    out = ring_block_sparse_attention(q, k, v, ring_topo, mesh)
    expected = attn.block_sparse_attention(q, k, v, topo)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expected, np.float32), atol=ATOL
    )


@pytest.mark.parametrize("dh", [64, 128])
def test_ring_unfused_path(rng, mesh, dh):
    """fused=False band folds through the unfused SDD/DSD chain. dh=128
    exercises the Pallas DSD stream kernel (cell-padding regression)."""
    seq = 4 * 256
    topo = testing.random_bsr(rng, seq, seq, seq * seq // 4, 128)
    ring_topo = partition_topology_ring(topo, 4)
    q, k, v = _qkv(rng, seq, dh)
    out = ring_block_sparse_attention(q, k, v, ring_topo, mesh, fused=False)
    expected = attn.block_sparse_attention(q, k, v, topo)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expected, np.float32), atol=ATOL
    )


def test_ring_causal_elementwise(rng, mesh):
    """Exact elementwise-causal ring attention: global diagonal blocks get
    the intra-block triangle (round-1 limitation removed)."""
    seq, dh = 4 * 256, 128
    topo = attn.causal_block_topology(seq, 128, window_blocks=4, dtype=jnp.float32)
    ring_topo = partition_topology_ring(topo, 4)
    q, k, v = _qkv(rng, seq, dh)
    out = ring_block_sparse_attention(q, k, v, ring_topo, mesh, causal=True)
    expected = attn.block_sparse_attention(q, k, v, topo, causal=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expected, np.float32), atol=ATOL
    )
    with pytest.raises(ValueError, match="causal"):
        ring_block_sparse_attention(
            q, k, v, ring_topo, mesh, causal=True, fused=False
        )


def test_ring_empty_rows(rng, mesh):
    """Query rows with no blocks anywhere must come out exactly zero."""
    seq, dh = 4 * 256, 64
    ones = np.ones((128, 128), np.float32)
    # Only block-row 0 attends (to columns 0 and 5).
    topo = testing.bsr_from_blocks(seq, seq, [0, 0], [0, 5], np.stack([ones] * 2))
    ring_topo = partition_topology_ring(topo, 4)
    q, k, v = _qkv(rng, seq, dh)
    out = np.asarray(ring_block_sparse_attention(q, k, v, ring_topo, mesh))
    assert np.all(out[128:] == 0)
    expected = np.asarray(attn.block_sparse_attention(q, k, v, topo), np.float32)
    np.testing.assert_allclose(out, expected, atol=ATOL)


def test_ring_under_jit(rng, mesh):
    seq, dh = 4 * 128, 64
    topo = attn.band_topology(seq, 2, 128, dtype=jnp.float32)
    ring_topo = partition_topology_ring(topo, 4)
    q, k, v = _qkv(rng, seq, dh)

    @jax.jit
    def run(q_, k_, v_):
        return ring_block_sparse_attention(q_, k_, v_, ring_topo, mesh)

    out = run(q, k, v)
    expected = attn.block_sparse_attention(q, k, v, topo)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expected, np.float32), atol=ATOL
    )


def test_partition_misaligned_raises(rng):
    topo = testing.random_bsr(rng, 3 * 128, 3 * 128, 3 * 128 * 128, 128)
    with pytest.raises(ValueError, match="divisible"):
        partition_topology_ring(topo, 4)
