"""Bytes-on-the-wire accounting (parallel.comm_audit) on the CPU mesh.

Validates that the compiled-HLO byte counts match the closed-form ring
costs for the two comm patterns the distributed layer uses: the dense
all-gather (row-partitioned SpMM with K-sharded B) and the reduce-scatter
(contraction-sharded SpMM)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from sputnik_tpu import parallel
from sputnik_tpu.utils import testing


@pytest.fixture
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("x",))


@pytest.mark.smoke
def test_allgather_bytes_match_ring_model(rng, mesh):
    S, cols, n = 8, 1024, 256
    a = testing.random_bsr(rng, 1024, cols, int(1024 * cols * 0.25), 128)
    sh = parallel.partition_bsr_rows(a, S)
    b = jnp.asarray(rng.standard_normal((cols, n)).astype(np.float32))
    rep = parallel.collective_bytes(
        lambda b_: parallel.sharded_dsd(sh, b_, mesh, b_sharded_k=True),
        b, group_size=S,
    )
    assert rep["by_kind"] == {"all-gather": (S - 1) * cols * n * 4 // S}
    assert all(o["group_size"] == S for o in rep["ops"])


@pytest.mark.smoke
def test_reduce_scatter_bytes_match_ring_model(rng, mesh):
    S, n = 8, 64
    rows, cols = 8 * 128, 8 * 256
    c = testing.random_csr(rng, rows, cols, int(rows * cols * 0.1))
    shc = parallel.partition_sell_cols(c, S)
    b = jnp.asarray(rng.standard_normal((cols, n)).astype(np.float32))
    rep = parallel.collective_bytes(
        lambda b_: parallel.sharded_spmm_kshard(shc, b_, mesh),
        b, group_size=S,
    )
    assert rep["by_kind"] == {"reduce-scatter": (S - 1) * (rows // S) * n * 4}


def test_no_collectives_when_replicated(rng, mesh):
    """The zero-comm configuration really is zero-comm in the HLO."""
    S, cols, n = 8, 1024, 256
    a = testing.random_bsr(rng, 1024, cols, int(1024 * cols * 0.25), 128)
    sh = parallel.partition_bsr_rows(a, S)
    b = jnp.asarray(rng.standard_normal((cols, n)).astype(np.float32))
    rep = parallel.collective_bytes(
        lambda b_: parallel.sharded_dsd(sh, b_, mesh, b_sharded_k=False),
        b, group_size=S,
    )
    assert rep["total_wire_bytes_per_device"] == 0


@pytest.mark.smoke
def test_ring_spmm_bytes_match_allgather_total(rng, mesh):
    """The ring schedule moves exactly the all-gather's wire bytes — S-1
    point-to-point permutes of one K-band each — while holding only one
    band resident (the sharded_dsd_ring docstring claim, CI-pinned)."""
    S, k, n = 8, 1024, 256
    a = testing.random_bsr(rng, 1024, k, int(1024 * k * 0.25), 128)
    banded = parallel.partition_bsr_rows_kbands(a, S)
    b = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    rep = parallel.collective_bytes(
        lambda b_: parallel.sharded_dsd_ring(banded, b_, mesh),
        b, group_size=S,
    )
    band_bytes = (k // S) * n * 4
    assert rep["by_kind"] == {"collective-permute": (S - 1) * band_bytes}
    assert len([o for o in rep["ops"] if o["kind"] == "collective-permute"]) == S - 1
