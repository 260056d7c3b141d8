"""Flat-work-list (exact schedule) SSD / SDS / DSS kernel tests.

Covers: all four transpose modes vs the fp64 dense oracle, explicit
pre-planned schedules passed through a jit boundary (the ``MatmulEx``
discipline), empty output rows/columns (unvisited blocks must be zeroed),
unordered column indices, and plan-inside-jit rejection.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sputnik_tpu import ops
from sputnik_tpu.kernels import bsr_flat as plan_flat
from sputnik_tpu.kernels import reference
from sputnik_tpu.utils import testing
from sputnik_tpu.utils.testing import ATOL

BS = 128
MODES = [(False, False), (False, True), (True, False), (True, True)]

PROBLEMS = [
    (256, 256, 256, 1.0, False),
    (512, 512, 256, 0.5, False),
    (512, 256, 512, 0.25, True),   # unordered column indices
    (768, 512, 640, 0.125, False),  # uneven rows, sparse
]


def _mk(rng, rows, cols, density, unordered, dtype=jnp.float32):
    nnz = int(rows * cols * density)
    return testing.random_bsr(
        rng, rows, cols, max(nnz, BS * BS), BS, unordered=unordered, dtype=dtype
    )


def _dims(m, k, n, ta, tb):
    return ((k, m) if ta else (m, k)), ((n, k) if tb else (k, n))


@pytest.mark.parametrize("ta,tb", MODES)
@pytest.mark.parametrize("m,k,n,density,unordered", PROBLEMS)
def test_ssd_flat(rng, m, k, n, density, unordered, ta, tb):
    a_shape, b_shape = _dims(m, k, n, ta, tb)
    a = _mk(rng, *a_shape, density, unordered)
    b = jnp.asarray(rng.standard_normal(b_shape).astype(np.float32))
    topo = _mk(rng, m, n, density, unordered)
    out = ops.matmul_ssd(
        a, b, topo, transpose_a=ta, transpose_b=tb, variant="pallas_flat_schedule"
    )
    full = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b), transpose_a=ta, transpose_b=tb
    )
    expected = np.asarray(
        reference.extract_blocks(jnp.asarray(full.astype(np.float32)), topo)
    )
    np.testing.assert_allclose(np.asarray(out.data, np.float32), expected, atol=ATOL)


@pytest.mark.parametrize("ta,tb", MODES)
@pytest.mark.parametrize("m,k,n,density,unordered", PROBLEMS)
def test_sds_flat(rng, m, k, n, density, unordered, ta, tb):
    a_shape, b_shape = _dims(m, k, n, ta, tb)
    a = jnp.asarray(rng.standard_normal(a_shape).astype(np.float32))
    b = _mk(rng, *b_shape, density, unordered)
    topo = _mk(rng, m, n, density, unordered)
    out = ops.matmul_sds(
        a, b, topo, transpose_a=ta, transpose_b=tb, variant="pallas_flat_schedule"
    )
    full = testing.dense_oracle_matmul(
        np.asarray(a), np.asarray(b.to_dense()), transpose_a=ta, transpose_b=tb
    )
    expected = np.asarray(
        reference.extract_blocks(jnp.asarray(full.astype(np.float32)), topo)
    )
    np.testing.assert_allclose(np.asarray(out.data, np.float32), expected, atol=ATOL)


@pytest.mark.parametrize("ta,tb", MODES)
@pytest.mark.parametrize("m,k,n,density,unordered", PROBLEMS)
def test_dss_flat(rng, m, k, n, density, unordered, ta, tb):
    a_shape, b_shape = _dims(m, k, n, ta, tb)
    a = _mk(rng, *a_shape, density, unordered)
    b = _mk(rng, *b_shape, density, unordered)
    out = ops.matmul_dss(
        a, b, transpose_a=ta, transpose_b=tb, variant="pallas_flat_schedule"
    )
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b.to_dense()),
        transpose_a=ta, transpose_b=tb,
    )
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=ATOL)


@pytest.mark.parametrize("ta,tb", MODES)
def test_flat_kcat_variants(rng, ta, tb):
    """Depth-concat flat schedule: the group's dots fused into ONE dot of
    contraction depth group*bs, padding slots masked by zeroing the stream
    block. Must match the per-dot flat path exactly in all three ops."""
    m, k, n = 640, 384, 512
    a_shape, b_shape = _dims(m, k, n, ta, tb)
    a = _mk(rng, *a_shape, 0.2, True)
    bd = jnp.asarray(rng.standard_normal(b_shape).astype(np.float32))
    bsp = _mk(rng, *b_shape, 0.2, True)
    ad = jnp.asarray(rng.standard_normal(a_shape).astype(np.float32))
    topo = _mk(rng, m, n, 0.2, True)

    out = ops.matmul_ssd(
        a, bd, topo, transpose_a=ta, transpose_b=tb, variant="pallas_flat_kcat"
    )
    full = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(bd), transpose_a=ta, transpose_b=tb
    )
    expected = np.asarray(
        reference.extract_blocks(jnp.asarray(full.astype(np.float32)), topo)
    )
    np.testing.assert_allclose(np.asarray(out.data, np.float32), expected, atol=ATOL)

    out = ops.matmul_sds(
        ad, bsp, topo, transpose_a=ta, transpose_b=tb,
        variant="pallas_flat_kcat",
    )
    full = testing.dense_oracle_matmul(
        np.asarray(ad), np.asarray(bsp.to_dense()), transpose_a=ta,
        transpose_b=tb,
    )
    expected = np.asarray(
        reference.extract_blocks(jnp.asarray(full.astype(np.float32)), topo)
    )
    np.testing.assert_allclose(np.asarray(out.data, np.float32), expected, atol=ATOL)

    out = ops.matmul_dss(
        a, bsp, transpose_a=ta, transpose_b=tb, variant="pallas_flat_kcat"
    )
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(bsp.to_dense()),
        transpose_a=ta, transpose_b=tb,
    )
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=ATOL)


def test_explicit_schedule_through_jit(rng):
    """Pre-planned schedules are pytrees: jit over them, traced metadata."""
    m = k = n = 512
    a = _mk(rng, m, k, 0.25, False)
    b = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    topo = _mk(rng, m, n, 0.25, False)
    sched = ops.plan_ssd(a, topo)

    @jax.jit
    def run(a_, b_, topo_, sched_):
        return ops.matmul_ssd(a_, b_, topo_, schedule=sched_).data

    got = run(a, b, topo, sched)
    full = testing.dense_oracle_matmul(np.asarray(a.to_dense()), np.asarray(b))
    expected = np.asarray(
        reference.extract_blocks(jnp.asarray(full.astype(np.float32)), topo)
    )
    np.testing.assert_allclose(np.asarray(got, np.float32), expected, atol=ATOL)


def test_dss_explicit_schedule_through_jit(rng):
    m = k = n = 512
    a = _mk(rng, m, k, 0.25, False)
    b = _mk(rng, k, n, 0.25, False)
    sched = ops.plan_dss(a, b)

    @jax.jit
    def run(a_, b_, sched_):
        return ops.matmul_dss(a_, b_, schedule=sched_)

    got = run(a, b, sched)
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b.to_dense())
    )
    np.testing.assert_allclose(np.asarray(got, np.float32), expected, atol=ATOL)


def test_empty_output_rows_are_zeroed(rng):
    """Stream operand with an empty block-row -> unvisited topology blocks
    must come back exactly zero (not uninitialized memory)."""
    bs = BS
    # A: blocks only in block-row 0 (rows 1..3 empty).
    a = testing.bsr_from_blocks(
        rows=4 * bs, cols=4 * bs,
        block_rows=[0, 0], block_cols=[1, 3],
        blocks=np.stack([np.ones((bs, bs), np.float32)] * 2),
    )
    b = jnp.asarray(rng.standard_normal((4 * bs, 2 * bs)).astype(np.float32))
    # Topology covers every block-row, so rows 1..3 are unvisited.
    topo = testing.bsr_from_blocks(
        rows=4 * bs, cols=2 * bs,
        block_rows=[0, 1, 2, 3], block_cols=[0, 1, 0, 1],
        blocks=np.stack([np.ones((bs, bs), np.float32)] * 4),
    )
    out = ops.matmul_ssd(a, b, topo, variant="pallas_flat_schedule")
    full = testing.dense_oracle_matmul(np.asarray(a.to_dense()), np.asarray(b))
    expected = np.asarray(
        reference.extract_blocks(jnp.asarray(full.astype(np.float32)), topo)
    )
    np.testing.assert_allclose(np.asarray(out.data, np.float32), expected, atol=ATOL)
    assert np.all(np.asarray(out.data)[1:] == 0)


def test_dss_empty_intersection_tiles_are_zeroed():
    bs = BS
    ones = np.ones((bs, bs), np.float32)
    # A row 0 hits k-block 0; B k-block 0 hits column 0 only -> tile (0, 1)
    # and all of row 1 have empty intersections.
    a = testing.bsr_from_blocks(2 * bs, 2 * bs, [0], [0], np.stack([ones]))
    b = testing.bsr_from_blocks(2 * bs, 2 * bs, [0], [0], np.stack([ones * 2]))
    out = np.asarray(ops.matmul_dss(a, b, variant="pallas_flat_schedule"))
    expected = np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
    np.testing.assert_allclose(out, expected, atol=ATOL)
    assert np.all(out[:, bs:] == 0) and np.all(out[bs:] == 0)


def test_plan_inside_jit_raises(rng):
    a = _mk(rng, 256, 256, 0.5, False)
    topo = _mk(rng, 256, 256, 0.5, False)

    @jax.jit
    def bad(a_, topo_):
        return ops.plan_ssd(a_, topo_).out_ids

    with pytest.raises(ValueError, match="concrete"):
        bad(a, topo)


def test_schedule_matches_masked_kernel(rng):
    """Flat and masked kernels agree bit-for-bit on the same problem."""
    m = k = n = 512
    a = _mk(rng, m, k, 0.25, True)
    b = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    topo = _mk(rng, m, n, 0.25, True)
    flat = ops.matmul_ssd(a, b, topo, variant="pallas_flat_schedule")
    masked = ops.matmul_ssd(a, b, topo, variant="pallas_output_stationary")
    np.testing.assert_allclose(
        np.asarray(flat.data, np.float32),
        np.asarray(masked.data, np.float32),
        atol=1e-5,
    )


def test_slab_schedules_match(rng):
    """slab=True fetches each step's stream blocks as one contiguous
    group-aligned DMA; results must match the per-block schedule exactly."""
    d = 512
    a = _mk(rng, d, d, 0.25, False)
    topo = _mk(rng, d, d, 0.25, False)
    b = jnp.asarray(rng.standard_normal((d, d)).astype(np.float32))
    base = ops.matmul_ssd(a, b, topo)
    for g in (4, 8):
        s = plan_flat.plan_sparse_out(
            a, topo, kind="ssd", stream_transposed=False, group=g, slab=True
        )
        assert s.slab and s.n_steps > 0
        out = ops.matmul_ssd(a, b, topo, schedule=s)
        np.testing.assert_allclose(
            np.asarray(out.data, np.float32),
            np.asarray(base.data, np.float32),
            atol=1e-5,
        )
    with pytest.raises(ValueError, match="natural-order"):
        plan_flat.plan_sparse_out(
            a, topo, kind="ssd", stream_transposed=True, slab=True
        )


def test_autotune_picks_a_variant(rng, tmp_path, monkeypatch):
    import importlib

    at_mod = importlib.import_module("sputnik_tpu.ops.autotune")
    from sputnik_tpu.ops import autotune, benchmark_variants

    monkeypatch.setenv("SPUTNIK_TPU_TUNE_CACHE", str(tmp_path / "tune.json"))
    monkeypatch.setattr(at_mod, "_CACHE", None)  # reload from patched path

    m = k = n = 512
    a = _mk(rng, m, k, 0.25, False)
    b = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    timings = benchmark_variants("dsd", a, b, chain=2, runs=1)
    assert timings, "no variant timed"
    best = autotune("dsd", a, b)
    assert best in timings
    # cached second call + persisted to disk
    assert autotune("dsd", a, b) == best
    assert (tmp_path / "tune.json").exists()
    # dispatch consults the persistent cache (no variant= needed)
    monkeypatch.setattr(at_mod, "_CACHE", None)  # force re-read from disk
    assert at_mod.cached_variant("dsd", (a, b), {}) == best
    out = ops.matmul_dsd(a, b)
    expected = testing.dense_oracle_matmul(np.asarray(a.to_dense()), np.asarray(b))
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=ATOL)


def test_dss_no_k_limit(rng):
    """The reference's DSS caps k at 32768 (uint8 smem offsets,
    index_merge.h:102-114); the flat merge has no such limit."""
    bs = BS
    k = 40960  # > 32768
    kb = k // bs
    # A: one row of 3 blocks spread across the wide k; B: matching blocks.
    a = testing.bsr_from_blocks(
        bs, k, [0, 0, 0], [0, kb // 2, kb - 1],
        np.stack([np.full((bs, bs), 0.01, np.float32)] * 3),
    )
    b = testing.bsr_from_blocks(
        k, bs, [0, kb // 2, kb - 1], [0, 0, 0],
        np.stack([np.full((bs, bs), 0.02, np.float32)] * 3),
    )
    out = ops.matmul_dss(a, b, variant="pallas_flat_schedule")
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b.to_dense())
    )
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=ATOL)


@pytest.mark.parametrize("ta,tb", [(False, False), (True, False),
                                   (False, True), (True, True)])
@pytest.mark.parametrize("kcat", [False, True])
def test_sss_flat(rng, ta, tb, kcat):
    """Exact SSS work list: per-topology-block intersection of op(A)'s row
    stream against op(B)'s position map."""
    from sputnik_tpu.kernels import reference as ref_kernels

    m, k, n = 512, 384, 640
    a_shape = (k, m) if ta else (m, k)
    b_shape = (n, k) if tb else (k, n)
    a = testing.random_bsr(rng, *a_shape, a_shape[0] * a_shape[1] // 4, 128,
                           unordered=True)
    b = testing.random_bsr(rng, *b_shape, b_shape[0] * b_shape[1] // 4, 128,
                           unordered=True)
    topo = testing.random_bsr(rng, m, n, m * n // 8, 128)
    variant = "pallas_flat_kcat" if kcat else "pallas_flat_schedule"
    out = ops.matmul_sss(a, b, topo, transpose_a=ta, transpose_b=tb,
                         variant=variant)
    full = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b.to_dense()),
        transpose_a=ta, transpose_b=tb,
    )
    expected = np.asarray(
        ref_kernels.extract_blocks(jnp.asarray(full.astype(np.float32)), topo)
    )
    np.testing.assert_allclose(np.asarray(out.data, np.float32), expected,
                               atol=ATOL)
    # Default dispatch at 12.5% topology density picks the exact flat path.
    from sputnik_tpu.ops import registry
    assert registry.dispatch_name(
        "sss", a, b, topo, transpose_a=ta, transpose_b=tb
    ) == "pallas_flat_schedule"


def test_sss_plan_schedule_reuse(rng):
    """plan_sss once, pass via schedule= (the MatmulEx discipline); work
    item count equals the true intersection size."""
    m = k = n = 512
    a = testing.random_bsr(rng, m, k, m * k // 4, 128)
    b = testing.random_bsr(rng, k, n, k * n // 4, 128)
    topo = testing.random_bsr(rng, m, n, m * n // 8, 128)
    sched = ops.plan_sss(a, b, topo)
    pos_a = np.asarray(a.position_map()) >= 0
    pos_b = np.asarray(b.position_map()) >= 0
    expected_items = sum(
        int((pos_a[r] & pos_b[:, c]).sum())
        for r, c in zip(np.asarray(topo.row_indices), np.asarray(topo.indices))
    )
    assert sched.total == expected_items
    out = ops.matmul_sss(a, b, topo, schedule=sched)
    full = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b.to_dense())
    )
    from sputnik_tpu.kernels import reference as ref_kernels
    expected = np.asarray(
        ref_kernels.extract_blocks(jnp.asarray(full.astype(np.float32)), topo)
    )
    np.testing.assert_allclose(np.asarray(out.data, np.float32), expected,
                               atol=ATOL)
