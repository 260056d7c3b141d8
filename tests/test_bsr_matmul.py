"""BSR matmul tests — all six ops x all four transpose modes vs the
fp64-accumulation dense oracle at the reference tolerance (5e-2),
mirroring the reference's typed problem grids (``dsd_test.cu:29-50`` etc.):
minimum sizes, multiple inner blocks, 50%/25% sparsity, unordered indices.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sputnik_tpu import ops
from sputnik_tpu.kernels import reference
from sputnik_tpu.utils import testing
from sputnik_tpu.utils.testing import ATOL

BS = 128
MODES = [(False, False), (False, True), (True, False), (True, True)]

# (m, k, n, density, unordered) — density is the fraction of nonzero blocks.
PROBLEMS = [
    (128, 128, 128, 1.0, False),   # single block
    (128, 256, 128, 1.0, False),   # two inner blocks
    (256, 256, 256, 1.0, False),   # dense-as-sparse
    (512, 512, 256, 0.5, False),   # 50% sparse
    (512, 256, 512, 0.25, False),  # 25% sparse
    (512, 512, 512, 0.25, True),   # unordered column indices
    (1024, 128, 256, 0.5, False),  # rectangular extreme: tall, one inner
    (128, 1024, 128, 0.25, True),  # rectangular extreme: wide k, unordered
]


def _mk_sparse(rng, rows, cols, density, unordered, dtype=jnp.float32):
    nnz = int(rows * cols * density)
    return testing.random_bsr(
        rng, rows, cols, max(nnz, BS * BS), BS, unordered=unordered, dtype=dtype
    )


def _dims(m, k, n, ta, tb):
    """Stored shapes per transpose mode."""
    a_shape = (k, m) if ta else (m, k)
    b_shape = (n, k) if tb else (k, n)
    return a_shape, b_shape


def _check(out, expected):
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=ATOL)


@pytest.mark.parametrize("ta,tb", MODES)
@pytest.mark.parametrize("m,k,n,density,unordered", PROBLEMS)
def test_dsd(rng, m, k, n, density, unordered, ta, tb):
    a_shape, b_shape = _dims(m, k, n, ta, tb)
    a = _mk_sparse(rng, *a_shape, density, unordered)
    b = jnp.asarray(rng.standard_normal(b_shape).astype(np.float32))
    out = ops.matmul_dsd(a, b, transpose_a=ta, transpose_b=tb, variant="pallas_stream")
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b), transpose_a=ta, transpose_b=tb
    )
    _check(out, expected)


@pytest.mark.parametrize("ta,tb", MODES)
@pytest.mark.parametrize("m,k,n,density,unordered", PROBLEMS)
def test_dds(rng, m, k, n, density, unordered, ta, tb):
    a_shape, b_shape = _dims(m, k, n, ta, tb)
    a = jnp.asarray(rng.standard_normal(a_shape).astype(np.float32))
    b = _mk_sparse(rng, *b_shape, density, unordered)
    out = ops.matmul_dds(a, b, transpose_a=ta, transpose_b=tb, variant="pallas_stream")
    expected = testing.dense_oracle_matmul(
        np.asarray(a), np.asarray(b.to_dense()), transpose_a=ta, transpose_b=tb
    )
    _check(out, expected)


@pytest.mark.parametrize("ta,tb", MODES)
@pytest.mark.parametrize("m,k,n,density,unordered", PROBLEMS[:5])
def test_sdd(rng, m, k, n, density, unordered, ta, tb):
    a_shape, b_shape = _dims(m, k, n, ta, tb)
    a = jnp.asarray(rng.standard_normal(a_shape).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(b_shape).astype(np.float32))
    topo = _mk_sparse(rng, m, n, density, unordered)
    out = ops.matmul_sdd(
        a, b, topo, transpose_a=ta, transpose_b=tb, variant="pallas_output_stationary"
    )
    full = testing.dense_oracle_matmul(
        np.asarray(a), np.asarray(b), transpose_a=ta, transpose_b=tb
    )
    expected = np.asarray(
        reference.extract_blocks(jnp.asarray(full.astype(np.float32)), topo)
    )
    _check(out.data, expected)


@pytest.mark.parametrize("ta,tb", MODES)
@pytest.mark.parametrize("m,k,n,density,unordered", PROBLEMS[2:7])
def test_ssd(rng, m, k, n, density, unordered, ta, tb):
    a_shape, b_shape = _dims(m, k, n, ta, tb)
    a = _mk_sparse(rng, *a_shape, density, unordered)
    b = jnp.asarray(rng.standard_normal(b_shape).astype(np.float32))
    topo = _mk_sparse(rng, m, n, density, unordered)
    out = ops.matmul_ssd(
        a, b, topo, transpose_a=ta, transpose_b=tb, variant="pallas_output_stationary"
    )
    full = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b), transpose_a=ta, transpose_b=tb
    )
    expected = np.asarray(
        reference.extract_blocks(jnp.asarray(full.astype(np.float32)), topo)
    )
    _check(out.data, expected)


@pytest.mark.parametrize("ta,tb", MODES)
@pytest.mark.parametrize("m,k,n,density,unordered", PROBLEMS[2:7])
def test_sds(rng, m, k, n, density, unordered, ta, tb):
    a_shape, b_shape = _dims(m, k, n, ta, tb)
    a = jnp.asarray(rng.standard_normal(a_shape).astype(np.float32))
    b = _mk_sparse(rng, *b_shape, density, unordered)
    topo = _mk_sparse(rng, m, n, density, unordered)
    out = ops.matmul_sds(
        a, b, topo, transpose_a=ta, transpose_b=tb, variant="pallas_output_stationary"
    )
    full = testing.dense_oracle_matmul(
        np.asarray(a), np.asarray(b.to_dense()), transpose_a=ta, transpose_b=tb
    )
    expected = np.asarray(
        reference.extract_blocks(jnp.asarray(full.astype(np.float32)), topo)
    )
    _check(out.data, expected)


@pytest.mark.parametrize("ta,tb", MODES)
@pytest.mark.parametrize("m,k,n,density,unordered", PROBLEMS[2:7])
def test_dss(rng, m, k, n, density, unordered, ta, tb):
    a_shape, b_shape = _dims(m, k, n, ta, tb)
    a = _mk_sparse(rng, *a_shape, density, unordered)
    b = _mk_sparse(rng, *b_shape, density, unordered)
    out = ops.matmul_dss(a, b, transpose_a=ta, transpose_b=tb, variant="pallas_masked_stream")
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()),
        np.asarray(b.to_dense()),
        transpose_a=ta,
        transpose_b=tb,
    )
    _check(out, expected)


@pytest.mark.parametrize("ta,tb", MODES)
@pytest.mark.parametrize("m,k,n,density,unordered", PROBLEMS[3:6])
def test_dss_worklist(rng, m, k, n, density, unordered, ta, tb):
    """Exact-intersection DSS work list (round-3): jnp-built merged list
    fed through scalar prefetch — the traced-metadata analogue of the
    reference's in-kernel IndexMerge (index_merge.h:90-227)."""
    a_shape, b_shape = _dims(m, k, n, ta, tb)
    a = _mk_sparse(rng, *a_shape, density, unordered)
    b = _mk_sparse(rng, *b_shape, density, unordered)
    out = ops.matmul_dss(a, b, transpose_a=ta, transpose_b=tb, variant="pallas_worklist")
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()),
        np.asarray(b.to_dense()),
        transpose_a=ta,
        transpose_b=tb,
    )
    _check(out, expected)


def test_dss_worklist_signature_guard(rng):
    """A cached work list replayed against a different problem raises
    instead of silently producing wrong results (round-4 advisor)."""
    from sputnik_tpu.kernels import bsr_dss

    a = _mk_sparse(rng, 512, 512, 0.2, False)
    b = _mk_sparse(rng, 512, 512, 0.2, False)
    wl = bsr_dss.build_dss_worklist(a, b)
    # Same topologies, same flags: accepted.
    out = bsr_dss.dss_worklist(a, b, worklist=wl)
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b.to_dense())
    )
    _check(out, expected)
    # Different transpose flags: rejected with a labeled error.
    with pytest.raises(ValueError, match="different problem"):
        bsr_dss.dss_worklist(a, b, transpose_a=True, transpose_b=True,
                             worklist=wl)
    # build-side validation mirrors the kernel's.
    c = _mk_sparse(rng, 256, 512, 0.2, False)
    with pytest.raises(ValueError, match="contraction mismatch"):
        bsr_dss.build_dss_worklist(a, c)


def test_dss_worklist_eager_trim(rng):
    """An EAGERLY built work list is trimmed to the exact intersection
    size (the static-hint budget's slack sliced off — round 5), and the
    trimmed list still reproduces the oracle."""
    from sputnik_tpu.kernels import bsr_dss

    a = _mk_sparse(rng, 512, 512, 0.25, False)
    b = _mk_sparse(rng, 512, 512, 0.25, False)
    wl = bsr_dss.build_dss_worklist(a, b)
    budget = bsr_dss.worklist_budget(a, b)
    n = int(wl.out_sorted.shape[0])
    assert n <= budget
    # Every kept item is real (the argsort put flag-1 items first).
    assert int(np.asarray(wl.flags).sum()) == n or n == 1
    out = bsr_dss.dss_worklist(a, b, worklist=wl)
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b.to_dense())
    )
    _check(out, expected)


def test_dss_worklist_traced_dispatch(rng):
    """Under jit (traced metadata) the registry reaches an exact path and
    the result still matches; an empty intersection yields exact zeros."""
    m = k = n = 384
    a = _mk_sparse(rng, m, k, 0.2, True)
    b = _mk_sparse(rng, k, n, 0.2, True)
    out = jax.jit(lambda x, y: ops.matmul_dss(x, y))(a, b)
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b.to_dense())
    )
    _check(out, expected)
    # Disjoint patterns: A only touches k-block 0, B rows only k-block 2.
    blocks = rng.standard_normal((3, 128, 128)).astype(np.float32)
    a2 = testing.bsr_from_blocks(m, k, [0, 1, 2], [0, 0, 0], blocks)
    b2 = testing.bsr_from_blocks(k, n, [2, 2, 2], [0, 1, 2], blocks)
    out2 = jax.jit(
        lambda x, y: ops.matmul_dss(x, y, variant="pallas_worklist")
    )(a2, b2)
    np.testing.assert_array_equal(np.asarray(out2), 0.0)


@pytest.mark.parametrize("ta,tb", MODES)
@pytest.mark.parametrize("q", [2, 4, 8])
def test_qstream_variants(rng, ta, tb, q):
    """Q-batched stream (round 3): q blocks per grid step; ragged rows
    exercise the fetch-free padding slots, unordered indices the sort."""
    m, k, n = 640, 384, 512
    a_shape, b_shape = _dims(m, k, n, ta, tb)
    a = _mk_sparse(rng, *a_shape, 0.3, True)
    b = jnp.asarray(rng.standard_normal(b_shape).astype(np.float32))
    out = ops.matmul_dsd(
        a, b, transpose_a=ta, transpose_b=tb, variant="pallas_qstream", q=q
    )
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b), transpose_a=ta, transpose_b=tb
    )
    _check(out, expected)

    ad = jnp.asarray(rng.standard_normal(a_shape).astype(np.float32))
    bsp = _mk_sparse(rng, *b_shape, 0.3, True)
    out = ops.matmul_dds(
        ad, bsp, transpose_a=ta, transpose_b=tb, variant="pallas_qstream", q=q
    )
    expected = testing.dense_oracle_matmul(
        np.asarray(ad), np.asarray(bsp.to_dense()), transpose_a=ta,
        transpose_b=tb,
    )
    _check(out, expected)


@pytest.mark.parametrize("ta,tb", MODES)
@pytest.mark.parametrize(
    "variant", ["pallas_qstream_vacc", "pallas_qstream_kcat"]
)
def test_qstream_value_accumulate(rng, ta, tb, variant):
    """accum="value" sums the q dots in registers (one acc RMW per step);
    accum="kcat" concatenates along the contracted axes into ONE depth-q*bs
    dot. Padding slots are masked by zeroing the small block operand, so
    ragged rows must still be exact."""
    m, k, n = 640, 384, 512
    a_shape, b_shape = _dims(m, k, n, ta, tb)
    a = _mk_sparse(rng, *a_shape, 0.3, True)
    b = jnp.asarray(rng.standard_normal(b_shape).astype(np.float32))
    out = ops.matmul_dsd(
        a, b, transpose_a=ta, transpose_b=tb, variant=variant, q=4,
    )
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b), transpose_a=ta, transpose_b=tb
    )
    _check(out, expected)

    ad = jnp.asarray(rng.standard_normal(a_shape).astype(np.float32))
    bsp = _mk_sparse(rng, *b_shape, 0.3, True)
    out = ops.matmul_dds(
        ad, bsp, transpose_a=ta, transpose_b=tb, variant=variant, q=4,
    )
    expected = testing.dense_oracle_matmul(
        np.asarray(ad), np.asarray(bsp.to_dense()), transpose_a=ta,
        transpose_b=tb,
    )
    _check(out, expected)


def test_qstream_traced_metadata(rng):
    """The slot plan builds on device under jit (static worst-case padding)."""
    a = _mk_sparse(rng, 512, 384, 0.3, True)
    b = jnp.asarray(rng.standard_normal((384, 256)).astype(np.float32))
    out = jax.jit(
        lambda x, y: ops.matmul_dsd(x, y, variant="pallas_qstream", q=4)
    )(a, b)
    expected = testing.dense_oracle_matmul(np.asarray(a.to_dense()), np.asarray(b))
    _check(out, expected)
    c = jnp.asarray(rng.standard_normal((256, 512)).astype(np.float32))
    out = jax.jit(
        lambda x, y: ops.matmul_dds(x, y, variant="pallas_qstream", q=4)
    )(c, a)
    expected = testing.dense_oracle_matmul(np.asarray(c), np.asarray(a.to_dense()))
    _check(out, expected)


@pytest.mark.parametrize("ta,tb", MODES)
@pytest.mark.parametrize("variant", ["pallas_cres", "pallas_gres"])
def test_resident_variants(rng, ta, tb, variant):
    """C-resident and group-resident schedules (round 3): dep-sorted
    streams with VMEM-resident fp32 accumulators, flush steps appended to
    the grid."""
    m, k, n = 640, 384, 512
    a_shape, b_shape = _dims(m, k, n, ta, tb)
    a = _mk_sparse(rng, *a_shape, 0.3, True)
    b = jnp.asarray(rng.standard_normal(b_shape).astype(np.float32))
    out = ops.matmul_dsd(a, b, transpose_a=ta, transpose_b=tb, variant=variant)
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b), transpose_a=ta, transpose_b=tb
    )
    _check(out, expected)

    ad = jnp.asarray(rng.standard_normal(a_shape).astype(np.float32))
    bsp = _mk_sparse(rng, *b_shape, 0.3, True)
    out = ops.matmul_dds(ad, bsp, transpose_a=ta, transpose_b=tb, variant=variant)
    expected = testing.dense_oracle_matmul(
        np.asarray(ad), np.asarray(bsp.to_dense()), transpose_a=ta,
        transpose_b=tb,
    )
    _check(out, expected)


@pytest.mark.parametrize("ta,tb", MODES)
def test_panel_variants(rng, ta, tb):
    """Round-3 panel-resident kernels (dense operand pinned in VMEM per
    output tile) match the oracle; SDD panel covers ta=False only (k-minor
    A defeats the residency slicing — the k-tiled kernel keeps TN/TT)."""
    m, k, n = 512, 384, 256
    a_shape, b_shape = _dims(m, k, n, ta, tb)
    a = _mk_sparse(rng, *a_shape, 0.25, True)
    b = jnp.asarray(rng.standard_normal(b_shape).astype(np.float32))
    out = ops.matmul_dsd(a, b, transpose_a=ta, transpose_b=tb, variant="pallas_panel")
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b), transpose_a=ta, transpose_b=tb
    )
    _check(out, expected)

    ad = jnp.asarray(rng.standard_normal(a_shape).astype(np.float32))
    bsp = _mk_sparse(rng, *b_shape, 0.25, True)
    out = ops.matmul_dds(ad, bsp, transpose_a=ta, transpose_b=tb, variant="pallas_panel")
    expected = testing.dense_oracle_matmul(
        np.asarray(ad), np.asarray(bsp.to_dense()), transpose_a=ta, transpose_b=tb
    )
    _check(out, expected)

    if not ta:
        topo = _mk_sparse(rng, m, n, 0.25, True)
        out = ops.matmul_sdd(
            ad, b, topo, transpose_b=tb, variant="pallas_panel"
        )
        full = testing.dense_oracle_matmul(
            np.asarray(ad), np.asarray(b), transpose_b=tb
        )
        expected = np.asarray(
            reference.extract_blocks(jnp.asarray(full), topo)
        )
        _check(out.data, expected)


def test_panel_empty_groups(rng):
    """Panel kernels zero output tiles whose group has no blocks."""
    # Topology with an empty block row AND an empty block column.
    from sputnik_tpu.formats import BlockSparseMatrix

    blocks = [(0, 0), (0, 2), (2, 0), (3, 3)]  # row 1 and col 1 empty
    offsets = np.zeros(5, np.int32)
    for r, _ in blocks:
        offsets[r + 1] += 1
    offsets = np.cumsum(offsets).astype(np.int32)
    cols = np.asarray([c for _, c in blocks], np.int32)
    data = jnp.asarray(rng.standard_normal((len(blocks), 128, 128)).astype(np.float32))
    sp = BlockSparseMatrix.create(data, jnp.asarray(offsets), jnp.asarray(cols), (512, 512))
    b = jnp.asarray(rng.standard_normal((512, 256)).astype(np.float32))
    out = ops.matmul_dsd(sp, b, variant="pallas_panel")
    _check(out, testing.dense_oracle_matmul(np.asarray(sp.to_dense()), np.asarray(b)))
    ad = jnp.asarray(rng.standard_normal((256, 512)).astype(np.float32))
    out = ops.matmul_dds(ad, sp, variant="pallas_panel")
    _check(out, testing.dense_oracle_matmul(np.asarray(ad), np.asarray(sp.to_dense())))


@pytest.mark.parametrize("ta,tb", MODES)
def test_dsd_dds_pipelined(rng, ta, tb):
    """The manual-DMA pipelined variants (autotune-selectable since r3)
    match the oracle in all four transpose modes."""
    m, k, n = 256, 384, 256
    a_shape, b_shape = _dims(m, k, n, ta, tb)
    a = _mk_sparse(rng, *a_shape, 0.5, False)
    b = jnp.asarray(rng.standard_normal(b_shape).astype(np.float32))
    out = ops.matmul_dsd(a, b, transpose_a=ta, transpose_b=tb, variant="pallas_pipelined")
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b), transpose_a=ta, transpose_b=tb
    )
    _check(out, expected)

    ad = jnp.asarray(rng.standard_normal(a_shape).astype(np.float32))
    bsp = _mk_sparse(rng, *b_shape, 0.5, False)
    out = ops.matmul_dds(ad, bsp, transpose_a=ta, transpose_b=tb, variant="pallas_pipelined")
    expected = testing.dense_oracle_matmul(
        np.asarray(ad), np.asarray(bsp.to_dense()), transpose_a=ta, transpose_b=tb
    )
    _check(out, expected)


def test_dsd_bf16(rng):
    a = _mk_sparse(rng, 256, 256, 0.5, False, dtype=jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    out = ops.matmul_dsd(a, b, out_dtype=jnp.float32, variant="pallas_stream")
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense(), np.float32), np.asarray(b, np.float32)
    )
    # bf16 inputs: looser tolerance scaled by reduction depth.
    np.testing.assert_allclose(np.asarray(out), expected, atol=0.5, rtol=0.1)


def test_dsd_padded_input_blocks(rng):
    """Zero-valued duplicate padding blocks in the sparse input are inert."""
    a = testing.random_bsr(rng, 512, 512, 6 * 128 * 128, 128, pad_rows_to=2)
    b = jnp.asarray(rng.standard_normal((512, 256)).astype(np.float32))
    out = ops.matmul_dsd(a, b, variant="pallas_stream")
    expected = testing.dense_oracle_matmul(np.asarray(a.to_dense()), np.asarray(b))
    _check(out, expected)


def test_registry_fallback_small_blocks(rng):
    """Block sizes the Pallas predicates reject fall through to jnp."""
    a = testing.random_bsr(rng, 128, 128, 8 * 64 * 64, 64)
    b = jnp.asarray(rng.standard_normal((128, 128)).astype(np.float32))
    out = ops.matmul_dsd(a, b)  # first-fit should select jnp_fallback
    expected = testing.dense_oracle_matmul(np.asarray(a.to_dense()), np.asarray(b))
    _check(out, expected)


def test_generic_matmul_dispatch(rng):
    a = _mk_sparse(rng, 256, 256, 0.5, False)
    b = jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32))
    out = ops.matmul(a, b)
    expected = testing.dense_oracle_matmul(np.asarray(a.to_dense()), np.asarray(b))
    _check(out, expected)


@pytest.mark.parametrize("op", ["ssd", "sds", "dss"])
def test_dense_detour_variants(rng, op):
    """Default dispatch at moderate density selects the DSD/DDS-detour
    variants; results must match the direct kernels' oracle."""
    m = k = n = 512
    a_s = _mk_sparse(rng, m, k, 0.5, False)
    b_s = _mk_sparse(rng, k, n, 0.5, False)
    a_d = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    b_d = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    topo = _mk_sparse(rng, m, n, 0.5, False)
    if op == "ssd":
        out = ops.matmul_ssd(a_s, b_d, topo)
        full = testing.dense_oracle_matmul(np.asarray(a_s.to_dense()), np.asarray(b_d))
        expected = np.asarray(reference.extract_blocks(jnp.asarray(full.astype(np.float32)), topo))
        _check(out.data, expected)
    elif op == "sds":
        out = ops.matmul_sds(a_d, b_s, topo)
        full = testing.dense_oracle_matmul(np.asarray(a_d), np.asarray(b_s.to_dense()))
        expected = np.asarray(reference.extract_blocks(jnp.asarray(full.astype(np.float32)), topo))
        _check(out.data, expected)
    else:
        out = ops.matmul_dss(a_s, b_s)
        expected = testing.dense_oracle_matmul(
            np.asarray(a_s.to_dense()), np.asarray(b_s.to_dense())
        )
        _check(out, expected)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
@pytest.mark.parametrize("op", ["dsd", "dds", "sdd", "ssd", "dss"])
def test_dtype_coverage(rng, op, dtype):
    """bf16 storage with fp32 accumulation — the bench/production dtype —
    through every op (the f32 grid above covers the transpose modes)."""
    m = k = n = 512
    a_s = _mk_sparse(rng, m, k, 0.25, False, dtype=dtype)
    b_s = _mk_sparse(rng, k, n, 0.25, False, dtype=dtype)
    topo = _mk_sparse(rng, m, n, 0.25, False, dtype=dtype)
    a_d = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32)).astype(dtype)
    b_d = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32)).astype(dtype)

    if op == "dsd":
        out = ops.matmul_dsd(a_s, b_d, out_dtype=jnp.float32)
        exp = testing.dense_oracle_matmul(
            np.asarray(a_s.to_dense(), np.float32), np.asarray(b_d, np.float32))
    elif op == "dds":
        out = ops.matmul_dds(a_d, b_s, out_dtype=jnp.float32)
        exp = testing.dense_oracle_matmul(
            np.asarray(a_d, np.float32), np.asarray(b_s.to_dense(), np.float32))
    elif op == "sdd":
        out = ops.matmul_sdd(a_d, b_d, topo, out_dtype=jnp.float32).data
        full = testing.dense_oracle_matmul(
            np.asarray(a_d, np.float32), np.asarray(b_d, np.float32))
        exp = np.asarray(reference.extract_blocks(jnp.asarray(full.astype(np.float32)), topo))
    elif op == "ssd":
        out = ops.matmul_ssd(a_s, b_d, topo, out_dtype=jnp.float32).data
        full = testing.dense_oracle_matmul(
            np.asarray(a_s.to_dense(), np.float32), np.asarray(b_d, np.float32))
        exp = np.asarray(reference.extract_blocks(jnp.asarray(full.astype(np.float32)), topo))
    else:  # dss
        out = ops.matmul_dss(a_s, b_s, out_dtype=jnp.float32)
        exp = testing.dense_oracle_matmul(
            np.asarray(a_s.to_dense(), np.float32), np.asarray(b_s.to_dense(), np.float32))
    # bf16 inputs: relative tolerance scaled to magnitudes (~sqrt(k)).
    tol = 0.35 if dtype == jnp.bfloat16 else ATOL
    np.testing.assert_allclose(np.asarray(out, np.float32), exp, atol=tol)


@pytest.mark.parametrize("op", ["dsd", "dds", "sdd", "ssd", "sds", "dss"])
def test_empty_groups_all_ops(rng, op):
    """Operands/topologies with EMPTY block rows and columns (the
    reference's generators pad such rows, matrix_utils.cu:272-282): output
    rows/blocks with no work must come out exactly zero, not stale."""
    d = 512
    ones = np.full((BS, BS), 0.5, np.float32)
    # A: only block-rows {0, 2} populated; block-columns {0, 3} used.
    a_s = testing.bsr_from_blocks(d, d, [0, 0, 2], [0, 3, 3], np.stack([ones] * 3))
    b_s = testing.bsr_from_blocks(d, d, [0, 1, 3], [1, 1, 2], np.stack([ones] * 3))
    topo = testing.bsr_from_blocks(
        d, d, [0, 1, 3], [0, 2, 3], np.stack([np.ones((BS, BS), np.float32)] * 3)
    )
    a_d = jnp.asarray(rng.standard_normal((d, d)).astype(np.float32))
    b_d = jnp.asarray(rng.standard_normal((d, d)).astype(np.float32))
    ad = np.asarray(a_s.to_dense(), np.float64)
    bd = np.asarray(b_s.to_dense(), np.float64)
    if op == "dsd":
        out = np.asarray(ops.matmul_dsd(a_s, b_d))
        exp = ad @ np.asarray(b_d, np.float64)
    elif op == "dds":
        out = np.asarray(ops.matmul_dds(a_d, b_s))
        exp = np.asarray(a_d, np.float64) @ bd
    elif op == "sdd":
        out = np.asarray(ops.matmul_sdd(a_d, b_d, topo).data)
        full = np.asarray(a_d, np.float64) @ np.asarray(b_d, np.float64)
        exp = np.asarray(reference.extract_blocks(
            jnp.asarray(full.astype(np.float32)), topo))
    elif op == "ssd":
        out = np.asarray(ops.matmul_ssd(a_s, b_d, topo).data)
        full = ad @ np.asarray(b_d, np.float64)
        exp = np.asarray(reference.extract_blocks(
            jnp.asarray(full.astype(np.float32)), topo))
    elif op == "sds":
        out = np.asarray(ops.matmul_sds(a_d, b_s, topo).data)
        full = np.asarray(a_d, np.float64) @ bd
        exp = np.asarray(reference.extract_blocks(
            jnp.asarray(full.astype(np.float32)), topo))
    else:  # dss
        out = np.asarray(ops.matmul_dss(a_s, b_s))
        exp = ad @ bd
    np.testing.assert_allclose(out, np.asarray(exp, np.float32), atol=ATOL)


def test_trained_weight_pruning_roundtrip():
    """Magnitude-pruned TRAINED transformer weights (the DLMC protocol,
    data/dlmc_weights.npz from utils.dlmc_gen) through SELL SpMM vs the
    fp64 oracle — heavy-tailed real patterns, not synthetic uniform."""
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "data", "dlmc_weights.npz")
    if not os.path.exists(path):
        pytest.skip("trained weights not generated")
    from sputnik_tpu.formats import SellMatrix
    from sputnik_tpu.ops import csr as csr_ops
    from sputnik_tpu.utils.dlmc_gen import load_weights, pruned_csr

    w = load_weights(path)
    c = pruned_csr(w, "attn_q", 0.95)  # (512, 512) @ 95%
    assert 0.94 < 1 - c.nnz / (512 * 512) < 0.96
    s = SellMatrix.from_csr(c, chunk="auto", sort_rows=True)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((512, 64)).astype(np.float32))
    out = csr_ops.spmm(s, b)
    exp = testing.dense_oracle_matmul(np.asarray(c.to_dense()), np.asarray(b))
    np.testing.assert_allclose(np.asarray(out, np.float32), exp, atol=ATOL)


@pytest.mark.parametrize("ta", [False, True])
@pytest.mark.parametrize("q", [4, 8])
def test_bres_dsd(rng, ta, q):
    """Whole-B-resident q-stream: B fetched once through a constant-index
    BlockSpec, contraction panels read by major-dim dynamic index. Ragged
    rows exercise the padding slots; unordered indices the sort."""
    m, k, n = 640, 384, 512
    a_shape, _ = _dims(m, k, n, ta, False)
    a = _mk_sparse(rng, *a_shape, 0.3, True)
    b = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    out = ops.matmul_dsd(
        a, b, transpose_a=ta, variant="pallas_bres", q=q
    )
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b), transpose_a=ta
    )
    _check(out, expected)


@pytest.mark.parametrize("tb", [False, True])
def test_bres_dds(rng, tb):
    """Whole-A-resident mirror (transpose_a=True: A stored K-major)."""
    m, k, n = 512, 384, 640
    _, b_shape = _dims(m, k, n, True, tb)
    ad = jnp.asarray(rng.standard_normal((k, m)).astype(np.float32))
    bsp = _mk_sparse(rng, *b_shape, 0.3, True)
    out = ops.matmul_dds(
        ad, bsp, transpose_a=True, transpose_b=tb, variant="pallas_bres"
    )
    expected = testing.dense_oracle_matmul(
        np.asarray(ad), np.asarray(bsp.to_dense()), transpose_a=True,
        transpose_b=tb,
    )
    _check(out, expected)


def test_bres_gates_and_traced(rng):
    """can_implement rejects transposed-B / oversized B; the slot plan
    builds under jit (traced metadata)."""
    import jax

    from sputnik_tpu.ops.matmul import _dsd_bres_can

    a = _mk_sparse(rng, 512, 384, 0.3, True)
    b = jnp.asarray(rng.standard_normal((384, 256)).astype(np.float32))
    assert _dsd_bres_can(a, b)
    assert not _dsd_bres_can(a, jnp.asarray(np.zeros((256, 384), np.float32)),
                             transpose_b=True)
    out = jax.jit(
        lambda x, y: ops.matmul_dsd(x, y, variant="pallas_bres", q=4)
    )(a, b)
    expected = testing.dense_oracle_matmul(np.asarray(a.to_dense()), np.asarray(b))
    _check(out, expected)


def test_dense_detour_dispatch(rng):
    """Near-dense sparse operands (density >= 0.8) route to the XLA
    densify-detour in first-fit — the stream kernels save too little MXU
    work there to beat one dense dot (measured d=2048 @100%)."""
    from sputnik_tpu.ops import registry

    dense_a = _mk_sparse(rng, 512, 384, 1.0, False)
    sparse_a = _mk_sparse(rng, 512, 384, 0.3, False)
    b = jnp.asarray(rng.standard_normal((384, 256)).astype(np.float32))
    assert registry.dispatch_name("dsd", dense_a, b) == "xla_dense_detour"
    assert registry.dispatch_name("dsd", sparse_a, b) != "xla_dense_detour"
    _check(ops.matmul_dsd(dense_a, b),
           testing.dense_oracle_matmul(np.asarray(dense_a.to_dense()),
                                       np.asarray(b)))
    topo = _mk_sparse(rng, 512, 256, 1.0, False)
    x = jnp.asarray(rng.standard_normal((512, 384)).astype(np.float32))
    assert registry.dispatch_name("sdd", x, b, topo) == "xla_dense_detour"
    dense_b = _mk_sparse(rng, 384, 256, 1.0, False)
    assert registry.dispatch_name("dds", b, dense_b) == "xla_dense_detour"


def test_sdd_panel_k_cap_dispatch():
    """The full-K resident SDD panel never completed a k=16384 remote
    compile (round 5); first-fit must not route huge-K problems to it.
    Metadata-only check (no 16384^2 data materialized): can_implement
    sees shapes and topology metadata."""
    from sputnik_tpu.formats import BlockSparseMatrix
    from sputnik_tpu.ops.matmul import _sdd_panel_can

    d = 16384
    nb = 8
    data = jnp.zeros((nb, 128, 128), jnp.bfloat16)
    offsets = jnp.asarray(
        np.linspace(0, nb, d // 128 + 1).astype(np.int32))
    cols = jnp.asarray(np.arange(nb, dtype=np.int32))
    topo = BlockSparseMatrix.create(data, offsets, cols, (d, d))
    a = jax.ShapeDtypeStruct((d, d), jnp.bfloat16)
    b = jax.ShapeDtypeStruct((d, d), jnp.bfloat16)
    assert not _sdd_panel_can(a, b, topo)
    # The verified size still qualifies (same topology, k=8192 operand).
    a8 = jax.ShapeDtypeStruct((d, 8192), jnp.bfloat16)
    topo8 = BlockSparseMatrix.create(data, offsets, cols, (d, d))
    assert _sdd_panel_can(a8, b, topo8)


@pytest.mark.parametrize("ta,tb", [(False, False), (True, True)])
def test_sss(rng, ta, tb):
    """SSS (sparse = sparse @ sparse, masked to a topology) — beyond the
    reference's six-op surface; rides the DSS engine + block extract."""
    from sputnik_tpu.kernels import reference as ref_kernels

    m, k, n = 640, 384, 512
    a_shape, b_shape = _dims(m, k, n, ta, tb)
    a = _mk_sparse(rng, *a_shape, 0.3, True)
    b = _mk_sparse(rng, *b_shape, 0.3, True)
    topo = _mk_sparse(rng, m, n, 0.4, False)
    out = ops.matmul_sss(a, b, topo, transpose_a=ta, transpose_b=tb)
    full = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b.to_dense()),
        transpose_a=ta, transpose_b=tb,
    )
    expected = np.asarray(
        ref_kernels.extract_blocks(jnp.asarray(full.astype(np.float32)), topo)
    )
    np.testing.assert_allclose(np.asarray(out.data, np.float32), expected,
                               atol=ATOL)
    # The generic entry point routes two sparse operands + topology here.
    out2 = ops.matmul(a, b, topology=topo, transpose_a=ta, transpose_b=tb)
    np.testing.assert_allclose(np.asarray(out2.data), np.asarray(out.data))


def test_sss_shape_validation(rng):
    a = _mk_sparse(rng, 640, 384, 0.3, False)
    b = _mk_sparse(rng, 384, 512, 0.3, False)
    bad = _mk_sparse(rng, 640, 384, 0.3, False)
    with pytest.raises(ValueError, match="topology"):
        ops.matmul_sss(a, b, bad)


def test_dense_detour_respects_explicit_plans(rng):
    """A caller's pre-planned schedule/plan (the MatmulEx discipline) is an
    opt-in the densify detour must never swallow."""
    from sputnik_tpu.ops.matmul import (
        _dds_densify_can, _dsd_densify_can, _sdd_densify_can,
    )

    dense_a = _mk_sparse(rng, 512, 384, 1.0, False)
    b = jnp.ones((384, 256), jnp.float32)
    assert _dsd_densify_can(dense_a, b)
    assert not _dsd_densify_can(dense_a, b, plan=object())
    assert not _dsd_densify_can(dense_a, b, schedule=object())
    assert not _dds_densify_can(b, dense_a, schedule=object())
    topo = _mk_sparse(rng, 256, 384, 1.0, False)
    assert not _sdd_densify_can(b.T, b, topo, schedule=object())


def test_sss_blocksize_and_contraction_gates(rng):
    """Mixed block sizes fall through to the dss_extract variant (the flat
    kernel's can rejects them); a k mismatch raises at the front door."""
    from sputnik_tpu.ops import registry

    m, k, n = 512, 384, 512
    a = _mk_sparse(rng, m, k, 0.3, False)
    b = _mk_sparse(rng, k, n, 0.3, False)
    topo256 = testing.random_bsr(rng, m, n, m * n // 8, 256)
    assert registry.dispatch_name("sss", a, b, topo256) == "dss_extract"
    out = ops.matmul_sss(a, b, topo256)
    full = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b.to_dense())
    )
    expected = np.asarray(
        reference.extract_blocks(jnp.asarray(full.astype(np.float32)), topo256)
    )
    _check(out.data, expected)
    bad_b = _mk_sparse(rng, 512, n, 0.3, False)  # k=512 != 384
    with pytest.raises(ValueError, match="contraction"):
        ops.matmul_sss(a, bad_b, topo256)


@pytest.mark.parametrize("ta", [False, True])
def test_bres_lane_mode_dsd_nt(rng, ta):
    """Transposed-B bres: contraction panels read by 128-aligned dynamic
    LANE slices from the resident operand (probe-gated on real hardware;
    interpret mode proves the semantics)."""
    m, k, n = 640, 384, 512
    a_shape, _ = _dims(m, k, n, ta, True)
    a = _mk_sparse(rng, *a_shape, 0.3, True)
    b = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    from sputnik_tpu.kernels.bsr_qstream import dsd_bres
    out = dsd_bres(a, b, transpose_a=ta, transpose_b=True, q=4)
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b), transpose_a=ta,
        transpose_b=True,
    )
    _check(out, expected)


@pytest.mark.parametrize("tb", [False, True])
def test_bres_lane_mode_dds_nn(rng, tb):
    """Natural-A bres mirror through lane slices."""
    m, k, n = 512, 384, 640
    _, b_shape = _dims(m, k, n, False, tb)
    ad = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    bsp = _mk_sparse(rng, *b_shape, 0.3, True)
    from sputnik_tpu.kernels.bsr_qstream import dds_bres
    out = dds_bres(ad, bsp, transpose_a=False, transpose_b=tb, q=4)
    expected = testing.dense_oracle_matmul(
        np.asarray(ad), np.asarray(bsp.to_dense()), transpose_b=tb,
    )
    _check(out, expected)


@pytest.mark.parametrize("ta,tb", MODES)
def test_sdd_bres(rng, ta, tb):
    """Input-resident SDD: both operands fetched once, strips read by
    major-dim dynamic index; packed-slot epilogue drops row padding."""
    m, k, n = 640, 384, 512
    a_shape, b_shape = _dims(m, k, n, ta, tb)
    a = jnp.asarray(rng.standard_normal(a_shape).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(b_shape).astype(np.float32))
    topo = _mk_sparse(rng, m, n, 0.3, True)
    out = ops.matmul_sdd(a, b, topo, transpose_a=ta, transpose_b=tb,
                         variant="pallas_bres")
    full = testing.dense_oracle_matmul(
        np.asarray(a), np.asarray(b), transpose_a=ta, transpose_b=tb
    )
    expected = np.asarray(
        reference.extract_blocks(jnp.asarray(full.astype(np.float32)), topo)
    )
    _check(out.data, expected)


def test_sdd_bres_schedule_reuse(rng):
    from sputnik_tpu.kernels.bsr_sdd import plan_sdd_bres

    m, k, n = 512, 256, 512
    a = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    topo = _mk_sparse(rng, m, n, 0.25, False)
    sched = plan_sdd_bres(topo, 4)
    out = ops.matmul_sdd(a, b, topo, transpose_b=True, variant="pallas_bres",
                         schedule=sched)
    full = testing.dense_oracle_matmul(np.asarray(a), np.asarray(b),
                                       transpose_b=True)
    expected = np.asarray(
        reference.extract_blocks(jnp.asarray(full.astype(np.float32)), topo)
    )
    _check(out.data, expected)


@pytest.mark.parametrize("tb", [False, True])
@pytest.mark.parametrize("q", [4, 8])
def test_cstack_variant(rng, tb, q):
    """Column-stacked C-resident DSD (round 4): q same-k blocks in one
    (q*bs, bs) dot, accumulated into a VMEM-resident output at each
    block's own row. Ragged columns exercise the padded slots; unordered
    indices the dep-major regrouping; n > n_tile the multi-pass flush."""
    m, k, n = 640, 384, 512
    a_shape, b_shape = _dims(m, k, n, False, tb)
    a = _mk_sparse(rng, *a_shape, 0.3, True)
    b = jnp.asarray(rng.standard_normal(b_shape).astype(np.float32))
    out = ops.matmul_dsd(
        a, b, transpose_b=tb, variant="pallas_cstack", q=q, n_tile=256
    )
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b), transpose_b=tb
    )
    _check(out, expected)
    # transpose_a is gated out at the registry level.
    with pytest.raises(ValueError):
        ops.matmul_dsd(a, b.T, transpose_a=True, transpose_b=not tb,
                       variant="pallas_cstack")
    # A direct call whose fp32 accumulator cannot fit VMEM even at the
    # minimum 128-lane tile raises a labeled error (round-4 advisor) —
    # exercised via a tiny budget monkeypatch rather than a giant m.
    from sputnik_tpu.kernels import bsr_cstack
    import unittest.mock as mock

    with mock.patch.object(bsr_cstack, "cstack_fits",
                           lambda m_, nt: False):
        with pytest.raises(ValueError, match="VMEM budget"):
            bsr_cstack.dsd_cstack(a, b, transpose_b=tb)


@pytest.mark.parametrize("tb", [False, True])
@pytest.mark.parametrize("unordered", [False, True])
def test_dsd_gather_bmm(rng, tb, unordered):
    """Pure-XLA gather+bmm variant (round 4): PERFECT_UNIFORM rows only
    (reference ``matrix_utils.cu:307-342``); unordered indices exercise
    order-free accumulation over the gathered panels."""
    m, k, n = 512, 768, 384
    a_shape, b_shape = _dims(m, k, n, False, tb)
    a = testing.random_bsr(rng, *a_shape, int(m * k * 0.4), BS,
                           perfect_uniform=True, unordered=unordered)
    b = jnp.asarray(rng.standard_normal(b_shape).astype(np.float32))
    out = ops.matmul_dsd(a, b, transpose_b=tb, variant="xla_gather_bmm")
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b), transpose_b=tb
    )
    _check(out, expected)


@pytest.mark.parametrize("ta", [False, True])
def test_dds_gather_bmm(rng, ta):
    """Mirror gather variant: uniform block-COLUMNS of B (built by
    transposing a perfect-uniform-row pattern)."""
    m, k, n = 384, 640, 512
    a_shape, _ = _dims(m, k, n, ta, False)
    bt = testing.random_bsr(rng, n, k, int(n * k * 0.4), BS,
                            perfect_uniform=True)
    # Uniform rows of B^T == uniform columns of B.
    from sputnik_tpu import formats

    b = formats.bsr_from_dense(jnp.asarray(bt.to_dense()).T, BS)
    a = jnp.asarray(rng.standard_normal(a_shape).astype(np.float32))
    out = ops.matmul_dds(a, b, transpose_a=ta, variant="xla_gather_bmm")
    expected = testing.dense_oracle_matmul(
        np.asarray(a), np.asarray(b.to_dense()), transpose_a=ta
    )
    _check(out, expected)


def test_gather_bmm_gates(rng):
    """Transposed-sparse modes and traced metadata are gated out."""
    au = testing.random_bsr(rng, 512, 512, int(512 * 512 * 0.25), BS,
                            perfect_uniform=True)
    b = jnp.asarray(rng.standard_normal((512, 256)).astype(np.float32))
    with pytest.raises(ValueError):
        ops.matmul_dsd(au, b.T, transpose_a=True, transpose_b=True,
                       variant="xla_gather_bmm")
    # Traced metadata cannot be slot-planned host-side.
    with pytest.raises(ValueError):
        jax.jit(
            lambda a_, b_: ops.matmul_dsd(a_, b_, variant="xla_gather_bmm")
        )(au, b)


@pytest.mark.parametrize("tb", [False, True])
def test_dsd_gather_bmm_ragged(rng, tb):
    """Ragged rows pad to max width with a gathered zero block."""
    m, k, n = 640, 512, 384
    a_shape, b_shape = _dims(m, k, n, False, tb)
    a = _mk_sparse(rng, *a_shape, 0.3, True)
    b = jnp.asarray(rng.standard_normal(b_shape).astype(np.float32))
    out = ops.matmul_dsd(a, b, transpose_b=tb, variant="xla_gather_bmm")
    expected = testing.dense_oracle_matmul(
        np.asarray(a.to_dense()), np.asarray(b), transpose_b=tb
    )
    _check(out, expected)


def test_contraction_mismatch_labeled_error(rng):
    """Trace-time ValidMatmul (reference arguments.h:217-231): mismatched
    contraction raises the labeled ValueError on EVERY dispatch path,
    including the jnp fallback (non-128 shapes used to surface a raw
    backend TypeError)."""
    a = _mk_sparse(rng, 256, 256, 0.5, False)
    with pytest.raises(ValueError, match="contraction mismatch"):
        ops.matmul_dsd(a, jnp.zeros((99, 4)))
    with pytest.raises(ValueError, match="contraction mismatch"):
        ops.matmul_dds(jnp.zeros((4, 99)), a)


@pytest.mark.parametrize("ta,tb", MODES)
@pytest.mark.parametrize("q", [1, 4])
def test_dds_ct_variant(rng, ta, tb, q):
    """Transposed-accumulator DDS (round 4): per-slot (bs,bs)@(bs,bm) dots
    with a flush transpose — all four modes vs the fp64 oracle; ragged
    columns exercise the padded slots."""
    m, k, n = 384, 640, 512
    a_shape, b_shape = _dims(m, k, n, ta, tb)
    a = jnp.asarray(rng.standard_normal(a_shape).astype(np.float32))
    b = _mk_sparse(rng, *b_shape, 0.3, True)
    out = ops.matmul_dds(a, b, transpose_a=ta, transpose_b=tb,
                         variant="pallas_ct", q=q, m_tile=256)
    expected = testing.dense_oracle_matmul(
        np.asarray(a), np.asarray(b.to_dense()), transpose_a=ta, transpose_b=tb
    )
    _check(out, expected)
