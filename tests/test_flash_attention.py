"""Fused block-sparse flash attention vs the unfused SDD->softmax->DSD chain."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sputnik_tpu.kernels.flash_attention import flash_block_attention
from sputnik_tpu.models import attention as attn
from sputnik_tpu.utils import testing


def _qkv(rng, t, dh, tk=None):
    tk = tk or t
    q = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((tk, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((tk, dh)).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize("topo_kind", ["band", "causal", "random", "unordered"])
def test_matches_unfused(rng, topo_kind):
    t, dh = 512, 128
    if topo_kind == "band":
        topo = attn.band_topology(t, 2, 128, dtype=jnp.float32)
    elif topo_kind == "causal":
        topo = attn.causal_block_topology(t, 128, dtype=jnp.float32)
    else:
        topo = testing.random_bsr(
            rng, t, t, t * t // 3, 128, unordered=(topo_kind == "unordered")
        )
    q, k, v = _qkv(rng, t, dh)
    fused = flash_block_attention(q, k, v, topo)
    unfused = attn.block_sparse_attention(q, k, v, topo)
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(unfused, np.float32),
        atol=1e-3,
    )


def test_causal_matches_unfused(rng):
    t, dh = 512, 128
    topo = attn.causal_block_topology(t, 128, window_blocks=3, dtype=jnp.float32)
    q, k, v = _qkv(rng, t, dh)
    fused = flash_block_attention(q, k, v, topo, causal=True)
    unfused = attn.block_sparse_attention(q, k, v, topo, causal=True)
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(unfused, np.float32),
        atol=1e-3,
    )


def test_rectangular_kv(rng):
    """Cross-attention shape: more keys than queries."""
    t, tk, dh = 256, 512, 128
    topo = testing.random_bsr(rng, t, tk, t * tk // 3, 128)
    q, k, v = _qkv(rng, t, dh, tk)
    fused = flash_block_attention(q, k, v, topo)
    unfused = attn.block_sparse_attention(q, k, v, topo)
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(unfused, np.float32),
        atol=1e-3,
    )


def test_empty_query_rows_zeroed():
    t, dh = 384, 128
    ones = np.ones((128, 128), np.float32)
    # only block-row 0 attends; rows 1, 2 have no blocks.
    topo = testing.bsr_from_blocks(t, t, [0, 0], [0, 2], np.stack([ones, ones]))
    rng = np.random.default_rng(0)
    q, k, v = _qkv(rng, t, dh)
    out = np.asarray(flash_block_attention(q, k, v, topo))
    assert np.all(out[128:] == 0)
    assert np.abs(out[:128]).max() > 0


def test_causal_fully_masked_row(rng):
    """A row whose only topology blocks sit ABOVE the diagonal must come
    out exactly zero under causal masking (regression: while the running
    max was still -inf, exp(s - m) = exp(0) = 1 for masked entries and the
    row got a uniform average of V instead of zeros)."""
    t, dh = 384, 128
    ones = np.ones((128, 128), np.float32)
    # block-row 0 attends only to col 2 (strictly above the diagonal ->
    # fully masked); rows 1 and 2 have ordinary causal work.
    topo = testing.bsr_from_blocks(
        t, t, [0, 1, 1, 2], [2, 0, 1, 2], np.stack([ones] * 4)
    )
    q, k, v = _qkv(rng, t, dh)
    fused = np.asarray(flash_block_attention(q, k, v, topo, causal=True))
    unfused = np.asarray(
        attn.block_sparse_attention(q, k, v, topo, causal=True)
    )
    assert np.all(fused[:128] == 0)
    np.testing.assert_allclose(fused, unfused, atol=1e-3)


# (fused+causal, fused+plain, recompute+plain — recompute+causal adds no
# new code path and interpret-mode grad tests are the suite's slowest.)
@pytest.mark.parametrize(
    "fused_backward,causal", [(True, False), (True, True), (False, False)]
)
def test_grads_match_unfused(rng, fused_backward, causal):
    t, dh = 256, 128
    topo = attn.band_topology(t, 2, 128, dtype=jnp.float32)
    q, k, v = _qkv(rng, t, dh)

    def loss_fused(q_, k_, v_):
        out = flash_block_attention(
            q_, k_, v_, topo, causal=causal, fused_backward=fused_backward
        )
        return jnp.sum(out ** 2)

    def loss_unfused(q_, k_, v_):
        out = attn.block_sparse_attention(q_, k_, v_, topo, causal=causal)
        return jnp.sum(out ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gu = jax.grad(loss_unfused, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gu):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-2
        )


def test_fused_backward_random_topology(rng):
    """Fused dQ/dK/dV on an unordered random topology with empty rows AND
    empty columns (unvisited output blocks must come out zero)."""
    t, tk, dh = 384, 512, 128
    ones = np.ones((128, 128), np.float32)
    # rows {0, 2} populated; row 1 empty; columns {0, 3} used, 1/2 empty.
    topo = testing.bsr_from_blocks(
        t, tk, [0, 0, 2], [3, 0, 0], np.stack([ones] * 3)
    )
    q, k, v = _qkv(rng, t, dh, tk)

    def loss(fn):
        def f(q_, k_, v_):
            return jnp.sum(fn(q_, k_, v_) ** 2)
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    gf = loss(lambda q_, k_, v_: flash_block_attention(q_, k_, v_, topo))
    gu = loss(lambda q_, k_, v_: attn.block_sparse_attention(q_, k_, v_, topo))
    for a, b in zip(gf, gu):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-2
        )
    # empty query row -> zero dq; empty key columns -> zero dk/dv
    assert np.all(np.asarray(gf[0])[128:256] == 0)
    assert np.all(np.asarray(gf[1])[128:384] == 0)
    assert np.all(np.asarray(gf[2])[128:384] == 0)


def test_under_jit_and_vmap(rng):
    t, dh, h = 256, 128, 3
    topo = attn.band_topology(t, 2, 128, dtype=jnp.float32)
    q = jnp.asarray(rng.standard_normal((h, t, dh)).astype(np.float32))

    @jax.jit
    def mh(q_):
        return jax.vmap(lambda x: flash_block_attention(x, x, x, topo))(q_)

    out = mh(q)
    ref = attn.block_sparse_attention(q[1], q[1], q[1], topo)
    np.testing.assert_allclose(
        np.asarray(out[1], np.float32), np.asarray(ref, np.float32), atol=1e-3
    )


@pytest.mark.parametrize("causal", [False, True])
def test_sdd_softmax_fused_matches_unfused(rng, causal):
    from sputnik_tpu import ops

    t, dh = 512, 128
    topo = attn.causal_block_topology(t, 128, window_blocks=3, dtype=jnp.float32)
    q, k, _ = _qkv(rng, t, dh)
    scale = 1.0 / np.sqrt(dh)
    fused = ops.sdd_softmax(q, k, topo, scale=scale, causal=causal)
    unfused = ops.bsr_softmax(
        ops.matmul_sdd(q, k, topo, transpose_b=True),
        scale=scale, causal=causal,
    )
    # scale=None means NO scaling, exactly like bsr_softmax:
    noscale_f = ops.sdd_softmax(q, k, topo, causal=causal)
    noscale_u = ops.bsr_softmax(
        ops.matmul_sdd(q, k, topo, transpose_b=True), causal=causal
    )
    np.testing.assert_allclose(
        np.asarray(noscale_f.data, np.float32),
        np.asarray(noscale_u.data, np.float32),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(fused.data, np.float32),
        np.asarray(unfused.data, np.float32),
        atol=1e-4,
    )


def test_sdd_softmax_fused_masked_row_and_jit(rng):
    from sputnik_tpu import ops

    t, dh = 384, 128
    ones = np.ones((128, 128), np.float32)
    # block-row 0's only block sits above the diagonal: fully masked row.
    topo = testing.bsr_from_blocks(
        t, t, [0, 1, 2], [2, 0, 2], np.stack([ones] * 3)
    )
    q, k, _ = _qkv(rng, t, dh)

    @jax.jit
    def run(q_, k_):
        return ops.sdd_softmax(q_, k_, topo, causal=True).data

    probs = np.asarray(run(q, k))
    assert np.all(probs[0] == 0)  # fully masked block-row -> zero probs
    # row sums of real rows are 1
    assert abs(probs[1].sum(axis=-1).max() - 1.0) < 1e-4


def test_vmapped_fused_backward(rng):
    """Multi-head training: grads through the fused flash-2 backward under
    vmap (the production multi-head path)."""
    t, dh, h = 256, 128, 3
    topo = attn.band_topology(t, 2, 128, dtype=jnp.float32)
    q = jnp.asarray(rng.standard_normal((h, t, dh)).astype(np.float32))

    @jax.jit
    def loss(q_):
        out = jax.vmap(
            lambda x: flash_block_attention(x, x, x, topo, causal=True)
        )(q_)
        return jnp.sum(out ** 2)

    def loss_u(q_):
        out = jax.vmap(
            lambda x: attn.block_sparse_attention(x, x, x, topo, causal=True)
        )(q_)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(q)
    gu = jax.grad(loss_u)(q)
    np.testing.assert_allclose(
        np.asarray(g, np.float32), np.asarray(gu, np.float32), atol=1e-2
    )


@pytest.mark.parametrize("causal", [False, True])
def test_flash_mha_matches_unfused(rng, causal):
    """Round-3 multi-head kernel (head axis in grid, paired query rows):
    forward and all three grads match the unfused chain."""
    from sputnik_tpu.kernels.flash_mha import flash_mha

    h, t, dh = 2, 512, 128
    if causal:
        topo = attn.causal_block_topology(t, 128, window_blocks=2, dtype=jnp.float32)
    else:
        topo = testing.random_bsr(rng, t, t, t * t // 3, 128, unordered=True)
    q = jnp.asarray(rng.standard_normal((h, t, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((h, t, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((h, t, dh)).astype(np.float32))
    out = flash_mha(q, k, v, topo, causal=causal)
    ref = attn.multihead_block_sparse_attention(q, k, v, topo, causal=causal)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=5e-3
    )

    def loss_f(q_, k_, v_):
        return jnp.sum(flash_mha(q_, k_, v_, topo, causal=causal) ** 2)

    def loss_r(q_, k_, v_):
        return jnp.sum(
            attn.multihead_block_sparse_attention(q_, k_, v_, topo, causal=causal) ** 2
        )

    g1 = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a_, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a_, np.float32), np.asarray(b_, np.float32), atol=5e-2
        )


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("rows_per_step", [1, 4, 8])
def test_flash_mha_rows_per_step(rng, causal, rows_per_step):
    """The 8/4/1-row strip variants (round-5 MXU-shape lever; (8, 8) is
    the sweep winner and the auto default) match the unfused chain,
    forward and grads."""
    from sputnik_tpu.kernels.flash_mha import flash_mha

    h, dh = 2, 128
    t = 1024 if rows_per_step == 8 else 512
    if causal:
        topo = attn.causal_block_topology(t, 128, window_blocks=2,
                                          dtype=jnp.float32)
    else:
        topo = testing.random_bsr(rng, t, t, t * t // 3, 128, unordered=True)
    q = jnp.asarray(rng.standard_normal((h, t, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((h, t, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((h, t, dh)).astype(np.float32))
    out = flash_mha(q, k, v, topo, causal=causal,
                    rows_per_step=rows_per_step)
    ref = attn.multihead_block_sparse_attention(q, k, v, topo, causal=causal)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=5e-3
    )

    def loss_f(q_):
        return jnp.sum(
            flash_mha(q_, k, v, topo, causal=causal,
                      rows_per_step=rows_per_step) ** 2
        )

    def loss_r(q_):
        return jnp.sum(
            attn.multihead_block_sparse_attention(
                q_, k, v, topo, causal=causal) ** 2
        )

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_f)(q), np.float32),
        np.asarray(jax.grad(loss_r)(q), np.float32), atol=5e-2,
    )
    with pytest.raises(ValueError):
        flash_mha(q, k, v, topo, rows_per_step=3)  # 4/8 rows % 3 != 0


def test_flash_mha_wrapper_odd_rows(rng):
    """ODD query block-row counts route through flash_mha with the auto
    rows_per_step=1 plan (round 5 — previously fell back to the vmapped
    single-head kernel) and still match the unfused chain."""
    h, t, dh = 2, 384, 128  # 3 block rows: 4 % and 2 % both fail -> R=1
    topo = testing.random_bsr(rng, t, t, t * t // 3, 128, unordered=True)
    q = jnp.asarray(rng.standard_normal((h, t, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((h, t, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((h, t, dh)).astype(np.float32))
    out = attn.multihead_block_sparse_attention(q, k, v, topo, fused=True)
    ref = attn.multihead_block_sparse_attention(q, k, v, topo)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=5e-3
    )


def test_flash_mha_empty_row_pair(rng):
    """A pair whose rows have no topology blocks stays zero."""
    from sputnik_tpu.formats import BlockSparseMatrix
    from sputnik_tpu.kernels.flash_mha import flash_mha

    t, dh = 512, 128
    # blocks only in rows 0 and 3 -> pair 0 half-empty, pair 1 half-empty
    offsets = jnp.asarray(np.asarray([0, 2, 2, 2, 4], np.int32))
    cols = jnp.asarray(np.asarray([0, 1, 2, 3], np.int32))
    data = jnp.zeros((4, 128, 128), jnp.float32)
    topo = BlockSparseMatrix.create(data, offsets, cols, (t, t))
    q = jnp.asarray(rng.standard_normal((1, t, dh)).astype(np.float32))
    out = flash_mha(q, q, q, topo)
    ref = attn.multihead_block_sparse_attention(q, q, q, topo)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=5e-3
    )
    assert np.abs(np.asarray(out)[0, 128:384]).max() == 0.0


@pytest.mark.parametrize("group", [2, 8])
def test_flash_strip_group_parameter(rng, group):
    """Wider/narrower k/v strip groups change only the schedule, never the
    result (padding duplicates are masked)."""
    seq, dh = 512, 64
    topo = testing.random_bsr(rng, seq, seq, seq * seq // 3, 128)
    q = jnp.asarray(rng.standard_normal((seq, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((seq, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((seq, dh)).astype(np.float32))
    base = flash_block_attention(q, k, v, topo, causal=True)
    out = flash_block_attention(q, k, v, topo, causal=True, group=group)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(base, np.float32),
                               atol=1e-5, rtol=1e-5)
