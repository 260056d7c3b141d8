"""Block-sparse attention + BSR softmax tests vs dense-attention oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sputnik_tpu import models, ops
from sputnik_tpu.formats import bsr_from_dense
from sputnik_tpu.ops.softmax import bsr_softmax
from sputnik_tpu.utils import testing


def _dense_masked_softmax(scores, mask, causal=False):
    s = np.where(mask, scores, -np.inf)
    if causal:
        t = s.shape[0]
        tri = np.tril(np.ones((t, t), bool))
        s = np.where(tri, s, -np.inf)
    s = s - s.max(-1, keepdims=True)
    e = np.exp(s)
    e = np.where(np.isfinite(s), e, 0.0)
    denom = e.sum(-1, keepdims=True)
    return np.where(denom > 0, e / np.maximum(denom, 1e-30), 0.0)


def test_bsr_softmax_matches_dense(rng):
    x = rng.standard_normal((512, 512)).astype(np.float32)
    mask_blocks = rng.random((4, 4)) < 0.6
    mask_blocks[0, 0] = True
    mask = np.repeat(np.repeat(mask_blocks, 128, 0), 128, 1)
    m = bsr_from_dense(np.where(mask, x, 0.0) + np.where(mask, 1e-9, 0), 128)
    out = bsr_softmax(m.with_data(m.data), scale=0.5)
    expected = _dense_masked_softmax(x * 0.5 + np.where(mask, 0, 0), mask)
    # Compare densified (absent blocks are zero-probability).
    got = np.asarray(out.to_dense(), np.float32)
    # m stores x values only where mask; re-extract oracle on stored values
    stored = np.asarray(m.to_dense(), np.float32)
    expected = _dense_masked_softmax(stored * 0.5, mask)
    np.testing.assert_allclose(got, expected, atol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_bsr_softmax_pallas_matches_jnp(rng, causal):
    """Round-3 Pallas two-pass kernel == the jnp segment-op oracle,
    including the causal contract and an empty block-row."""
    x = rng.standard_normal((640, 512)).astype(np.float32)
    mask_blocks = rng.random((5, 4)) < 0.5
    mask_blocks[2, :] = False  # empty block-row
    mask_blocks[0, 0] = True
    mask = np.repeat(np.repeat(mask_blocks, 128, 0), 128, 1)
    m = bsr_from_dense(np.where(mask, x, 0.0) + np.where(mask, 1e-9, 0), 128)
    out_p = bsr_softmax(m, scale=0.37, causal=causal, variant="pallas")
    out_j = bsr_softmax(m, scale=0.37, causal=causal, variant="jnp")
    np.testing.assert_allclose(
        np.asarray(out_p.data, np.float32),
        np.asarray(out_j.data, np.float32),
        atol=1e-5,
    )


def test_bsr_softmax_pallas_grad_matches_jnp(rng):
    x = rng.standard_normal((512, 512)).astype(np.float32)
    mask_blocks = rng.random((4, 4)) < 0.6
    mask_blocks[0, 0] = True
    mask = np.repeat(np.repeat(mask_blocks, 128, 0), 128, 1)
    m = bsr_from_dense(np.where(mask, x, 0.0) + np.where(mask, 1e-9, 0), 128)

    def loss(data, variant):
        out = bsr_softmax(m.with_data(data), scale=0.5, causal=True,
                          variant=variant)
        return jnp.sum(jnp.sin(out.data.astype(jnp.float32) * 3.0))

    gp = jax.grad(lambda d: loss(d, "pallas"))(m.data)
    gj = jax.grad(lambda d: loss(d, "jnp"))(m.data)
    np.testing.assert_allclose(
        np.asarray(gp, np.float32), np.asarray(gj, np.float32), atol=1e-4
    )


def test_block_sparse_attention_full_topology_equals_dense(rng):
    t, dh = 256, 128
    q = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    topo = models.band_topology(t, window_blocks=99, block_size=128, dtype=jnp.float32)
    out = models.block_sparse_attention(q, k, v, topo)
    scale = 1 / np.sqrt(dh)
    s = np.asarray(q) @ np.asarray(k).T * scale
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    expected = p @ np.asarray(v)
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=5e-2)


def test_block_sparse_attention_causal(rng):
    t, dh = 256, 64
    q = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    topo = models.causal_block_topology(t, 128, dtype=jnp.float32)
    out = models.block_sparse_attention(q, k, v, topo, causal=True)
    scale = 1 / np.sqrt(dh)
    s = np.asarray(q) @ np.asarray(k).T * scale
    tri = np.tril(np.ones((t, t), bool))
    s = np.where(tri, s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    expected = p @ np.asarray(v)
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=5e-2)


def test_banded_attention_matches_masked_dense(rng):
    t, dh = 512, 64
    q = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    topo = models.band_topology(t, window_blocks=2, block_size=128, dtype=jnp.float32)
    out = models.block_sparse_attention(q, k, v, topo)
    nb = t // 128
    r = np.arange(nb)[:, None]
    c = np.arange(nb)[None, :]
    mask = np.repeat(np.repeat(np.abs(r - c) < 2, 128, 0), 128, 1)
    scale = 1 / np.sqrt(dh)
    s = np.asarray(q) @ np.asarray(k).T * scale
    p = _dense_masked_softmax(s, mask)
    expected = p @ np.asarray(v)
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=5e-2)


def test_attention_grads_finite(rng):
    t, dh = 256, 64
    q = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    topo = models.band_topology(t, window_blocks=1, block_size=128, dtype=jnp.float32)

    def loss(q_, k_, v_):
        return jnp.sum(models.block_sparse_attention(q_, k_, v_, topo) ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in (gq, gk, gv):
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


def test_topk_topology_selection(rng):
    # Non-causal: the selected blocks are exactly the top-k pooled scores.
    t, dh, bs, kb = 512, 64, 128, 2
    q = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    topo = models.topk_block_topology(q, k, kb, block_size=bs, causal=False,
                                      include_local=False)
    s = t // bs
    assert topo.nnz_blocks == s * kb
    qp = np.asarray(q).reshape(s, bs, dh).mean(1)
    kp = np.asarray(k).reshape(s, bs, dh).mean(1)
    scores = qp @ kp.T
    idx = np.asarray(topo.indices).reshape(s, kb)
    for r in range(s):
        assert set(idx[r]) == set(np.argsort(scores[r])[-kb:])
        assert (np.diff(idx[r]) > 0).all()  # sorted, distinct


def test_topk_topology_causal_validity(rng):
    t, bs, kb = 1024, 128, 3
    q = jnp.asarray(rng.standard_normal((t, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((t, 64)).astype(np.float32))
    topo = models.topk_block_topology(q, k, kb, block_size=bs, causal=True)
    s = t // bs
    idx = np.asarray(topo.indices).reshape(s, kb)
    for r in range(s):
        assert r in idx[r]  # include_local forces the diagonal
        if r >= kb - 1:  # enough valid blocks: every pick is causal
            assert (idx[r] <= r).all()


def test_topk_full_budget_matches_dense_causal(rng):
    # k_blocks == all blocks: early rows necessarily select FUTURE blocks;
    # bsr_softmax(causal=True) must mask them to exactly zero, making the
    # chain equal dense causal attention.
    t, dh, bs = 512, 64, 128
    q = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    topo = models.topk_block_topology(q, k, t // bs, block_size=bs, causal=True,
                                      dtype=jnp.float32)
    out = models.block_sparse_attention(q, k, v, topo, causal=True)
    scale = 1.0 / np.sqrt(dh)
    p = _dense_masked_softmax(np.asarray(q) @ np.asarray(k).T * scale,
                              np.ones((t, t), bool), causal=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               p @ np.asarray(v), atol=5e-2)


def test_topk_topology_under_jit(rng):
    t, dh, bs, kb = 512, 64, 128, 2
    q = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))

    @jax.jit
    def attn(q_, k_, v_):
        topo = models.topk_block_topology(q_, k_, kb, block_size=bs, causal=True,
                                          dtype=jnp.float32)
        return models.block_sparse_attention(q_, k_, v_, topo, causal=True)

    out = attn(q, k, v)
    topo_e = models.topk_block_topology(q, k, kb, block_size=bs, causal=True,
                                        dtype=jnp.float32)
    out_e = models.block_sparse_attention(q, k, v, topo_e, causal=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(out_e, np.float32), atol=1e-4)
    assert np.isfinite(np.asarray(out)).all()


def test_topk_topology_validation(rng):
    q = jnp.zeros((512, 64)); k = jnp.zeros((512, 64))
    with pytest.raises(ValueError):
        models.topk_block_topology(q, k, 9, block_size=128)  # > s_k
    with pytest.raises(ValueError):
        models.topk_block_topology(jnp.zeros((500, 64)), k, 2, block_size=128)




def test_decode_topk_full_budget_matches_dense(rng):
    t, dh, bs = 1024, 64, 128
    q = jnp.asarray(rng.standard_normal(dh).astype(np.float32))
    kc = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    vc = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    out = models.decode_topk_attention(q, kc, vc, t // bs, block_size=bs)
    s = np.asarray(kc) @ np.asarray(q) / np.sqrt(dh)
    p = np.exp(s - s.max()); p /= p.sum()
    np.testing.assert_allclose(np.asarray(out), p @ np.asarray(vc), atol=1e-4)


def test_decode_topk_partial_budget_matches_page_oracle(rng):
    t, dh, bs, kb = 1024, 64, 128, 3
    q = jnp.asarray(rng.standard_normal(dh).astype(np.float32))
    kc = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    vc = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    out = models.decode_topk_attention(q, kc, vc, kb, block_size=bs)
    # Oracle: same page selection rule in numpy, exact attention over them.
    kp = np.asarray(kc).reshape(t // bs, bs, dh).mean(1)
    pages = np.argsort(kp @ np.asarray(q))[-kb:]
    sel = np.sort(np.concatenate([np.arange(p * bs, (p + 1) * bs) for p in pages]))
    s = np.asarray(kc)[sel] @ np.asarray(q) / np.sqrt(dh)
    p = np.exp(s - s.max()); p /= p.sum()
    np.testing.assert_allclose(np.asarray(out), p @ np.asarray(vc)[sel], atol=1e-4)


def test_decode_topk_valid_len_masks_cache_tail(rng):
    t, dh, bs = 512, 64, 128
    q = jnp.asarray(rng.standard_normal(dh).astype(np.float32))
    kc = rng.standard_normal((t, dh)).astype(np.float32)
    vc = rng.standard_normal((t, dh)).astype(np.float32)
    vl = 200  # only 200 positions filled (pages 0 and 1, page 1 partial)
    # Poison the invalid tail: must not affect the output at all.
    kc_poison = kc.copy(); kc_poison[vl:] = 1e6
    vc_poison = vc.copy(); vc_poison[vl:] = -1e6
    out = models.decode_topk_attention(
        jnp.asarray(q), jnp.asarray(kc_poison), jnp.asarray(vc_poison),
        4, block_size=bs, valid_len=vl,
    )
    s = kc[:vl] @ q / np.sqrt(dh)
    p = np.exp(s - s.max()); p /= p.sum()
    np.testing.assert_allclose(np.asarray(out), p @ vc[:vl], atol=1e-4)
    assert np.isfinite(np.asarray(out)).all()


def test_decode_topk_multihead_and_jit(rng):
    h, t, dh, kb = 4, 512, 64, 2
    q = jnp.asarray(rng.standard_normal((h, dh)).astype(np.float32))
    kc = jnp.asarray(rng.standard_normal((h, t, dh)).astype(np.float32))
    vc = jnp.asarray(rng.standard_normal((h, t, dh)).astype(np.float32))
    f = jax.jit(lambda q_, k_, v_, vl: models.decode_topk_attention(
        q_, k_, v_, kb, valid_len=vl))
    out = f(q, kc, vc, 512)
    assert out.shape == (h, dh)
    # Each head independently equals the single-head path.
    for i in range(h):
        ref = models.decode_topk_attention(q[i], kc[i], vc[i], kb, valid_len=512)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(ref), atol=1e-5)
    # Growing valid_len reuses the same compiled step (shapes static).
    out2 = f(q, kc, vc, 384)
    assert np.isfinite(np.asarray(out2)).all()


def test_decode_band_matches_masked_oracle(rng):
    t, dh, bs, w = 1024, 64, 128, 2
    q = jnp.asarray(rng.standard_normal(dh).astype(np.float32))
    kc = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    vc = jnp.asarray(rng.standard_normal((t, dh)).astype(np.float32))
    for pos in (5, 130, 700):  # window-clipped, 2-page, mid-cache
        out = models.decode_band_attention(q, kc, vc, w, pos, block_size=bs)
        r = pos // bs
        lo = max(0, (r - w + 1) * bs)
        sel = np.arange(lo, pos + 1)
        s = np.asarray(kc)[sel] @ np.asarray(q) / np.sqrt(dh)
        p = np.exp(s - s.max()); p /= p.sum()
        np.testing.assert_allclose(
            np.asarray(out), p @ np.asarray(vc)[sel], atol=1e-4,
            err_msg=f"pos {pos}",
        )
