"""Generate DLMC-protocol sparse matrices: train a small transformer LM,
magnitude-prune its weight matrices at the DLMC sparsity grid.

The published DLMC dataset (Gale et al., "The State of Sparsity in Deep
Neural Networks") is magnitude-pruned transformer weights. This module
reproduces that PROTOCOL locally (this environment has no network egress,
so the published files cannot be fetched): a character-level transformer
LM with the DLMC base dimensions (d_model 512, d_ff 2048) trains on real
text gathered from the local filesystem, and its trained weight matrices
are magnitude-pruned at 70/80/90/95/98%. Trained-weight magnitude pruning
produces the heavy-tailed, row-imbalanced patterns that synthetic uniform
sparsity does not — the regime Sputnik's row-swizzle machinery exists for
(``matrix_utils.cu:348-363``).

CLI:  python -m sputnik_tpu.utils.dlmc_gen --out data/dlmc_weights.npz
      [--steps 400]

The trained DENSE weights are saved once (npz); benchmark/test consumers
prune at load time (`pruned_csr`) so one ~6 MB artifact serves the whole
sparsity grid.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

VOCAB = 256
D_MODEL = 512
D_FF = 2048
N_HEADS = 4
N_LAYERS = 2
SEQ = 256

SPARSITIES = (0.70, 0.80, 0.90, 0.95, 0.98)

# The DLMC-shaped matrices harvested from the trained model.
WEIGHT_KEYS = (
    "attn_q",   # (512, 512)
    "attn_o",   # (512, 512)
    "ffn_w1",   # (512, 2048)
    "ffn_w2",   # (2048, 512)
)


def build_corpus(max_bytes: int = 4 << 20) -> np.ndarray:
    """Concatenate REPO-LOCAL text (this package's sources + docs) into a
    byte array — the locally available stand-in for a natural-language
    corpus. Pinned to the repo tree with a fully deterministic walk so the
    committed weight artifact is regenerable and auditable from the repo
    alone (ADVICE r2); the corpus sha256 is stored in the npz next to the
    weights."""
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo = os.path.dirname(pkg)
    roots = [pkg, os.path.join(repo, "docs"), os.path.join(repo, "tests")]
    chunks = []
    size = 0
    for root in roots:
        for dirpath, dirs, files in os.walk(root):
            dirs.sort()
            for f in sorted(files):
                if not f.endswith((".py", ".md", ".txt", ".rst")):
                    continue
                try:
                    with open(os.path.join(dirpath, f), "rb") as fh:
                        b = fh.read(1 << 16)
                except OSError:
                    continue
                chunks.append(np.frombuffer(b, np.uint8))
                size += len(b)
                if size >= max_bytes:
                    return np.concatenate(chunks)
    if not chunks:
        raise RuntimeError("no local text found for the training corpus")
    return np.concatenate(chunks)


def corpus_sha256(corpus: np.ndarray) -> str:
    import hashlib

    return hashlib.sha256(corpus.tobytes()).hexdigest()


def _init_params(rng):
    import jax
    import jax.numpy as jnp

    keys = jax.random.split(rng, 4 + 8 * N_LAYERS)
    s = 1.0 / np.sqrt(D_MODEL)
    p = {
        "embed": jax.random.normal(keys[0], (VOCAB, D_MODEL)) * 0.02,
        "pos": jax.random.normal(keys[1], (SEQ, D_MODEL)) * 0.02,
        "out": jax.random.normal(keys[2], (D_MODEL, VOCAB)) * s,
    }
    for i in range(N_LAYERS):
        k = keys[4 + 8 * i : 12 + 8 * i]
        p[f"l{i}"] = {
            "q": jax.random.normal(k[0], (D_MODEL, D_MODEL)) * s,
            "k": jax.random.normal(k[1], (D_MODEL, D_MODEL)) * s,
            "v": jax.random.normal(k[2], (D_MODEL, D_MODEL)) * s,
            "o": jax.random.normal(k[3], (D_MODEL, D_MODEL)) * s,
            "w1": jax.random.normal(k[4], (D_MODEL, D_FF)) * s,
            "w2": jax.random.normal(k[5], (D_FF, D_MODEL)) * (1.0 / np.sqrt(D_FF)),
            "ln1": jnp.ones((D_MODEL,)),
            "ln2": jnp.ones((D_MODEL,)),
        }
    return p


def _forward(p, tokens):
    import jax
    import jax.numpy as jnp

    def ln(x, g):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5) * g

    x = p["embed"][tokens] + p["pos"]
    mask = jnp.tril(jnp.ones((SEQ, SEQ), bool))
    dh = D_MODEL // N_HEADS
    for i in range(N_LAYERS):
        lp = p[f"l{i}"]
        h = ln(x, lp["ln1"])
        q = (h @ lp["q"]).reshape(SEQ, N_HEADS, dh).transpose(1, 0, 2)
        k = (h @ lp["k"]).reshape(SEQ, N_HEADS, dh).transpose(1, 0, 2)
        v = (h @ lp["v"]).reshape(SEQ, N_HEADS, dh).transpose(1, 0, 2)
        s = jnp.einsum("htd,hsd->hts", q, k) / np.sqrt(dh)
        s = jnp.where(mask[None], s, -1e30)
        a = jax.nn.softmax(s, axis=-1)
        att = jnp.einsum("hts,hsd->htd", a, v).transpose(1, 0, 2).reshape(SEQ, D_MODEL)
        x = x + att @ lp["o"]
        h = ln(x, lp["ln2"])
        x = x + jax.nn.gelu(h @ lp["w1"]) @ lp["w2"]
    return x @ p["out"]


def train_weights(steps: int = 400, batch: int = 8, lr: float = 3e-4,
                  seed: int = 0, log=print):
    """Train the tiny LM; returns {name: np.ndarray} of DLMC-shaped
    trained weight matrices (fp32)."""
    import jax
    import jax.numpy as jnp
    import optax

    corpus = build_corpus()
    log(f"corpus: {len(corpus)} bytes, sha256 {corpus_sha256(corpus)[:16]}…")
    rng = np.random.default_rng(seed)
    params = _init_params(jax.random.PRNGKey(seed))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p, toks):
        logits = jax.vmap(lambda t: _forward(p, t))(toks[:, :-1])
        tgt = toks[:, 1:]
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)
        return nll.mean()

    @jax.jit
    def step(p, st, toks):
        l, g = jax.value_and_grad(loss_fn)(p, toks)
        updates, st = opt.update(g, st)
        return optax.apply_updates(p, updates), st, l

    n = len(corpus) - SEQ - 1
    for it in range(steps):
        ix = rng.integers(0, n, size=batch)
        toks = np.stack([corpus[i : i + SEQ + 1] for i in ix]).astype(np.int32)
        params, opt_state, l = step(params, opt_state, jnp.asarray(toks))
        if it % 50 == 0 or it == steps - 1:
            log(f"step {it}: loss {float(l):.4f}")

    l0 = params["l0"]
    return {
        "attn_q": np.asarray(l0["q"], np.float32),
        "attn_o": np.asarray(l0["o"], np.float32),
        "ffn_w1": np.asarray(l0["w1"], np.float32),
        "ffn_w2": np.asarray(l0["w2"], np.float32),
        # provenance: hash of the exact training corpus (see build_corpus)
        "corpus_sha256": np.frombuffer(
            corpus_sha256(corpus).encode(), np.uint8
        ),
    }


def magnitude_prune(w: np.ndarray, sparsity: float) -> np.ndarray:
    """Zero the smallest-|w| entries globally (the DLMC pruning rule)."""
    flat = np.abs(w).ravel()
    k = int(round(len(flat) * sparsity))
    if k <= 0:
        return w.copy()
    thresh = np.partition(flat, k - 1)[k - 1]
    out = w.copy()
    out[np.abs(out) <= thresh] = 0.0
    return out


def pruned_csr(weights: dict, name: str, sparsity: float):
    """CsrMatrix of a trained weight matrix pruned at ``sparsity``."""
    from sputnik_tpu.formats import csr_from_dense

    return csr_from_dense(magnitude_prune(weights[name], sparsity))


def load_weights(path: str) -> dict:
    """Weight matrices only (provenance keys like corpus_sha256 excluded)."""
    with np.load(path) as z:
        return {k: z[k] for k in z.files if k in WEIGHT_KEYS}


def load_provenance(path: str) -> dict:
    with np.load(path) as z:
        out = {}
        if "corpus_sha256" in z.files:
            out["corpus_sha256"] = z["corpus_sha256"].tobytes().decode()
        return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/dlmc_weights.npz")
    ap.add_argument("--steps", type=int, default=400)
    args = ap.parse_args()
    w = train_weights(steps=args.steps, log=lambda m: print(m, file=sys.stderr))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez_compressed(args.out, **w)
    for k, v in w.items():
        print(f"{k}: {v.shape}, |w| median {np.median(np.abs(v)):.4f}")
    print(f"saved to {args.out}")


if __name__ == "__main__":
    main()
