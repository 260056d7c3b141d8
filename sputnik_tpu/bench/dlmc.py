"""DLMC sweep: SpMM + SDDMM at transformer sparsities (BASELINE config:
"DLMC sweep: transformer weight matrices at 70/80/90/95/98% sparsity").

For each (shape, sparsity): time the SELL SpMM / SDDMM kernels (device
trace), report effective GFLOP/s, sustained nnz/s, and the fraction of the
GPU-style no-reuse speed-of-light model (one dense row re-read per nonzero
— what upstream Sputnik's gather engine pays; the SELL kernels never
gather, so > 1.0 is expected at the denser end). Real ``.smtx`` DLMC files
load through ``sputnik_tpu.utils.dlmc.load_smtx`` with the same ops.

Run:  python -m sputnik_tpu.bench.dlmc [--n 64] [--out dlmc_results.json]
Writes a markdown table to stdout and JSON to --out.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

PEAK_HBM_BPS = 819e9
SPARSITIES = [0.70, 0.80, 0.90, 0.95, 0.98]
# DLMC transformer shapes (attention/FFN weights of the base model).
SHAPES = [(512, 512), (2048, 512), (512, 2048), (1024, 1024)]


def _configs(weights_path):
    """Yield (label, rows, cols, sparsity, CsrMatrix). With a trained
    weights file (utils.dlmc_gen), matrices are MAGNITUDE-PRUNED trained
    transformer weights — the DLMC generation protocol; otherwise the
    synthetic skewed-row generator stands in."""
    from sputnik_tpu.utils.dlmc import synthetic_dlmc

    if weights_path:
        from sputnik_tpu.utils.dlmc_gen import (
            WEIGHT_KEYS, load_weights, pruned_csr,
        )

        w = load_weights(weights_path)
        for key in WEIGHT_KEYS:
            for sp in SPARSITIES:
                c = pruned_csr(w, key, sp)
                yield key, c.shape[0], c.shape[1], sp, c
        return
    rng = np.random.default_rng(3)
    for rows, cols in SHAPES:
        for sp in SPARSITIES:
            yield f"{rows}x{cols}", rows, cols, sp, synthetic_dlmc(
                rng, rows, cols, sp
            )


def run(n: int, chain: int = 8, runs: int = 3, weights_path: str | None = None):
    import jax.numpy as jnp
    from sputnik_tpu.formats import SellMatrix
    from sputnik_tpu.ops import csr as csr_ops
    from sputnik_tpu.utils.profiling import device_time

    rng = np.random.default_rng(3)
    rows_out = []
    for label, rows, cols, sp, c in _configs(weights_path):
        nnz = int(c.nnz)
        if nnz == 0:
            continue
        # Production setting: sorted rows (the SortedRowSwizzle) tighten
        # the per-tile slot bounds on skewed row-length distributions;
        # chunk="auto" narrows the column chunks at very high sparsity.
        s = SellMatrix.from_csr(c, chunk="auto", sort_rows=True)
        b = jnp.asarray(rng.standard_normal((cols, n)).astype(np.float32))
        try:
            m = device_time(
                lambda s_, b_: csr_ops.spmm(s_, b_),
                s, b, chain=chain, runs=runs, perturb_index=1,
            )
            t = m["time_s"]
            sol_t = (nnz * (n + 1) * 4 + cols * n * 4) / PEAK_HBM_BPS
            rows_out.append({
                "op": "spmm", "shape": [rows, cols], "sparsity": sp,
                "matrix": label, "nnz": nnz, "time_us": t * 1e6,
                "gflops": 2 * nnz * n / t / 1e9,
                "gnnz_per_s": nnz / t / 1e9,
                "frac_gather_bound": sol_t / t, "timing": m["timing"],
            })
        except Exception as e:
            rows_out.append({"op": "spmm", "shape": [rows, cols],
                             "sparsity": sp, "error": str(e)[:120]})
        # Dense-mirror path (static weight matrices): SpMM as one MXU
        # matmul — at DLMC's small shapes this is the production answer
        # whenever the matrix is static and dense storage fits; the
        # registry picks it via CsrMatrix.with_dense_mirror().
        try:
            cm = c.with_dense_mirror()
            # roll perturbation: pure jnp.dot chains get hoisted by
            # XLA under additive/slice perturbations.
            m = device_time(
                lambda c_, b_: csr_ops.spmm(c_, b_),
                cm, b, chain=chain, runs=runs, perturb_index=1,
                perturb_mode="roll",
            )
            t = m["time_s"]
            sol_t = (nnz * (n + 1) * 4 + cols * n * 4) / PEAK_HBM_BPS
            rows_out.append({
                "op": "spmm_mirror", "shape": [rows, cols], "sparsity": sp,
                "matrix": label, "nnz": nnz, "time_us": t * 1e6,
                "gflops": 2 * nnz * n / t / 1e9,
                "gnnz_per_s": nnz / t / 1e9,
                "frac_gather_bound": sol_t / t, "timing": m["timing"],
            })
        except Exception as e:
            rows_out.append({"op": "spmm_mirror", "shape": [rows, cols],
                             "sparsity": sp, "error": str(e)[:120]})
        # SDDMM at the same pattern (attention-score shape, k = n).
        q = jnp.asarray(rng.standard_normal((rows, n)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((cols, n)).astype(np.float32))
        try:
            m = device_time(
                lambda q_, k_: csr_ops.sddmm(q_, k_, s).values,
                q, k, chain=chain, runs=runs, perturb_index=0,
            )
            t = m["time_s"]
            sol_t = (nnz * (2 * n + 1) * 4) / PEAK_HBM_BPS
            rows_out.append({
                "op": "sddmm", "shape": [rows, cols], "sparsity": sp,
                "matrix": label, "nnz": nnz, "time_us": t * 1e6,
                "gflops": 2 * nnz * n / t / 1e9,
                "gnnz_per_s": nnz / t / 1e9,
                "frac_gather_bound": sol_t / t, "timing": m["timing"],
            })
        except Exception as e:
            rows_out.append({"op": "sddmm", "shape": [rows, cols],
                             "sparsity": sp, "error": str(e)[:120]})
        print(f"# done {label} {rows}x{cols} @ {sp}", file=sys.stderr)
    return rows_out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--out", default="dlmc_results.json")
    ap.add_argument("--weights", default=None,
                    help="trained-weights npz (utils.dlmc_gen) -> "
                         "magnitude-pruned REAL matrices")
    args = ap.parse_args()
    rows = run(args.n, weights_path=args.weights)
    print("| op | shape | sparsity | time (us) | GFLOP/s | Gnnz/s | frac of gather bound |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['op']} | {r['shape']} | {r['sparsity']} | ERROR {r['error'][:40]} | | | |")
        else:
            print(
                f"| {r['op']} | {r['shape'][0]}x{r['shape'][1]} | {r['sparsity']:.2f} "
                f"| {r['time_us']:.1f} | {r['gflops']:.0f} | {r['gnnz_per_s']:.2f} "
                f"| {r['frac_gather_bound']:.2f} |"
            )
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"\n(written to {args.out})", file=sys.stderr)


if __name__ == "__main__":
    main()
