"""Measured machine-peak calibration (empirical roofline ceilings).

The roofline fractions published by ``bench.py`` / ``bench/roofline.py``
divide by the v5e SPEC peaks (197 TFLOP/s bf16, 819 GB/s HBM). Spec peaks
are the honest *denominator of record* — they cannot be gamed — but they
are not always *achievable*: if the best dense XLA matmul on this chip
sustains only X < 197 TFLOP/s under the same timing protocol, then X, not
197, is the speed of light any kernel (sparse or dense) can actually
reach, and "fraction of achievable peak" is the number that says how much
headroom our kernels truly left on the table.

This module measures, with the exact ``device_time`` protocol used for
every published number:

* ``dense_bf16_tflops`` — big square ``jnp.dot`` (XLA's own kernel, the
  most favorable matmul this chip will ever run),
* ``dense_f32_tflops`` — same with HIGHEST precision f32,
* ``hbm_gbps`` — a streaming elementwise pass (read+write) over a buffer
  far larger than VMEM,

and writes ``docs/machine_peak.json``. Consumers can then report both
``frac_sol`` (vs spec — unchanged, comparable across rounds) and
``frac_achievable`` (vs measurement — the engineering headroom number).

This mirrors standard empirical-roofline practice (machine ceilings are
*measured* with microbenchmarks, not read off datasheets); the reference
has no analogue — its benchmarks publish raw FLOPS only
(``block/dsd/dsd_benchmark.cu:113-117``).

Run:  python -m sputnik_tpu.bench.calibrate      (on the real TPU)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

from sputnik_tpu.bench.models import PEAKS

PEAK_FILE = os.path.join(os.path.dirname(__file__), "..", "..", "docs",
                         "machine_peak.json")


def load_measured_peaks(path: str | None = None) -> dict | None:
    """Measured peaks dict, or None if calibration has not been run."""
    path = path or PEAK_FILE
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def measure(d: int = 4096, stream_mb: int = 256, chain: int = 8,
            runs: int = 3) -> dict:
    import jax
    import jax.numpy as jnp

    from sputnik_tpu.utils.profiling import device_time

    rng = np.random.default_rng(11)
    out: dict = {
        "device": str(jax.devices()[0]),
        "protocol": {"chain": chain, "runs": runs, "d": d,
                     "stream_mb": stream_mb},
        "spec": {"bf16_tflops": PEAKS["bf16_flops"] / 1e12,
                 "f32_tflops": PEAKS["f32_flops"] / 1e12,
                 "hbm_gbps": PEAKS["hbm_bps"] / 1e9},
    }

    flops = 2.0 * d * d * d

    a16 = jnp.asarray(rng.standard_normal((d, d)), jnp.bfloat16)
    b16 = jnp.asarray(rng.standard_normal((d, d)), jnp.bfloat16)
    # perturb_mode="feed": pure-XLA ops MUST thread the full output into
    # the next step's operand — scalar-dependent perturbations let DCE
    # slice the intermediate matmuls and this row once "measured" a
    # physically impossible 1008 TFLOP/s (5.1x spec) on this v5e.
    m = device_time(lambda x, y: jnp.dot(x, y), a16, b16, chain=chain,
                    runs=runs, perturb_index=0, perturb_mode="feed")
    out["dense_bf16_tflops"] = flops / m["time_s"] / 1e12
    out["dense_bf16_us"] = m["time_s"] * 1e6
    out["dense_bf16_timing"] = m["timing"]
    print(f"# dense bf16 {d}^3: {m['time_s']*1e6:.1f} us  "
          f"{out['dense_bf16_tflops']:.1f} TF "
          f"({out['dense_bf16_tflops']/ (PEAKS['bf16_flops']/1e12):.2f} of "
          f"spec, {m['timing']})", file=sys.stderr, flush=True)

    a32 = a16.astype(jnp.float32)
    b32 = b16.astype(jnp.float32)
    m = device_time(
        lambda x, y: jnp.dot(x, y, precision=jax.lax.Precision.HIGHEST),
        a32, b32, chain=chain, runs=runs, perturb_index=0,
        perturb_mode="feed")
    out["dense_f32_tflops"] = flops / m["time_s"] / 1e12
    print(f"# dense f32(HIGHEST) {d}^3: {m['time_s']*1e6:.1f} us  "
          f"{out['dense_f32_tflops']:.1f} TF", file=sys.stderr, flush=True)

    n_elems = stream_mb * (1 << 20) // 4
    n_elems = (n_elems // 1024) * 1024
    x = jnp.asarray(rng.standard_normal(n_elems), jnp.float32)
    m = device_time(lambda v: v * 1.000001 + 0.5, x, chain=chain, runs=runs,
                    perturb_index=0, perturb_mode="feed")
    stream_bytes = 2.0 * n_elems * 4  # read + write
    out["hbm_gbps"] = stream_bytes / m["time_s"] / 1e9
    print(f"# stream {stream_mb} MB: {m['time_s']*1e6:.1f} us  "
          f"{out['hbm_gbps']:.0f} GB/s "
          f"({out['hbm_gbps']/(PEAKS['hbm_bps']/1e9):.2f} of spec)",
          file=sys.stderr, flush=True)

    out["mxu_efficiency"] = out["dense_bf16_tflops"] / (
        PEAKS["bf16_flops"] / 1e12)
    out["hbm_efficiency"] = out["hbm_gbps"] / (PEAKS["hbm_bps"] / 1e9)
    return out


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=4096)
    ap.add_argument("--out", default=PEAK_FILE)
    args = ap.parse_args()
    res = measure(d=args.d)
    path = os.path.abspath(args.out)
    with open(path, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps({k: round(v, 2) for k, v in res.items()
                      if isinstance(v, float)}))
    print(f"(written to {path})", file=sys.stderr)


if __name__ == "__main__":
    main()
