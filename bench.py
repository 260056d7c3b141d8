"""Headline benchmark: BSR DSD SpMM (the MegaBlocks forward workhorse).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value        = effective GFLOP/s (2 * nnz * N / t) at the headline config
               (4096^2, 25% block density, block 128, bf16 — the reference
               benchmark grid's d=4096 point, dsd_benchmark.cu:32-46).
vs_baseline  = fraction of the roofline speed-of-light for this config on
               this chip (max of compute-bound and bandwidth-bound time,
               v5e SPEC peak: 197 TFLOP/s bf16, 819 GB/s HBM).
               BASELINE.json's target is >= 0.8. The line also reports
               vs_machine_sol — the same fraction against the CALIBRATED
               machine peak (docs/machine_peak.json, measured 0.92 of
               spec): the spec denominator is unreachable by ANY program
               on this chip (best dense XLA dot: 0.90 of spec,
               docs/mxu_probe.json), so the machine fraction is the one
               that says how close the kernel is to what the silicon
               actually delivers. Both are published; vs_baseline keeps
               the round-1 definition for comparability.

Timing: the axon tunnel adds ~1 ms per dispatch, so wall timing of single
ops is meaningless. Measurement goes through
``utils.profiling.device_time`` — ops chained inside one jitted function
with a row-perturbed operand (the reference's constant-operand
warmup+iterations protocol, dsd_benchmark.cu:82-107; an output-feeding
chain would serialize consecutive kernels on the full previous output,
which the reference's back-to-back launches do not) and per-op DEVICE
time read from a jax.profiler trace; wall-delta is the fallback.

``python bench.py --full`` also writes the reference-mirroring
shape x sparsity grid (+ per-config roofline fractions) to
bench_results.json. Stdout stays one line; progress goes to stderr.
"""

import argparse
import json
import os
import sys

import numpy as np

PEAK_BF16_FLOPS = 197e12  # TPU v5e
PEAK_HBM_BPS = 819e9

CHAIN = 8


# Serious contenders at square large-d configs (the full registry is
# autotune-timeable too, but bench.py bounds its tuning pass to the
# variants that have ever won a published shootout row so a cold cache
# costs a few compiles, not fifteen).
TUNE_SHORTLIST = ("pallas_stream", "pallas_qstream", "pallas_qstream_q2",
                  "pallas_gres")


def _tune_dsd(a, b):
    """Best shortlist variant for this problem under the SAME protocol the
    measurement uses (device_time's row-perturbed chain — the autotuner's
    own discipline), persisted to the autotune cache so plain dispatch
    picks it up. Returns the winner's name (cached: no measuring)."""
    # NB: ``ops.autotune`` the attribute is the FUNCTION (ops/__init__
    # re-export shadows the submodule); import from the module path.
    from sputnik_tpu.ops.autotune import autotune, cached_variant
    from sputnik_tpu.ops import registry
    from sputnik_tpu.utils.profiling import device_time

    hit = cached_variant("dsd", (a, b), {})
    if hit is not None:
        return hit
    timings = {}
    for name in TUNE_SHORTLIST:
        v = next((v for v in registry.variants_for("dsd") if v.name == name),
                 None)
        if v is None or not v.can_implement(a, b):
            continue

        def run(data, b_, _launch=v.launch):
            return _launch(a.with_data(data), b_)

        try:
            m = device_time(run, a.data, b, chain=CHAIN, runs=3,
                            perturb_index=1)
        except Exception as e:  # a broken variant must not kill the bench
            print(f"(tune: {name} failed: {str(e)[:80]})", file=sys.stderr)
            continue
        timings[name] = m["time_s"]
        print(f"(tune: {name} {m['time_s']*1e6:.1f} us/op)", file=sys.stderr)
    if not timings:
        return None
    return autotune("dsd", a, b, timings=timings)


def _bench_dsd(d: int, density: float, dtype_name: str = "bfloat16",
               tune: bool = True):
    import jax.numpy as jnp
    import sputnik_tpu
    from sputnik_tpu.utils import testing
    from sputnik_tpu.utils.profiling import device_time

    dtype = jnp.dtype(dtype_name)
    rng = np.random.default_rng(42)
    a = testing.random_bsr(rng, d, d, int(d * d * density), 128, dtype=dtype)
    b = jnp.asarray(rng.standard_normal((d, d)).astype(np.float32)).astype(dtype)

    variant = _tune_dsd(a, b) if tune else None
    if variant:
        print(f"(dispatch: {variant})", file=sys.stderr)

    # The declared protocol (module docstring): the reference's
    # constant-operand back-to-back launches, realized as a jitted chain
    # whose perturbed dense operand defeats CSE (device_time's "row"
    # mode — Pallas calls are opaque to the simplifier, so slicing cannot
    # hollow the chain). Device seconds come from the jax.profiler trace
    # interval union; wall-delta is the fallback off-TPU.
    def run(data, b_):
        return sputnik_tpu.matmul_dsd(a.with_data(data), b_)

    m = device_time(run, a.data, b, chain=CHAIN, runs=5, perturb_index=1)
    dt, timing, wall = m["time_s"], m["timing"], m.get("wall_s", m["time_s"])

    from sputnik_tpu.bench.models import dsd_model

    itemsize = jnp.dtype(dtype).itemsize
    # Reuse-aware roofline (bench.models.dsd_model): streamed B-panel
    # traffic floored at one full read per panel pass, so the fraction is
    # a true <= ~1 bound (round 1's no-reuse model reported 1.19-1.55).
    flops, bytes_moved = dsd_model(
        nnz=a.nnz, nnz_blocks=a.nnz_blocks, m=d, n=d, k=d, isz=itemsize,
        touched_deps=int(len(np.unique(np.asarray(a.indices)))),
    )
    sol_t = max(flops / PEAK_BF16_FLOPS, bytes_moved / PEAK_HBM_BPS)
    return {
        "time_s": dt,
        "wall_s": wall,
        "timing": timing,
        "gflops": flops / dt / 1e9,
        "sol_gflops": flops / sol_t / 1e9,
        "frac_sol": sol_t / dt,
        "nnz_blocks": a.nnz_blocks,
    }


def _machine_sol_frac(frac_spec_sol: float) -> float | None:
    """The same fraction against the CALIBRATED machine peaks
    (docs/machine_peak.json). The headline config is compute-bound, so
    the conversion is the measured MXU efficiency; absent calibration
    data, the field is omitted rather than guessed."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "docs", "machine_peak.json")
    try:
        with open(path) as f:
            peak = json.load(f)
        return frac_spec_sol / float(peak["mxu_efficiency"])
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="also run the grid")
    ap.add_argument("--d", type=int, default=4096)
    ap.add_argument("--density", type=float, default=0.25)
    ap.add_argument("--no-tune", action="store_true",
                    help="skip the dispatch-tuning pass (first-fit only)")
    args = ap.parse_args()

    r = _bench_dsd(args.d, args.density, tune=not args.no_tune)
    print(
        f"headline: {r['gflops']:.0f} GFLOP/s eff ({r['timing']}), "
        f"{r['frac_sol']:.2f} of roofline SoL; wall/chain {r['wall_s']*1e6:.0f} us/op",
        file=sys.stderr,
    )
    line = {
        "metric": f"bsr_dsd_spmm_bf16_d{args.d}_density{args.density}",
        "value": round(r["gflops"], 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(min(r["frac_sol"], 1.5), 4),
    }
    machine = _machine_sol_frac(r["frac_sol"])
    if machine is not None:
        line["vs_machine_sol"] = round(min(machine, 1.5), 4)

    if args.full:
        grid = []
        for d in (1024, 2048, 4096, 8192):
            for density in (1.0, 0.5, 0.25, 0.1):
                try:
                    g = _bench_dsd(d, density, tune=not args.no_tune)
                    g.update(d=d, density=density)
                    grid.append(g)
                    print(
                        f"d={d} density={density}: {g['gflops']:.0f} GFLOP/s "
                        f"({g['frac_sol']:.2f} of SoL, {g['timing']})",
                        file=sys.stderr,
                    )
                except Exception as e:  # keep the sweep going
                    print(f"d={d} density={density}: FAILED {e}", file=sys.stderr)
        with open("bench_results.json", "w") as f:
            json.dump(grid, f, indent=2)

    print(json.dumps(line))


if __name__ == "__main__":
    main()
