"""Device-time measurement and tracing helpers.

The reference times kernels with cudaEvents (``sputnik/timer.cu:17-32``) and
a warmup+iterations protocol (``dsd_benchmark.cu:82-107``). On this stack
the equivalent discipline is: chain ops inside ONE jitted executable (the
axon TPU tunnel costs ~1-3 ms per dispatch, so wall-clock timing of single
dispatches measures the network, not the chip) and read the executable's
device duration from a ``jax.profiler`` trace.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile
import time
from typing import Callable, Optional

import jax

__all__ = ["device_time", "trace_device_total"]

# Process-wide health flag for the jax.profiler channel. Through the axon
# tunnel a SIGTERM'd trace can wedge the remote profiler session; every
# later start_trace in ANY process then blocks forever. Once a watchdog
# trips, stop retrying for the remainder of this process and use the
# wall-delta fallback protocol instead.
_PROFILER_BROKEN = False


def _profiler_usable() -> bool:
    if _PROFILER_BROKEN:
        return False
    if os.environ.get("SPUTNIK_NO_PROFILER"):
        return False
    return True


def _watchdog(fn, *args, timeout: float) -> bool:
    """Run ``fn(*args)`` in a daemon thread; False if it hangs past timeout.

    A hang marks the profiler broken process-wide (the stuck thread is
    leaked deliberately — there is no way to cancel a blocked RPC).
    """
    global _PROFILER_BROKEN
    import threading

    ok = []
    err = []

    def _run():
        try:
            fn(*args)
            ok.append(True)
        except Exception as e:  # surface as failure, not a hang
            err.append(e)

    t = threading.Thread(target=_run, daemon=True)
    t.start()
    t.join(timeout)
    if t.is_alive():
        _PROFILER_BROKEN = True
        return False
    if err:
        raise err[0]
    return bool(ok)


def trace_device_total(trace_dir: str, name_prefix: str = "jit_") -> Optional[float]:
    """Total seconds of device events whose name starts with ``name_prefix``."""
    r = trace_device_events(trace_dir, name_prefix)
    return r[0] if r else None


def trace_device_events(
    trace_dir: str, name_prefix: str = "jit_"
) -> Optional[tuple]:
    """(total_seconds, n_events): device-busy time per ``name_prefix`` run.

    Two hard-won rules live here:

    * The event COUNT divides, and it must be the OBSERVED count of
      ``name_prefix``* events: through the axon tunnel
      ``block_until_ready`` can return before the device drains, so a
      trace may hold fewer runs than issued — dividing by the expected
      count undercounts (round 2's impossible csr_spmm(mirror) 3.78x).
    * The TIME must be the interval UNION of ALL TPU events, not the
      ``jit_``* events' durations alone: the profiler emits big XLA
      fusions as SIBLING top-level events NEXT TO the ``jit_`` span, so
      glue-heavy executables (e.g. the empty-row masking pass of
      ultra-sparse DSD) lose most of their time when only ``jit_`` spans
      are summed — the round-4 mechanism behind grid rows measuring up to
      2.4x the physical HBM bound. The union also de-duplicates nested
      child events without needing the trace's nesting structure.
    """
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        return None
    with gzip.open(max(files, key=os.path.getmtime)) as f:
        t = json.load(f)
    pids = {}
    for e in t.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    count = 0
    spans = []
    for e in t.get("traceEvents", []):
        if e.get("ph") != "X" or "TPU" not in pids.get(e.get("pid"), ""):
            continue
        ts, dur = e.get("ts"), e.get("dur", 0)
        if ts is None:
            continue
        spans.append((float(ts), float(ts) + float(dur)))
        if e.get("name", "").startswith(name_prefix):
            count += 1
    if not count:
        return None
    spans.sort()
    total = 0.0
    cur_end = -float("inf")
    for start, end in spans:
        if start >= cur_end:
            total += end - start
            cur_end = end
        elif end > cur_end:
            total += end - cur_end
            cur_end = end
    return (total * 1e-6, count)


def device_time(
    op: Callable,
    *args,
    chain: int = 8,
    runs: int = 3,
    perturb_index: int = 0,
    perturb_mode: str = "row",
) -> dict:
    """Per-op device seconds for ``op(*args) -> array-or-pytree``.

    Builds a jitted chain of ``chain`` dependent invocations; arg
    ``perturb_index``'s float leaves get their FIRST slice rewritten with a
    NONLINEAR function of itself and the previous output, so XLA can
    neither CSE the repeats nor algebraically hoist them. (An earlier
    additive-epsilon perturbation was unsound for ops LINEAR in the
    perturbed argument: XLA distributes ``dot(M, b + eps)`` into
    ``dot(M, b) + eps * dot(M, ones)`` and times an AXPY chain — the csr
    mirror row once "measured" an impossible 365 TFLOP/s that way. Pallas
    calls are opaque to the simplifier and were never affected.) The
    update touches one leading slice, so its own cost is negligible.

    ``perturb_mode="roll"``: rotate the operand by a data-dependent shift.

    ``perturb_mode="feed"``: REQUIRED for ops that are pure XLA (jnp.dot,
    einsum, elementwise baselines). Both "row" and "roll" thread the chain
    dependency through a SCALAR of the output, and XLA's DCE then slices
    every intermediate pure-XLA op down to the one element that scalar
    needs — a chain of 8 matmuls compiles to ONE full matmul plus 7
    row-dots, and the "measurement" comes out 5-8x over hardware peak
    (observed on this chip: 1008 "TFLOP/s" bf16 on a 197-peak v5e).
    Pallas calls are opaque to the simplifier, so "row"/"roll" remain
    sound — and cheaper — for them. "feed" rolls the FULL previous output
    into the perturbed operand by a data-dependent shift: every
    intermediate output is fully consumed (no DCE slicing) and the
    data-dependent shift blocks algebraic commutation. Requires the op's
    first output leaf to have the perturbed leaves' shape (e.g. square
    matmul chains); the roll costs one operand copy per step.

    Timing fallback order (the ``timing`` field names which one ran):
      1. ``device_trace`` — per-op device seconds from a jax.profiler trace
         (total device time of the chained executable / observed events /
         chain). The only protocol that excludes tunnel latency entirely.
      2. ``wall_delta`` — two-point wall protocol when no trace is
         available (CPU backend, wedged profiler channel): the difference
         between a long and a short chain's wall time cancels the
         per-dispatch latency; the median over ``runs`` repeats is
         reported.
      3. ``wall`` — raw wall/chain, last resort (still includes one
         dispatch latency amortized over the chain).
    """
    import jax.numpy as jnp

    def _scalarize(out):
        leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
        acc = 0.0
        for l in leaves:
            acc = acc + l.reshape(-1)[0].astype(jnp.float32)
        return acc

    def make_chained(n):
      @jax.jit
      def chained(*a):
        a = list(a)
        out = None
        for _ in range(n):
            out = op(*a)
            eps = _scalarize(out) * 1e-12
            tgt = a[perturb_index]
            if perturb_mode == "feed":
                bits = jax.lax.bitcast_convert_type(eps, jnp.int32)
                shift = jnp.bitwise_and(bits, 7) + 1
                out_leaf = next(
                    l for l in jax.tree_util.tree_leaves(out)
                    if hasattr(l, "dtype")
                )

                def bump(x):
                    if not (
                        hasattr(x, "dtype")
                        and jnp.issubdtype(x.dtype, jnp.inexact)
                    ):
                        return x
                    if x.shape != out_leaf.shape:
                        raise ValueError(
                            "perturb_mode='feed' needs op output shape "
                            f"{out_leaf.shape} == perturbed operand shape "
                            f"{x.shape}"
                        )
                    return jnp.roll(out_leaf.astype(x.dtype), shift, axis=0)

            elif perturb_mode == "roll":
                bits = jax.lax.bitcast_convert_type(eps, jnp.int32)
                shift = jnp.bitwise_and(bits, 7) + 1

                def bump(x):
                    # Rolls any numeric array (a permutation is exact), so
                    # integer operands — the int8 quantized paths — get the
                    # chain dependency too; leaving them unperturbed would
                    # let XLA CSE the chain into one call.
                    if not (
                        hasattr(x, "dtype")
                        and (jnp.issubdtype(x.dtype, jnp.inexact)
                             or jnp.issubdtype(x.dtype, jnp.integer))
                        and getattr(x, "ndim", 0) >= 1
                        and x.shape[0] > 1
                    ):
                        return x
                    return jnp.roll(x, shift, axis=0)

            else:

                def bump(x):
                    if not (
                        hasattr(x, "dtype")
                        and jnp.issubdtype(x.dtype, jnp.inexact)
                        and getattr(x, "ndim", 0) >= 1
                        and x.shape[0] > 1
                    ):
                        return x
                    row = jnp.abs(x[0]) + eps.astype(x.dtype)  # nonlinear
                    return x.at[0].set(row.astype(x.dtype))

            a[perturb_index] = jax.tree_util.tree_map(bump, tgt)
        return out

      return chained

    chained = make_chained(chain)
    out = jax.block_until_ready(chained(*args))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(runs):
        out = chained(*args)
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / (runs * chain)

    r = None
    if _profiler_usable():
        trace_dir = tempfile.mkdtemp(prefix="sputnik_prof_")
        started = False
        try:
            if not _watchdog(jax.profiler.start_trace, trace_dir, timeout=60.0):
                raise RuntimeError("profiler start_trace hung")
            started = True
            for _ in range(runs):
                out = chained(*args)
            jax.block_until_ready(out)
            # Through the axon tunnel block_until_ready can return before the
            # device has drained the queue; stopping the trace immediately
            # clips events and silently undercounts (trace_device_events). A
            # settle sleep scaled to the measured wall bounds the race.
            time.sleep(min(2.0, max(0.3, 2.0 * wall * runs * chain)))
            # The FIRST stop_trace of a process ships the profiler plugin
            # state through the tunnel and has been measured at 10-100 s;
            # subsequent stops run in ~0.1 s. A short watchdog here flags
            # the profiler broken on call #1 and silently degrades EVERY
            # later measurement to wall_delta (the round-4 mxu_probe
            # garbage-numbers incident) — absorb the one-time cost.
            if not _watchdog(jax.profiler.stop_trace, timeout=300.0):
                raise RuntimeError("profiler stop_trace hung")
            started = False
            r = trace_device_events(trace_dir, "jit_chained")
        except Exception:
            r = None
        finally:
            # A failure between start and stop (e.g. a trace parse error)
            # must not leave the profiler session running — every later
            # start_trace would then fail and silently drop to wall_delta.
            if started:
                try:
                    _watchdog(jax.profiler.stop_trace, timeout=300.0)
                except Exception:
                    pass
            import shutil

            shutil.rmtree(trace_dir, ignore_errors=True)
    if r is not None:
        total, n_events = r
        # One device event per executed run; divide by what actually ran.
        return {
            "time_s": total / (n_events * chain),
            "wall_s": wall,
            "timing": "device_trace",
            "runs_observed": n_events,
        }

    # Fallback when no trace is available (CPU backend, or the tunnel's
    # profiler channel is down): two-point wall timing. One dispatch of a
    # chain-n executable costs latency + n*t_op with the SAME latency for
    # both chain lengths (one host->device round trip each), so the
    # difference of the two walls cancels the tunnel latency exactly:
    #   t_op = (T_long - T_short) / (len_long - len_short)
    # The MEDIAN of the per-repeat estimates is reported: min-of-positives
    # under tunnel-latency noise systematically underestimates t_op.
    long_chain = max(chain * 4, chain + 8)
    chained_long = make_chained(long_chain)
    jax.block_until_ready(chained_long(*args))  # compile + warmup
    ests = []
    for _ in range(max(2, runs)):
        t0 = time.perf_counter()
        out = chained(*args)
        jax.block_until_ready(out)
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = chained_long(*args)
        jax.block_until_ready(out)
        t_long = time.perf_counter() - t0
        est = (t_long - t_short) / (long_chain - chain)
        if est > 0:
            ests.append(est)
    if ests:
        ests.sort()
        med = ests[len(ests) // 2] if len(ests) % 2 else (
            0.5 * (ests[len(ests) // 2 - 1] + ests[len(ests) // 2]))
        return {"time_s": med, "wall_s": wall, "timing": "wall_delta"}
    return {"time_s": wall, "wall_s": wall, "timing": "wall"}
