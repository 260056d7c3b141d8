"""Measure-and-pick autotuning over registry variants.

The reference dispatches first-fit over its kernel registry and leaves a
"TODO: do something smarter" (``block/dsd/cutlass/dsd.cu:57-74``). This is
the smarter thing: time every ``can_implement``-compatible variant on the
actual operands (device-trace timing through the dispatch-latency-proof
harness) and remember the winner for that problem signature.

    variant = autotune("dsd", a, b)           # -> best variant name
    out = ops.matmul_dsd(a, b, variant=variant)

Results are cached per (op, static problem signature) for the process
lifetime; ``clear_cache()`` resets. Tuning runs real kernels — do it once
at setup time, not inside a training step.
"""

from __future__ import annotations

from typing import Dict, Tuple

from sputnik_tpu.ops import registry

__all__ = ["autotune", "benchmark_variants", "clear_cache"]

_CACHE: Dict[Tuple, str] = {}


def _signature(op: str, args, kwargs) -> Tuple:
    sig = [op]
    for a in args:
        shape = getattr(a, "shape", None)
        dtype = getattr(a, "dtype", None)
        bs = getattr(a, "block_size", None)
        nnz = getattr(a, "nnz_blocks", None) or getattr(a, "nnz", None)
        sig.append((str(type(a).__name__), shape, str(dtype), bs, nnz))
    for k in sorted(kwargs):
        v = kwargs[k]
        if isinstance(v, (bool, int, float, str, type(None))):
            sig.append((k, v))
    return tuple(map(str, sig))


def benchmark_variants(op: str, *args, chain: int = 8, runs: int = 3, **kwargs):
    """Time every compatible variant of ``op`` on these operands.

    Returns {variant_name: seconds} (device time), skipping variants whose
    ``can_implement`` rejects the problem or whose launch fails.
    """
    from sputnik_tpu.utils.profiling import device_time

    timings = {}
    for v in registry.variants_for(op):
        try:
            if not v.can_implement(*args, **kwargs):
                continue
        except Exception:
            continue

        def run(*a, _launch=v.launch):
            out = _launch(*a, **kwargs)
            return getattr(out, "data", None) if hasattr(out, "data") else out

        try:
            m = device_time(run, *args, chain=chain, runs=runs)
            timings[v.name] = m["time_s"]
        except Exception:
            continue
    return timings


def autotune(op: str, *args, **kwargs) -> str:
    """Best variant name for this problem (cached by static signature)."""
    key = _signature(op, args, kwargs)
    if key in _CACHE:
        return _CACHE[key]
    timings = benchmark_variants(op, *args, **kwargs)
    if not timings:
        raise NotImplementedError(
            f"{op}: no variant can implement this problem "
            f"(tried {[v.name for v in registry.variants_for(op)]})"
        )
    best = min(timings, key=timings.get)
    _CACHE[key] = best
    return best


def clear_cache():
    _CACHE.clear()
