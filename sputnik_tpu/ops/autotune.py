"""Measure-and-pick autotuning over registry variants.

The reference dispatches first-fit over its kernel registry and leaves a
"TODO: do something smarter" (``block/dsd/cutlass/dsd.cu:57-74``). This is
the smarter thing: time every ``can_implement``-compatible variant on the
actual operands (device-trace timing through the dispatch-latency-proof
harness) and remember the winner for that problem signature.

    variant = autotune("dsd", a, b)           # -> best variant name
    out = ops.matmul_dsd(a, b)                # dispatch consults the cache

``registry.dispatch`` consults the cache BEFORE first-fit, so after tuning
once the winner is picked automatically — no ``variant=`` needed anywhere.
The cache persists on disk (``~/.cache/sputnik_tpu/autotune.json``, or
``$SPUTNIK_TPU_TUNE_CACHE``) keyed by (backend chip, op, static problem
signature): the frozen first-fit crossover constants get re-measured per
chip instead of hard-coded. Tuning runs real kernels — do it once at setup
time, not inside a training step (and never under jit: it needs concrete
operands).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

from sputnik_tpu.ops import registry

__all__ = ["autotune", "benchmark_variants", "cached_variant", "clear_cache"]

_CACHE: Optional[Dict[str, str]] = None  # loaded lazily from disk

# Bump (via the package version) whenever kernels / can_implement predicates
# change semantics: a cache written by a different library build is discarded
# on load instead of silently overriding first-fit (ADVICE r2).
def _cache_version() -> str:
    try:
        from sputnik_tpu import __version__

        return __version__
    except Exception:
        return "unknown"


def _cache_path() -> str:
    return os.environ.get(
        "SPUTNIK_TPU_TUNE_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "sputnik_tpu", "autotune.json"
        ),
    )


def _load_cache() -> Dict[str, str]:
    global _CACHE
    if _CACHE is None:
        try:
            with open(_cache_path()) as f:
                raw = json.load(f)
            # Versioned schema: {"version": ..., "entries": {...}}. A cache
            # written by another library build (or the old flat schema) is
            # discarded so stale winners can't override first-fit.
            if (
                isinstance(raw, dict)
                and raw.get("version") == _cache_version()
                and isinstance(raw.get("entries"), dict)
            ):
                _CACHE = dict(raw["entries"])
            else:
                _CACHE = {}
        except Exception:
            _CACHE = {}
    return _CACHE


def _save_cache():
    path = _cache_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(
                {"version": _cache_version(), "entries": _load_cache()},
                f,
                indent=1,
                sort_keys=True,
            )
    except OSError:
        pass  # read-only filesystems: cache stays process-local


_CHIP: Optional[str] = None


def _chip() -> str:
    global _CHIP
    if _CHIP is None:
        try:
            import jax

            dev = jax.devices()[0]
            _CHIP = getattr(dev, "device_kind", None) or jax.default_backend()
        except Exception:
            _CHIP = "unknown"
    return _CHIP


# Known dispatch kwargs and their defaults: a kwarg is dropped from the
# signature iff its value equals ITS OWN declared default, so explicit-default
# and absent hash identically without assuming every default is falsy
# (ADVICE r2: a future truthy-default kwarg must not collide with
# explicit-False). Unknown kwargs are always included.
_SIGNATURE_DEFAULTS = {
    "transpose_a": False,
    "transpose_b": False,
    "out_dtype": None,
    "schedule": None,
    "plan": None,
    "precision": None,
    "scale": None,
}


def _signature(op: str, args, kwargs) -> str:
    sig = [_chip(), op]
    for a in args:
        shape = getattr(a, "shape", None)
        dtype = getattr(a, "dtype", None)
        bs = getattr(a, "block_size", None)
        nnz = getattr(a, "nnz_blocks", None) or getattr(a, "nnz", None)
        sig.append((str(type(a).__name__), shape, str(dtype), bs, nnz))
    for k in sorted(kwargs):
        v = kwargs[k]
        if k in _SIGNATURE_DEFAULTS:
            if v is _SIGNATURE_DEFAULTS[k] or v == _SIGNATURE_DEFAULTS[k]:
                continue
        elif v is None:
            # Unknown kwarg explicitly None: treat as absent (None is the
            # universal "unset" sentinel for optional operands).
            continue
        if isinstance(v, (bool, int, float, str)):
            sig.append((k, v))
        else:
            # dtype-likes (out_dtype=jnp.bfloat16 etc.) must distinguish
            # cache entries; anything unhashable-to-a-dtype is skipped.
            try:
                import jax.numpy as jnp

                sig.append((k, str(jnp.dtype(v))))
            except Exception:
                pass
    return "|".join(map(str, sig))


def cached_variant(op: str, args, kwargs) -> Optional[str]:
    """Tuned winner for this problem signature, or None (cache only — never
    measures; safe to call at trace time with tracer operands). Returns
    immediately when the cache is empty, keeping the untuned dispatch
    hot path free of signature-hashing cost."""
    cache = _load_cache()
    if not cache:
        return None
    return cache.get(_signature(op, args, kwargs))


def benchmark_variants(op: str, *args, chain: int = 8, runs: int = 3, **kwargs):
    """Time every compatible variant of ``op`` on these operands.

    Returns {variant_name: seconds} (device time), skipping variants whose
    ``can_implement`` rejects the problem or whose launch fails.
    """
    from sputnik_tpu.formats import BlockSparseMatrix
    from sputnik_tpu.utils.profiling import device_time

    # device_time jits the launch, which would turn sparse METADATA into
    # tracers and silently disqualify every host-planned variant (gres,
    # panel, flat schedules) from tuning. Close over the concrete
    # descriptors and pass only the data arrays through jit: planning sees
    # concrete metadata, the timed computation still sees traced values.
    datas, rebuilds = [], []
    for x in args:
        if isinstance(x, BlockSparseMatrix):
            datas.append(x.data)
            rebuilds.append(lambda d, x=x: x.with_data(d))
        else:
            datas.append(x)
            rebuilds.append(lambda d: d)

    timings = {}
    for v in registry.variants_for(op):
        try:
            if not v.can_implement(*args, **kwargs):
                continue
        except Exception:
            continue

        def run(*a, _launch=v.launch):
            out = _launch(*[rb(ai) for rb, ai in zip(rebuilds, a)], **kwargs)
            return getattr(out, "data", None) if hasattr(out, "data") else out

        try:
            m = device_time(run, *datas, chain=chain, runs=runs)
            timings[v.name] = m["time_s"]
        except Exception:
            continue
    return timings


def autotune(op: str, *args, timings: dict | None = None, **kwargs) -> str:
    """Best variant name for this problem (cached by chip + signature,
    persisted to disk; subsequent dispatches pick it up automatically).
    Pass ``timings`` (a ``benchmark_variants`` result) to persist a winner
    without re-measuring."""
    cache = _load_cache()
    key = _signature(op, args, kwargs)
    if key in cache:
        return cache[key]
    if timings is None:
        timings = benchmark_variants(op, *args, **kwargs)
    if not timings:
        raise NotImplementedError(
            f"{op}: no variant can implement this problem "
            f"(tried {[v.name for v in registry.variants_for(op)]})"
        )
    best = min(timings, key=timings.get)
    cache[key] = best
    _save_cache()
    return best


def clear_cache(*, all_chips: bool = False):
    """Drop tuned entries for the CURRENT chip (signatures are prefixed with
    the chip kind, so other chips' entries in the shared per-user cache file
    are preserved). ``all_chips=True`` wipes the whole cache file — a global
    side effect across every project on the machine (ADVICE r2)."""
    cache = _load_cache()
    if all_chips:
        cache.clear()
        try:
            os.remove(_cache_path())
        except OSError:
            pass
        return
    prefix = _chip() + "|"
    for k in [k for k in cache if k.startswith(prefix)]:
        del cache[k]
    _save_cache()
