"""Kernel-variant registry with ``can_implement`` first-fit dispatch.

Reproduces the shape of the reference's dispatcher
(``block/dsd/cutlass/dsd.cu:30-74``): a per-op list of
``(can_implement, launch)`` pairs walked in order, launching the FIRST
compatible variant, with a full problem dump raised when none matches
(the reference logs FATAL, ``cutlass/dsd.cu:69-72``). Autotuned tile
configurations slot in as additional variants.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Callable, Dict, List

__all__ = ["KernelVariant", "register", "dispatch", "dispatch_name",
           "variants_for"]

# The reference's SPUTNIK_LOG (logging.h:34-43); enable with
# logging.getLogger("sputnik_tpu").setLevel(logging.DEBUG).
log = logging.getLogger("sputnik_tpu")


@dataclasses.dataclass(frozen=True)
class KernelVariant:
    name: str
    can_implement: Callable[..., bool]  # (*args, **kwargs) -> bool
    launch: Callable  # the kernel entry point


_REGISTRY: Dict[str, List[KernelVariant]] = {}

_AUTOTUNE_MODULE = None


def _autotune_module():
    """Import the autotune MODULE once (the ops package re-exports an
    `autotune` FUNCTION that shadows the module name, so attribute-style
    imports grab the wrong object; cached to keep dispatch cheap)."""
    global _AUTOTUNE_MODULE
    if _AUTOTUNE_MODULE is None:
        import importlib

        _AUTOTUNE_MODULE = importlib.import_module("sputnik_tpu.ops.autotune")
    return _AUTOTUNE_MODULE


def register(op: str, name: str, can_implement, launch, *, index: int | None = None):
    variants = _REGISTRY.setdefault(op, [])
    v = KernelVariant(name=name, can_implement=can_implement, launch=launch)
    if index is None:
        variants.append(v)
    else:
        variants.insert(index, v)
    return v


def variants_for(op: str) -> List[KernelVariant]:
    return list(_REGISTRY.get(op, []))


def _select(op: str, args, kwargs, variant: str | None = None) -> KernelVariant:
    """The variant ``dispatch`` would launch for this problem (tuned cache
    first, then ``can_implement`` first-fit) — shared by :func:`dispatch`
    and :func:`dispatch_name`."""
    variants = _REGISTRY.get(op, [])
    if variant is not None:
        for v in variants:
            if v.name == variant:
                return v
        raise ValueError(f"{op}: no variant named {variant!r}")
    # Tuned winner first (the reference's "TODO: do something smarter",
    # cutlass/dsd.cu:57-74): consult the persistent autotune cache by
    # problem signature; stale entries fall through to first-fit.
    tuned = _autotune_module().cached_variant(op, args, kwargs)
    if tuned is not None:
        for v in variants:
            if v.name == tuned:
                try:
                    ok = v.can_implement(*args, **kwargs)
                except Exception:
                    ok = False
                if ok:
                    log.debug("%s: dispatching tuned %s", op, tuned)
                    return v
                break
    for v in variants:
        if v.can_implement(*args, **kwargs):
            if log.isEnabledFor(logging.DEBUG):
                log.debug(
                    "%s: dispatching %s (shapes=%s)",
                    op,
                    v.name,
                    [getattr(a, "shape", None) for a in args],
                )
            return v
    # Mirror the reference's FATAL-with-full-shape-dump behavior.
    shapes = [getattr(a, "shape", None) for a in args]
    raise NotImplementedError(
        f"{op}: no registered kernel variant can implement the problem; "
        f"arg shapes={shapes}, kwargs={ {k: v for k, v in kwargs.items() if not hasattr(v, 'shape')} }, "
        f"variants tried={[v.name for v in variants]}"
    )


def dispatch(op: str, *args, variant: str | None = None, **kwargs):
    return _select(op, args, kwargs, variant).launch(*args, **kwargs)


def dispatch_name(op: str, *args, variant: str | None = None, **kwargs) -> str:
    """Name of the variant :func:`dispatch` would pick, without launching —
    the observability hook for tests and dispatch debugging."""
    return _select(op, args, kwargs, variant).name
