"""Bytes-on-the-wire accounting for sharded programs.

The weak-scaling story (BASELINE: >= 75% efficiency at >= 2 hosts) rests on
an analytic ICI model; this module grounds that model's INPUT — bytes
moved per step — in the compiled program itself instead of hand counting.
``collective_bytes`` compiles a jitted function and walks its optimized
HLO for communication ops (all-gather / all-reduce / reduce-scatter /
collective-permute / all-to-all), converting each to per-device wire bytes
under the standard bidirectional-ring cost model:

    all-gather:          (P-1)/P * result_bytes
    all-reduce:        2*(P-1)/P * result_bytes   (reduce-scatter + gather)
    reduce-scatter:      (P-1)/P * operand_bytes
    all-to-all:          (P-1)/P * result_bytes
    collective-permute:            result_bytes   (point-to-point)

(The "How to Scale Your Model" collective cost recipe.) The single-chip /
CPU-mesh environment can't measure ICI time, but the BYTE counts are a
property of the compiled HLO — identical to what a real slice would move —
so the analytic model's t_comm = bytes / ici_bw term becomes auditable.

No reference analogue (the reference is single-GPU, SURVEY.md §2.8); this
is infrastructure for the new distributed layer.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List

import jax
import numpy as np

__all__ = ["collective_bytes", "hlo_collectives"]

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16,
}

_COLL_RE = re.compile(
    r"=\s*(?:\(?)([a-z0-9]+)\[([\d,]*)\][^\s]*\s*"
    r"(all-gather|all-reduce|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start)?\(",
)

_GROUPS_RE = re.compile(r"replica_groups=\{?\{([\d,]+)\}")
_IOTA_GROUPS_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]<=\[\d+\]")


def _shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


def hlo_collectives(hlo_text: str, group_size: int | None = None) -> List[Dict]:
    """Parse communication ops out of optimized HLO text.

    Returns one record per op: kind, result bytes, group size, and the
    ring-model wire bytes per device. Group size comes from the op line's
    replica_groups (explicit ``{{0,1,..}}`` or iota ``[G,P]<=[N]`` form);
    shard_map's manual-mode collectives print a degenerate ``{{0}}`` on
    some backends, so callers auditing a single-axis mesh should pass
    ``group_size`` (the mesh axis size) explicitly — it overrides any
    parsed size of 1.
    """
    out = []
    for line in hlo_text.splitlines():
        m = _COLL_RE.search(line)
        if not m:
            continue
        dtype, dims, kind = m.groups()
        rbytes = _shape_bytes(dtype, dims)
        gi = _IOTA_GROUPS_RE.search(line)
        g = _GROUPS_RE.search(line)
        if gi:
            p = int(gi.group(2))
        elif g:
            p = len(g.group(1).split(","))
        else:
            p = jax.device_count()
        if p <= 1 and group_size is not None:
            p = group_size
        if p <= 1:
            wire = 0
        elif kind == "all-reduce":
            wire = 2 * (p - 1) * rbytes // p
        elif kind == "reduce-scatter":
            # operand bytes = result bytes * P (result is the scattered shard)
            wire = (p - 1) * rbytes
        elif kind == "collective-permute":
            wire = rbytes
        else:  # all-gather, all-to-all
            wire = (p - 1) * rbytes // p
        out.append({
            "kind": kind, "result_bytes": rbytes, "group_size": p,
            "wire_bytes_per_device": wire,
        })
    return out


def collective_bytes(fn: Callable, *args, group_size: int | None = None,
                     **kwargs) -> Dict:
    """Compile ``fn(*args, **kwargs)`` and account its collectives.

    Returns {"ops": [...], "total_wire_bytes_per_device": int,
    "by_kind": {kind: bytes}}. Works on any backend — byte counts are a
    compile-time property. ``group_size``: see :func:`hlo_collectives`.
    """
    lowered = jax.jit(lambda *a: fn(*a, **kwargs)).lower(*args)
    compiled = lowered.compile()
    ops = hlo_collectives(compiled.as_text(), group_size=group_size)
    by_kind: Dict[str, int] = {}
    for o in ops:
        by_kind[o["kind"]] = by_kind.get(o["kind"], 0) + o["wire_bytes_per_device"]
    return {
        "ops": ops,
        "total_wire_bytes_per_device": sum(o["wire_bytes_per_device"] for o in ops),
        "by_kind": by_kind,
    }
