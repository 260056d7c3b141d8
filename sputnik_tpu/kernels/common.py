"""Shared helpers for the Pallas BSR/CSR kernels."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def use_interpret() -> bool:
    """Run Pallas in interpreter mode off-TPU (CI runs on a CPU mesh)."""
    return jax.default_backend() != "tpu"


def compiler_params(dimension_semantics, vmem_limit_bytes: int | None = None):
    """Build CompilerParams across jax versions.

    ``vmem_limit_bytes`` raises Mosaic's scoped-VMEM ceiling above the 16 MB
    default (v5e has 128 MB physical VMEM) for kernels that pin large
    operand blocks, e.g. whole-expert W strips in the dropless FFN.
    """
    cls = getattr(pltpu, "CompilerParams", None) or getattr(
        pltpu, "TPUCompilerParams"
    )
    kw = {}
    if vmem_limit_bytes is not None:
        kw["vmem_limit_bytes"] = int(vmem_limit_bytes)
    return cls(dimension_semantics=tuple(dimension_semantics), **kw)


def pick_tile(dim: int, preferred: int, minimum: int = 128) -> int:
    """Largest tile <= preferred that divides dim, multiple of `minimum`."""
    t = min(preferred, dim)
    while t > minimum:
        if dim % t == 0 and t % minimum == 0:
            return t
        t -= minimum
    if dim % minimum != 0:
        raise ValueError(f"dimension {dim} not a multiple of {minimum}")
    return minimum


def dot_dims(ta: bool, tb: bool):
    """dot_general dimension_numbers contracting a's K dim with b's K dim.

    Operand layouts follow the reference convention: transposed means the
    array is stored (K, M) / (N, K) and the *math* uses its transpose.
    For 2-D tiles: contract a dim (0 if ta else 1) with b dim (1 if tb else 0).
    """
    return (((0 if ta else 1,), (1 if tb else 0,)), ((), ()))
