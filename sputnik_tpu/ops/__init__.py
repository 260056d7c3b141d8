"""Public op layer — matmuls per layout + registry (reference L3/L2)."""

from sputnik_tpu.ops import matmul as _matmul_module  # noqa: F401 (module ref, bound before the function shadows the name)
from sputnik_tpu.ops.matmul import (
    matmul,
    matmul_dsd,
    matmul_dds,
    matmul_sdd,
    matmul_ssd,
    matmul_sds,
    matmul_dss,
    matmul_sss,
    FlatSchedule,
    plan_ssd,
    plan_sds,
    plan_dss,
    plan_sss,
)
from sputnik_tpu.ops import registry
from sputnik_tpu.ops.autodiff import make_differentiable, grad, value_and_grad
from sputnik_tpu.ops.softmax import bsr_softmax, sdd_softmax
from sputnik_tpu.ops import csr
from sputnik_tpu.ops import quant
from sputnik_tpu.ops.autotune import autotune, benchmark_variants

_AD = make_differentiable(_matmul_module)


def _freeze(opts):
    return tuple(sorted(opts.items()))


# Differentiable entry points (custom VJPs keeping every backward sparse).
def dsd(a, b, *, transpose_a=False, transpose_b=False, **opts):
    return _AD["dsd"](a, b, transpose_a, transpose_b, _freeze(opts))


def dds(a, b, *, transpose_a=False, transpose_b=False, **opts):
    return _AD["dds"](a, b, transpose_a, transpose_b, _freeze(opts))


def sdd(a, b, topology, *, transpose_a=False, transpose_b=False, **opts):
    return _AD["sdd"](a, b, topology, transpose_a, transpose_b, _freeze(opts))


def ssd(a, b, topology, *, transpose_a=False, transpose_b=False, **opts):
    return _AD["ssd"](a, b, topology, transpose_a, transpose_b, _freeze(opts))


def sds(a, b, topology, *, transpose_a=False, transpose_b=False, **opts):
    return _AD["sds"](a, b, topology, transpose_a, transpose_b, _freeze(opts))


def dss(a, b, *, transpose_a=False, transpose_b=False, **opts):
    return _AD["dss"](a, b, transpose_a, transpose_b, _freeze(opts))


def sss(a, b, topology, *, transpose_a=False, transpose_b=False, **opts):
    return _AD["sss"](a, b, topology, transpose_a, transpose_b, _freeze(opts))


__all__ = [
    "matmul",
    "matmul_dsd",
    "matmul_dds",
    "matmul_sdd",
    "matmul_ssd",
    "matmul_sds",
    "matmul_dss",
    "matmul_sss",
    "dsd",
    "dds",
    "sdd",
    "ssd",
    "sds",
    "dss",
    "FlatSchedule",
    "plan_ssd",
    "plan_sds",
    "plan_dss",
    "registry",
    "quant",
    "grad",
    "value_and_grad",
    "bsr_softmax",
    "sdd_softmax",
    "csr",
    "autotune",
    "benchmark_variants",
]
