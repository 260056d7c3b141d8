"""Public op layer — matmuls per layout + registry (reference L3/L2)."""

from sputnik_tpu.ops.matmul import (
    matmul,
    matmul_dsd,
    matmul_dds,
    matmul_sdd,
    matmul_ssd,
    matmul_sds,
    matmul_dss,
)
from sputnik_tpu.ops import registry

__all__ = [
    "matmul",
    "matmul_dsd",
    "matmul_dds",
    "matmul_sdd",
    "matmul_ssd",
    "matmul_sds",
    "matmul_dss",
    "registry",
]
