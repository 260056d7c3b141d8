"""sputnik_tpu — a TPU-native block-sparse / sparse linear-algebra framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
tgale96/sputnik (the MegaBlocks block-sparse kernel fork of
google-research/sputnik): BSR matmuls in all six dense/sparse output
combinations (DSD, DDS, SDD, SSD, SDS, DSS), the classic Sputnik CSR engine
(SpMM, SDDMM, sparse softmax, row-swizzle), metadata transforms
(transpose, bitmask, row-indices), plus — new territory for the reference —
a mesh-sharded distributed layer and MoE model blocks built on top.

Design notes (vs. the CUDA reference):
  * 128x128 blocks map 1:1 onto the TPU MXU tile; Pallas `BlockSpec`s with
    scalar-prefetched metadata play the role of sputnik's
    `dependent_tile_access_iterator.h` structured gather.
  * All metadata transforms (reference `block/transpose/transpose.cu`,
    `block/bitmask/bitmask.cu`, `block/row_indices/row_indices.cu`) are pure
    jittable JAX ops — no host round-trip, ever.
  * One Pallas kernel body per op covers all four transpose modes via static
    parameters, replacing the reference's 24 kernel instantiation files.
"""

from sputnik_tpu.formats import (
    BlockSparseMatrix,
    CsrMatrix,
    EllMatrix,
    SellMatrix,
    bsr_from_dense,
    csr_from_dense,
)
from sputnik_tpu import ops
from sputnik_tpu import prune
from sputnik_tpu.ops import matmul_dsd, matmul_dds, matmul_sdd, matmul_ssd, matmul_sds, matmul_dss, matmul_sss
from sputnik_tpu.ops import grad, value_and_grad

__version__ = "0.2.0"

__all__ = [
    "BlockSparseMatrix",
    "CsrMatrix",
    "EllMatrix",
    "SellMatrix",
    "bsr_from_dense",
    "csr_from_dense",
    "ops",
    "prune",
    "matmul_dsd",
    "matmul_dds",
    "matmul_sdd",
    "matmul_ssd",
    "matmul_sds",
    "matmul_dss",
    "matmul_sss",
    "grad",
    "value_and_grad",
]
