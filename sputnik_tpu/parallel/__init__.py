"""Distributed layer: mesh-partitioned sparse matmuls (new vs. the
reference, which is single-GPU — SURVEY.md section 2.8)."""

from sputnik_tpu.parallel.sharding import (
    ShardedBlockSparseMatrix,
    ShardedCsrMatrix,
    partition_bsr_rows,
    partition_csr_rows,
    sharded_dsd,
    sharded_sdd,
    sharded_spmm,
)

__all__ = [
    "ShardedBlockSparseMatrix",
    "ShardedCsrMatrix",
    "partition_bsr_rows",
    "partition_csr_rows",
    "sharded_dsd",
    "sharded_sdd",
    "sharded_spmm",
]
