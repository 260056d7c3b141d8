"""Distributed layer: mesh-partitioned sparse matmuls (new vs. the
reference, which is single-GPU — SURVEY.md section 2.8)."""

from sputnik_tpu.parallel.sharding import (
    BandedShardedBlockSparseMatrix,
    ShardedBlockSparseMatrix,
    ShardedCsrMatrix,
    ShardedSellMatrix,
    partition_bsr_rows,
    partition_bsr_rows_kbands,
    partition_csr_rows,
    partition_sell_rows,
    partition_sell_cols,
    sharded_dsd,
    sharded_dsd_ring,
    sharded_sdd,
    sharded_spmm,
    sharded_spmm_sell,
    sharded_spmm_kshard,
)
from sputnik_tpu.parallel.comm_audit import collective_bytes, hlo_collectives
from sputnik_tpu.parallel.attention import (
    sharded_block_sparse_attention,
    partition_topology_rows,
)
from sputnik_tpu.parallel.pipeline import (
    pipeline_apply,
    pipeline_train_step,
    simulate_1f1b,
    stack_stage_params,
)
from sputnik_tpu.parallel.ring_attention import (
    RingTopology,
    partition_topology_ring,
    ring_block_sparse_attention,
)

__all__ = [
    "BandedShardedBlockSparseMatrix",
    "ShardedBlockSparseMatrix",
    "ShardedCsrMatrix",
    "ShardedSellMatrix",
    "partition_bsr_rows",
    "partition_bsr_rows_kbands",
    "partition_csr_rows",
    "partition_sell_rows",
    "partition_sell_cols",
    "sharded_dsd",
    "sharded_dsd_ring",
    "sharded_sdd",
    "sharded_spmm",
    "sharded_spmm_sell",
    "sharded_spmm_kshard",
    "sharded_block_sparse_attention",
    "partition_topology_rows",
    "collective_bytes",
    "hlo_collectives",
    "pipeline_apply",
    "pipeline_train_step",
    "simulate_1f1b",
    "stack_stage_params",
    "RingTopology",
    "partition_topology_ring",
    "ring_block_sparse_attention",
]
