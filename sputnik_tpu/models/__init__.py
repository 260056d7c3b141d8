"""Model layers built on the sparse ops — the MegaBlocks-style workloads
(the reference's downstream consumer; here they live in-tree)."""

from sputnik_tpu.models.moe import (
    MoEConfig,
    block_diag_topology,
    init_moe_params,
    moe_forward,
    moe_loss,
)

__all__ = [
    "MoEConfig",
    "block_diag_topology",
    "init_moe_params",
    "moe_forward",
    "moe_loss",
]
