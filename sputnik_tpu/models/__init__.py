"""Model layers built on the sparse ops — the MegaBlocks-style workloads
(the reference's downstream consumer; here they live in-tree)."""

from sputnik_tpu.models.moe import (
    MoEConfig,
    block_diag_topology,
    init_moe_params,
    moe_forward,
    moe_loss,
)
from sputnik_tpu.models.moe import dropless_moe_forward, dropless_topology
from sputnik_tpu.models.attention import (
    topk_block_topology,
    decode_topk_attention,
    decode_band_attention,
    flash_block_attention,
    band_topology,
    causal_block_topology,
    block_sparse_attention,
    multihead_block_sparse_attention,
)
from sputnik_tpu.models import moe_parallel
from sputnik_tpu.models.transformer import (
    TransformerConfig,
    init_block_params,
    block_forward,
    init_lm_params,
    lm_forward,
    lm_loss,
)
from sputnik_tpu.models.transformer import lm_topologies
from sputnik_tpu.models.transformer import (
    init_decode_caches,
    lm_prefill,
    lm_decode_step,
    lm_generate,
    lm_generate_batched,
)

__all__ = [
    "MoEConfig",
    "block_diag_topology",
    "init_moe_params",
    "moe_forward",
    "moe_loss",
    "dropless_moe_forward",
    "dropless_topology",
    "flash_block_attention",
    "band_topology",
    "causal_block_topology",
    "topk_block_topology",
    "decode_topk_attention",
    "decode_band_attention",
    "block_sparse_attention",
    "multihead_block_sparse_attention",
    "moe_parallel",
    "TransformerConfig",
    "init_block_params",
    "block_forward",
    "init_lm_params",
    "lm_forward",
    "lm_loss",
    "lm_topologies",
    "init_decode_caches",
    "lm_prefill",
    "lm_decode_step",
    "lm_generate",
    "lm_generate_batched",
]
