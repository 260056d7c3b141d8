"""Shared analytic roofline models for the BSR ops.

One place for the flops / bytes accounting used by ``bench.py``,
``bench/roofline.py`` and ``bench/grid.py``, so every published fraction
measures against the SAME speed-of-light definition.

Byte models are REUSE-AWARE: the streamed dense-operand traffic is floored
at "each distinct tile read once per panel pass" (the compulsory misses —
what a perfect VMEM cache would pay). Without the floor, dense metadata
regimes report fractions > 1 (the round-1 audit measured 1.19-1.55 on DSD)
and the >= 0.8 target stops being falsifiable. With it, sol_t is a true
lower bound: ``frac_sol = sol_t / t <= ~1``.

Reference accounting being mirrored: FLOPS counters in
``block/dsd/dsd_benchmark.cu:113-117`` (2 * nnz * N) and siblings; the
sdd benchmark's apparent block^2 overcount (``sdd_benchmark.cu:107-110``)
is NOT replicated (SURVEY.md section 6 flags it).
"""

from __future__ import annotations

PEAKS = {"bf16_flops": 197e12, "f32_flops": 49e12, "hbm_bps": 819e9,
         # v5e int8 MXU path: 394 TOPS (2x bf16, the spec ratio).
         "int8_ops": 394e12}
# VPU element-op rate: (8 sublanes x 128 lanes) x 4 ALUs per cycle at
# ~950 MHz. Ops that are select/exp/compare bound (SELL reconstruct,
# softmax) hit this wall long before HBM or the MXU; a speed-of-light
# model without it reports unfalsifiable <<1 or >1 fractions for those
# kernels. (The single-ALU 0.96e12 figure made measured SELL kernels
# "beat" the bound 2.7x — the multi-ALU rate is the physical one.)
VPU_ELEM_OPS = 3.9e12


def dsd_model(*, nnz: int, nnz_blocks: int, m: int, n: int, k: int,
              isz: int, bs: int = 128, n_tile: int = 4096,
              touched_deps: int | None = None):
    """dense[M,N] = sparse[M,K] @ dense[K,N] (or any transpose thereof).

    Per nonzero block the kernel gathers one (bs, bn) panel of the dense
    operand; the reuse floor is each TOUCHED panel tile once per panel
    pass (what a perfect cache pays — a dense-operand strip adjacent to
    no nonzero block is never read, which matters below ~25% density;
    round-3 grid measurement showed dsd beating the whole-operand floor
    at d=2048/10%). ``touched_deps`` = distinct contraction-block ids
    among the nonzero blocks; None = assume all k/bs touched. The output
    floor stays the full M x N: rows with no blocks must still be zeroed.
    """
    flops = 2 * nnz * n
    bn = min(n_tile, n)
    n_passes = -(-n // bn)
    td = k // bs if touched_deps is None else touched_deps
    per_pass_stream = nnz_blocks * bs * bn * isz
    per_pass_floor = td * bs * bn * isz  # every TOUCHED (bs, bn) tile once
    bytes_moved = (
        min(per_pass_stream, max(per_pass_floor, bs * bn * isz)) * n_passes
        + nnz * isz * n_passes  # sparse blocks stream once per pass
        + m * n * isz  # output
    )
    return flops, bytes_moved


def sdd_model(*, nnz: int, nnz_blocks: int, m: int, n: int, k: int,
              isz: int, bs: int = 128,
              touched_rows: int | None = None,
              touched_cols: int | None = None):
    """sparse_out = dense @ dense at the output topology: per output block,
    one (bs, K) strip of each input streams in; the reuse floor is each
    TOUCHED input strip read once (an input block-row/column adjacent to
    no output block is never read at all — at low density that is less
    than a full pass, which round-3 measurement proved when sdd beat the
    whole-matrix floor at d=1024/10%). ``touched_rows``/``touched_cols``
    are the distinct block-row / block-column counts of the topology;
    None = assume all touched (dense-topology bound)."""
    flops = 2 * nnz * k
    tr = m // bs if touched_rows is None else touched_rows
    tc = n // bs if touched_cols is None else touched_cols
    stream_a = min(nnz_blocks * bs * k, tr * bs * k) * isz
    stream_b = min(nnz_blocks * bs * k, tc * bs * k) * isz
    return flops, stream_a + stream_b + nnz * isz


def sparse_out_flat_model(*, total_items: int, nnz_out: int, isz: int,
                          bs: int = 128):
    """SSD/SDS via an exact work list: per item one sparse block and one
    (bs, bs) dense tile in; the packed output written once."""
    flops = 2 * total_items * bs ** 3
    bytes_moved = total_items * (2 * bs * bs * isz) + nnz_out * isz
    return flops, bytes_moved


def dss_flat_model(*, total_items: int, m: int, n: int, isz: int,
                   bs: int = 128):
    flops = 2 * total_items * bs ** 3
    bytes_moved = total_items * (2 * bs * bs * isz) + m * n * isz
    return flops, bytes_moved


def softmax_model(*, nnz: int, isz: int):
    # Two-pass softmax (row max, then exp/normalize) reads the data twice
    # and writes once - 3 passes is the structural minimum without
    # buffering whole rows in VMEM.
    return 5 * nnz, 3 * nnz * isz


def sol_time(flops: int, bytes_moved: int, *, peak_flops: float,
             hbm_bps: float, vpu_elems: int = 0) -> float:
    return max(
        flops / peak_flops,
        bytes_moved / hbm_bps,
        vpu_elems / VPU_ELEM_OPS,
    )


def sell_vpu_elems(slots_total: int, chunk: int, tr: int = 128,
                   ops_per_slot: int = 3) -> int:
    """Select-reconstruct VPU work: each slot costs ~3 full (chunk, TR)
    panel ops (compare, select, add) regardless of how few values it
    places — the structural cost of the SELL MXU-panel approach."""
    return ops_per_slot * slots_total * chunk * tr
