"""Pallas TPU kernels — the compute layer (analogue of the reference's
CUTLASS extension layer, ``sputnik/block/cutlass/*``)."""

from sputnik_tpu.kernels import bsr_dsd, bsr_sdd, bsr_ssd, bsr_dss, reference

__all__ = ["bsr_dsd", "bsr_sdd", "bsr_ssd", "bsr_dss", "reference"]
