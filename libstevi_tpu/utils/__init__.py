"""Auxiliary subsystems: profiling/tracing/roofline, checkpoint/resume
(SURVEY §5 — both are new TPU-side scope; the reference has neither)."""

from .profiling import (trace, device_time, cost_analysis, roofline,
                        V5E_HBM_BYTES_PER_S, V5E_PEAK_FLOPS_BF16,
                        V5E_PEAK_FLOPS_F32)
from .checkpointing import (save_checkpoint, load_checkpoint,
                            latest_checkpoint, resumable_iterate)

__all__ = [
    "trace", "device_time", "cost_analysis", "roofline",
    "V5E_HBM_BYTES_PER_S", "V5E_PEAK_FLOPS_BF16", "V5E_PEAK_FLOPS_F32",
    "save_checkpoint", "load_checkpoint", "latest_checkpoint",
    "resumable_iterate",
]
