from .stage_kernel import fused_streamline_step, pallas_available

__all__ = ["fused_streamline_step", "pallas_available"]
