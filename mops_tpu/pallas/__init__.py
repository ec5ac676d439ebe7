from .stage_kernel import (fused_streamline_step, pack_vertex_table,
                           pallas_available, resolve_use_pallas)

__all__ = ["fused_streamline_step", "pack_vertex_table", "pallas_available",
           "resolve_use_pallas"]
