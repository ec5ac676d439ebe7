from .oracle import (oracle_preprocess, oracle_streamline, oracle_pathline,
                     oracle_velocity_at, oracle_rbf_cell_velocity)

__all__ = ["oracle_preprocess", "oracle_streamline", "oracle_pathline",
           "oracle_velocity_at", "oracle_rbf_cell_velocity"]
