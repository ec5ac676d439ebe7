from .sharding import (device_mesh, run_advection_sharded, shard_particles,
                       replicate)

__all__ = ["device_mesh", "run_advection_sharded", "shard_particles",
           "replicate"]
