from .mesh import (factor_devices, field_sharding, field_spec, make_mesh,
                   replicate, shard_field)
from .sharded import make_sharded_raw_step, make_sharded_step

__all__ = ["factor_devices", "field_sharding", "field_spec", "make_mesh",
           "replicate", "shard_field", "make_sharded_raw_step",
           "make_sharded_step"]
