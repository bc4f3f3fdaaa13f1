from ctr_recommendation_tpu.parallel.mesh import make_mesh, single_device_mesh
from ctr_recommendation_tpu.parallel.sharding import (
    batch_sharding,
    batch_specs,
    param_specs,
    tree_shardings,
)

__all__ = [
    "batch_sharding",
    "batch_specs",
    "make_mesh",
    "param_specs",
    "single_device_mesh",
    "tree_shardings",
]
