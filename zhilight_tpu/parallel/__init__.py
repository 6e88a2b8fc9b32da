from .kernel_partitioning import enable_kernel_partitioning, kernel_partitioning_enabled
from .mesh import DP_AXIS, TP_AXIS, make_mesh, mesh_from_config, single_device_mesh
from .sharding import COL, REP, ROW, param_pspec, pspec_tree, shard_params

__all__ = [
    "enable_kernel_partitioning",
    "kernel_partitioning_enabled",
    "DP_AXIS",
    "TP_AXIS",
    "make_mesh",
    "mesh_from_config",
    "single_device_mesh",
    "COL",
    "ROW",
    "REP",
    "param_pspec",
    "pspec_tree",
    "shard_params",
]
