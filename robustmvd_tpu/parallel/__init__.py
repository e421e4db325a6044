from .mesh import (
    MeshSpec,
    data_sharding,
    init_distributed,
    make_mesh,
    replicate_sharding,
)

__all__ = [
    "MeshSpec",
    "make_mesh",
    "data_sharding",
    "replicate_sharding",
    "init_distributed",
]
