from .mesh import MeshSpec, make_mesh, data_sharding, replicate_sharding

__all__ = ["MeshSpec", "make_mesh", "data_sharding", "replicate_sharding"]
