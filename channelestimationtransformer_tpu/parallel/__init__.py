from .mesh import batch_sharding, make_mesh, replicate_sharding

__all__ = ["batch_sharding", "make_mesh", "replicate_sharding"]
