from .mesh import create_mesh, replicate_tree, shard_batch

__all__ = ["create_mesh", "replicate_tree", "shard_batch"]
