from .mesh import make_mesh, shard_table, replicate_table
from .sharded import ShardedWindowScorer

__all__ = ["make_mesh", "shard_table", "replicate_table", "ShardedWindowScorer"]
