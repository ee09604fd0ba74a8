from .mesh import make_mesh
from .sharded import ShardedWindowScorer

__all__ = ["make_mesh", "ShardedWindowScorer"]
