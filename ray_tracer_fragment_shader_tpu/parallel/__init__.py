from .mesh import TILE_AXIS, make_mesh, replicated, row_sharded
from .shard import render_image_sharded, sharded_value_and_grad

__all__ = ["TILE_AXIS", "make_mesh", "replicated", "row_sharded",
           "render_image_sharded", "sharded_value_and_grad"]
