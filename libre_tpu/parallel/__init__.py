"""Multi-device decomposition: sort-first (ray tiles) and sort-last (brick
ranges), expressed as jax.sharding meshes + shard_map collectives.

TPU-native replacement for the Equalizer/Collage distributed layer
(livre/eq/, SURVEY.md §2.8, §2.12): screen-space and data-range
decompositions become mesh axes; image compositing becomes an ordered
associative over-reduce along the brick axis.
"""

from libre_tpu.parallel.mesh import make_mesh
from libre_tpu.parallel.compositing import over, fold_over
from libre_tpu.parallel.render import (
    render_rays_sharded,
    shard_bricks_front_to_back,
)
from libre_tpu.parallel.bricked_sharded import (
    build_sharded_slabs,
    render_store_grid_sharded,
)

__all__ = [
    "make_mesh",
    "over",
    "fold_over",
    "render_rays_sharded",
    "shard_bricks_front_to_back",
    "build_sharded_slabs",
    "render_store_grid_sharded",
]
