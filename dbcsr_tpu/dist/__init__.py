"""Distribution layer: process grids (jax meshes) and block distributions.

Analog of ``src/dist/`` + the grid half of ``src/mpi/`` (SURVEY.md §2.1).
"""
from .distribution import (
    Distribution,
    block_cyclic_dist,
    dist_tile_bins,
    local_map,
    tile_aligned_dist,
    tile_dist_vector,
)
from .grid import AXIS_COL, AXIS_LAYER, AXIS_ROW, ProcessGrid

__all__ = [
    "Distribution",
    "ProcessGrid",
    "block_cyclic_dist",
    "tile_aligned_dist",
    "tile_dist_vector",
    "dist_tile_bins",
    "local_map",
    "AXIS_ROW",
    "AXIS_COL",
    "AXIS_LAYER",
]
