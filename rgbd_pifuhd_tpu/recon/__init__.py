"""Volumetric reconstruction (layer L4 of SURVEY.md).

grid.py      on-device dense / coarse-to-fine occupancy-grid evaluation
marching.py  isosurface extraction (vectorized marching tetrahedra; C++
             accelerated when the native extension is built)
mesh.py      OBJ IO, connected components, mesh cleaning, vertex coloring
pipeline.py  gen_mesh / recon drivers (reference reconstruction.py parity)
"""

from .grid import (
    create_grid_transform,
    eval_grid_dense,
    eval_grid_two_phase,
    eval_grid_three_phase_sparse,
)
from .marching import marching_tetrahedra
from .mesh import save_obj_with_color, load_obj, connected_components
from .pipeline import Reconstructor, CoarseReconstructor
