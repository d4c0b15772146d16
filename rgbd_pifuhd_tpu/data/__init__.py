"""Data pipeline (layer L3 + L7 of SURVEY.md).

preprocessing.py — rect crop / NDC transforms / normalization (shared by
                   training and inference readers)
readdata.py      — inference reader (reference readData.py parity)
datasets.py      — TrainDataset / EvalDataset (reference parity over the
                   RENDER/MASK/DEPTH/NORM/PARAM/gen tree)
sampling.py      — surface + uniform point sampling with inside/outside
                   labels (replaces trimesh.sample + mesh.contains)
containment.py   — watertight point-in-mesh test (grid-accelerated ray cast)
synthetic.py     — analytic-mesh synthetic dataset generator (tests/demos)
"""

from .preprocessing import addrect, rect_to_ndc_transform, normalize_image
from .readdata import InferenceDataset
from .containment import points_in_mesh
from .sampling import sample_surface_points, sample_occupancy_points
