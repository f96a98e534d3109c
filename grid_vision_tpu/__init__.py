"""grid-vision-tpu: a TPU-native camera+LiDAR occupancy-grid engine.

Brand-new design with the capabilities of rohankhaire-work/grid-vision
(see SURVEY.md): YOLOv4 2D detection, LiDAR association, 3D pose
estimation (PCA L-shape / MultiBin), and a Bayesian log-odds occupancy
grid — all fused into one jitted ``step`` on TPU.
"""

from .config import GridVisionConfig, load_config
from .types import (Boxes, Extrinsics, GridState, LShapePoses, Obs,
                    PointCloud, StepOutput)
from .taxonomy import ObjectClass

__version__ = "0.1.0"

__all__ = [
    "GridVisionConfig", "load_config",
    "Boxes", "Extrinsics", "GridState", "LShapePoses", "Obs",
    "PointCloud", "StepOutput", "ObjectClass",
    "Engine", "Fleet",
]


def __getattr__(name):
    # Lazy heavyweight imports: `import grid_vision_tpu` stays cheap.
    if name == "Engine":
        from .pipeline import Engine
        return Engine
    if name == "Fleet":
        from .parallel import Fleet
        return Fleet
    raise AttributeError(name)
