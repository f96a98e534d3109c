"""Model weight management.

The reference ships three pre-exported blobs (two YOLOv4 ONNX files and
a TensorRT engine, .MISSING_LARGE_BLOBS — all stripped from the snapshot
and unrecoverable). This framework therefore treats weights as
first-class checkpoints: deterministic random init, orbax/npz save and
load keyed by the same config paths the reference used
(detection_weights_file / vision_weights_file in grid_vision_cfg.yaml).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict

import jax

logger = logging.getLogger("grid_vision_tpu.weights")

from ..config import GridVisionConfig
from ..utils import checkpoint
from . import orientation_net, yolov4_tiny


def init_all(cfg: GridVisionConfig, seed: int = 0) -> Dict[str, Any]:
    kd, ko = jax.random.split(jax.random.PRNGKey(seed))
    ycfg = yolov4_tiny.YoloConfig(input_size=cfg.resize)
    ocfg = orientation_net.OrientationConfig(
        input_size=cfg.network_height, width=cfg.orientation_width,
        arch=cfg.orientation_arch, s2d_fold=cfg.orientation_s2d_fold)
    return {
        "detector": yolov4_tiny.init_params(kd, ycfg),
        "orientation": orientation_net.init_params(ko, ocfg),
    }


def save_all(params: Dict[str, Any], cfg: GridVisionConfig,
             base_dir: str = ".") -> None:
    det = cfg.detection_weights_file or "weights/detector.npz"
    vis = cfg.vision_weights_file or "weights/orientation.npz"
    for rel, tree in ((det, params["detector"]),
                      (vis, params["orientation"])):
        path = os.path.join(base_dir, rel.lstrip("/"))
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if not path.endswith(".npz"):
            path += ".npz"
        checkpoint.save(path, tree)


def _resolve(base_dir: str, rel: str) -> str:
    """A genuinely absolute existing path wins; otherwise treat leading
    '/' as YAML style ("/weights/x.npz" means weights/x.npz under the
    install dir, like the reference's share-path lookup)."""
    if os.path.isabs(rel) and os.path.exists(rel):
        return rel
    return os.path.join(base_dir, rel.lstrip("/"))


def load_all(cfg: GridVisionConfig, base_dir: str = ".",
             seed: int = 0) -> Dict[str, Any]:
    """Load checkpoints from the configured paths; a missing file falls
    back to deterministic random init with a WARNING (an engine silently
    running on random weights looks exactly like a broken model)."""
    params = init_all(cfg, seed)
    for key, rel in (("detector", cfg.detection_weights_file),
                     ("orientation", cfg.vision_weights_file)):
        if not rel:
            continue
        path = _resolve(base_dir, rel)
        if key == "detector" and path.endswith(".onnx"):
            # Reference-format weights (config/grid_vision_cfg.yaml:5
            # points at weights/yolov4_*.onnx; object_detection.cpp:41-58
            # loads it into ONNX Runtime — here the conv/BN tensors map
            # onto the Flax tree).
            if os.path.exists(path):
                from . import onnx_import
                params[key] = onnx_import.import_yolov4_tiny(path,
                                                             params[key])
            else:
                logger.warning("configured %s weights %r not found; "
                               "using random init", key, rel)
            continue
        if not path.endswith(".npz"):
            path += ".npz"
        if os.path.exists(path):
            params[key] = checkpoint.restore(path, params[key])
        else:
            logger.warning("configured %s weights %r not found; "
                           "using random init", key, rel)
    if cfg.detector_precision == "int8":
        from . import yolov4_int8
        params["detector_q"] = yolov4_int8.quantize_detector(
            params["detector"])
    return params
