"""Configuration for the grid-vision TPU engine.

Mirrors the reference node's 23 declared ROS parameters key-for-key
(reference: src/grid_vision_node.cpp:8-32 declares the defaults;
config/grid_vision_cfg.yaml:1-24 overrides them), plus TPU-specific
capacity/padding knobs that have no reference equivalent (the reference
uses dynamically sized std::vectors; XLA requires static shapes).

Everything in this dataclass is *static* configuration: it is hashable and
is closed over by the jitted ``step`` function, so changing any field
triggers a recompile (exactly like changing a ROS parameter required a
node restart in practice).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import yaml


@dataclasses.dataclass(frozen=True)
class GridVisionConfig:
    # ------------------------------------------------------------------
    # Keys mirrored 1:1 from config/grid_vision_cfg.yaml (reference names).
    # Topics/frames/weight paths are host-side concerns; kept for config
    # file compatibility but unused inside the jitted step.
    # ------------------------------------------------------------------
    image_topic: str = "/carla/hero/front/image"
    lidar_topic: str = "/carla/hero/lidar"
    detection_weights_file: str = ""
    vision_weights_file: str = ""
    lidar_frame: str = "hero/lidar"
    camera_frame: str = "hero/front"
    base_frame: str = "hero"

    camera_image_height: int = 480   # cam_params_.orig_h (grid_vision_node.cpp:25)
    camera_image_width: int = 640    # cam_params_.orig_w (:26)
    network_height: int = 224        # orientation net input (:27)
    network_width: int = 224         # (:28)
    confidence_threshold: float = 0.6  # (:15, yaml:13)
    iou_threshold: float = 0.6         # (:16, yaml:14)
    fx: float = 320.0
    fy: float = 320.0
    cx: float = 320.0
    cy: float = 240.0
    k_near: int = 4                  # yaml:20 (code default is 10, :18 — quirk Q9)
    grid_x: int = 50                 # meters (uint8 in reference)
    grid_y: int = 20
    resolution: float = 0.1
    use_vision_orientation: bool = True

    # detection_network_input_size — declared at grid_vision_node.cpp:17
    # (named ``resize_`` in the node), absent from the YAML so the code
    # default 416 always applies.
    detection_network_input_size: int = 416

    # ------------------------------------------------------------------
    # Static capacities (TPU-only: fixed shapes for XLA).
    # ------------------------------------------------------------------
    max_points: int = 16384          # padded point-cloud capacity P
    max_detections: int = 64         # padded post-NMS box capacity D
    max_candidates: int = 256        # boxes kept after confidence threshold,
                                     # pre-NMS (top-k by confidence)
    max_orientation_batch: int = 8   # reference TRT max_batch_size_ = 8
                                     # (vision_orientation.hpp:53); unlike the
                                     # reference we clamp instead of
                                     # overflowing (quirk Q7).
    max_points_per_box: int = 1024   # per-box sub-cloud capacity for the PCA
                                     # path (reference keeps all points;
                                     # we cap and log when truncating)
    max_static_depth: int = 64       # kNN-depth slots for STATIC boxes.
                                     # The reference computes median
                                     # cloud depth for EVERY static box
                                     # (computeDepthForBoundingBoxes
                                     # receives static_bboxes,
                                     # grid_vision_node.cpp:168-184), so
                                     # the default (== max_detections)
                                     # disables compaction and matches
                                     # it exactly. Setting this BELOW
                                     # max_detections is a perf opt-in
                                     # (the bench configs use 16): fuse
                                     # compacts the static split to this
                                     # capacity before the kNN (highest-
                                     # confidence first), clamped boxes
                                     # keep the -1.0 depth sentinel, and
                                     # overflow is counted in
                                     # SaturationStats.static_depth_
                                     # clamped.
    ransac_iters: int = 128          # RANSAC plane hypotheses (PCL default
                                     # max_iterations_ = 50; we use more,
                                     # evaluated in parallel, deterministic)
    ransac_distance_threshold: float = 0.04  # cloud_detections.cpp:117
    outlier_radius: float = 0.4              # cloud_detections.cpp:152
    outlier_min_neighbors: int = 10          # cloud_detections.cpp:153

    # Occupancy-grid constants (occupancy_grid.hpp:25-31 and the hardcoded
    # +0.85 at occupancy_grid.cpp:182 — see quirk Q2: log_odds_free_ and
    # log_odds_occupied_ are declared in the reference but never used).
    log_odds_prior: float = 0.0
    init_probability: float = 0.5
    log_odds_decay: float = -0.2
    min_log_odds: float = -2.0
    max_log_odds: float = 3.6
    log_odds_hit: float = 0.85       # the hardcoded occupied increment

    # ------------------------------------------------------------------
    # Engine behavior flags (no reference equivalent).
    # ------------------------------------------------------------------
    compat: bool = True              # preserve reference quirks Q1-Q11 exactly
    raycast_free_space: bool = False # extension: DDA raycast carving
                                     # (must be False for bit-compat — Q2)
    class_aware_nms: bool = False    # extension: per-class suppression
                                     # (fixes quirk Q3 when wanted)
    yaw_aware_rasterization: bool = False  # extension: rotated-rectangle
                                     # footprints (fixes quirk Q11)
    vision_depth_refine: bool = False  # extension: rescale the Deep3DBox
                                     # location to the kNN median cloud
                                     # depth (measured: median position
                                     # error 5.2 m -> cloud-limited;
                                     # docs/QUALITY.md pose section)
    compute_dtype: str = "float32"   # "bfloat16" for fast conv path
    detector_precision: str = "float"  # "int8" runs the quantized
                                     # detector (models/yolov4_int8) —
                                     # a precision knob like
                                     # compute_dtype/knn_backend: 2x
                                     # MXU rate, mAP within ~0.02
    grid_backend: str = "xla"        # "xla" (einsum rasterizer) or
                                     # "pallas" (fused one-pass kernel;
                                     # bit-equal, interpret-mode on CPU)
    detector_s2d_stem: bool = False  # stem 3x3/s2 convs as space-to-
                                     # depth + 2x2/s1 (EXACT weight
                                     # rearrangement, same math — see
                                     # models/yolov4_tiny._s2d_conv and
                                     # tests/test_models.py equivalence
                                     # test); pure layout/perf knob, no
                                     # compat gating needed. Measured
                                     # SLOWER on v5e (-16%, see the
                                     # YoloConfig.s2d_stem note) so it
                                     # defaults off.
    detector_stem_backend: str = "xla"  # "pallas" fuses resize + the
                                     # two stem convs into one VMEM-
                                     # resident kernel per image
                                     # (ops/pallas_stem.py) — the thin-
                                     # channel front end XLA runs at
                                     # 5.7-31 TF/s with HBM bounces;
                                     # "pallas2" adds the fused first
                                     # CSP stage kernel on top
                                     # (ops/pallas_csp.py — measured
                                     # SLOWER, 5559 vs 7197 fps: at
                                     # C=64 the materialized im2col
                                     # outweighs the matmul win; see
                                     # docs/PERF.md); "pallas3" is the
                                     # same CSP-stage fusion with FLAT
                                     # lane-aligned activations (halo-
                                     # junk masking) fixing pallas2's
                                     # misaligned 2D tap slabs; "im2col"
                                     # runs the same phase-resize +
                                     # packed-matmul math as batched
                                     # XLA ops. All float-rounding-
                                     # equal (tests/
                                     # test_pallas_stem.py), float
                                     # detector only
    knn_backend: str = "xla"         # "xla" (exact, k argmin passes),
                                     # "approx" (TPU partial-reduction
                                     # top-k, recall 0.99 — markers only,
                                     # grid unaffected per quirk Q6), or
                                     # "pallas" (VMEM-resident k-NN)
    orientation_width: int = 32     # orientation-net stem width (the
                                    # TRT engine's architecture is
                                    # unknown; this sizes the ResNet
                                    # capacity / FLOPs tradeoff — 32
                                    # measured 0.69 -> ~0.2 ms/frame at
                                    # equal output contract)
    orientation_arch: str = "s2d"   # "s2d" (space-to-depth stem, MXU-
                                    # aligned channels — round-2 default)
                                    # or "resnet" (round-1 ResNet-18)
    orientation_compute: str = "follow"  # orientation-BRANCH compute
                                    # dtype: "follow" (= compute_dtype),
                                    # "float32", or "bfloat16".
                                    # "float32" pins crops + net +
                                    # MultiBin inputs to f32 under a
                                    # bf16 detector. Measured on
                                    # hardware: -7.3% fleet fps
                                    # (5561 -> 5155) and NO e2e grid-
                                    # agreement gain — the bf16-vs-f32
                                    # grid gap is detector box jitter
                                    # through the monocular MultiBin
                                    # depth, not net precision
                                    # (PARITY.json: PCA mode, whose
                                    # depth comes from the f32 cloud,
                                    # passes 99% e2e with the same bf16
                                    # detector). Kept as a knob; the
                                    # shipped config follows.
    orientation_stem_backend: str = "xla"  # "pallas" fuses the whole
                                    # per-crop front end — box crop-
                                    # resize, Q10 standardization
                                    # (folded affinely into the conv),
                                    # and the 12x12/s8 s2d stem conv —
                                    # into one VMEM-resident kernel per
                                    # compacted crop
                                    # (ops/pallas_orient.py). Fleet
                                    # path (fleet_step) with the s2d
                                    # arch + s2d_fold only; equivalence
                                    # pinned by
                                    # tests/test_pallas_orient.py
    orientation_s2d_fold: bool = True  # run the s2d stem as the exact
                                    # equivalent 12x12/s8 conv on raw
                                    # crops (same params, same math —
                                    # skips the s2d transpose, ~8
                                    # us/frame of relayout copies in the
                                    # round-3 fleet profile); pure
                                    # layout/perf knob like
                                    # detector_s2d_stem

    # Packed-wire streaming format (types.Obs.pack_bytes/unpack): what
    # crosses the host->device link per frame. "rgb8"/"float32" is
    # lossless vs the reference's cv_bridge rgb8 ingest; "yuv420" (4:2:0
    # chroma subsampling — what real camera streams carry natively) +
    # "float16" xyz halve the wire bytes again for link-bound deployments
    # (sub-cm point error at 60 m; chroma-flat synthetic scenes decode
    # losslessly in luma).
    wire_image_codec: str = "rgb8"   # "rgb8" | "yuv420"
    wire_cloud_dtype: str = "float32"  # "float32" | "float16"

    # ------------------------------------------------------------------
    # Derived geometry (grid_map semantics).
    # ------------------------------------------------------------------
    @property
    def grid_size(self) -> Tuple[int, int]:
        """Grid buffer size (cells_x, cells_y).

        grid_map::GridMap::setGeometry computes size = round(length /
        resolution) per axis (occupancy_grid.cpp:10 passes Length(grid_x,
        grid_y) and resolution).
        """
        return (
            int(round(self.grid_x / self.resolution)),
            int(round(self.grid_y / self.resolution)),
        )

    @property
    def grid_center(self) -> Tuple[float, float]:
        """Map center position in the base frame.

        The reference sets setPosition(grid_x / 3, 0.0) with integer
        division on a uint8 (occupancy_grid.cpp:11) — quirk Q8: a 50 m map
        is centered 16 m (not 16.67 m) ahead of the robot.
        """
        return (float(self.grid_x // 3), 0.0)

    @property
    def resize(self) -> int:
        """Detector input size alias matching the node's ``resize_``."""
        return self.detection_network_input_size

    def validate(self) -> "GridVisionConfig":
        if math.isclose(self.resolution, 0.0):
            raise ValueError("resolution must be nonzero")
        sx, sy = self.grid_size
        if sx <= 0 or sy <= 0:
            raise ValueError(f"degenerate grid size {(sx, sy)}")
        if not (0.0 <= self.confidence_threshold <= 1.0):
            raise ValueError("confidence_threshold must be in [0, 1]")
        if not (0.0 <= self.iou_threshold <= 1.0):
            raise ValueError("iou_threshold must be in [0, 1]")
        if self.max_candidates < self.max_detections:
            raise ValueError("max_candidates must be >= max_detections")
        if self.compat and (self.raycast_free_space or self.class_aware_nms
                            or self.yaw_aware_rasterization
                            or self.vision_depth_refine
                            or self.detector_precision != "float"):
            raise ValueError(
                "extensions (raycast_free_space / class_aware_nms / "
                "yaw_aware_rasterization / vision_depth_refine / "
                "detector_precision != 'float') deviate from reference "
                "behavior; set compat=False to enable them")
        if self.detector_stem_backend not in ("xla", "pallas",
                                              "pallas2", "pallas3",
                                              "im2col"):
            raise ValueError(
                f"unknown detector_stem_backend "
                f"{self.detector_stem_backend!r}")
        if (self.detector_stem_backend != "xla"
                and self.detector_precision != "float"):
            raise ValueError(
                "detector_stem_backend != 'xla' applies only to the "
                "float detector; it would be silently ignored with "
                f"detector_precision={self.detector_precision!r}")
        if self.orientation_compute not in ("follow", "float32",
                                            "bfloat16"):
            raise ValueError(
                f"unknown orientation_compute {self.orientation_compute!r}")
        if self.orientation_arch not in ("s2d", "resnet"):
            raise ValueError(
                f"unknown orientation_arch {self.orientation_arch!r}")
        if self.orientation_stem_backend not in ("xla", "pallas"):
            raise ValueError(
                f"unknown orientation_stem_backend "
                f"{self.orientation_stem_backend!r}")
        if self.orientation_stem_backend == "pallas" and not (
                self.orientation_arch == "s2d"
                and self.orientation_s2d_fold):
            raise ValueError(
                "orientation_stem_backend='pallas' fuses the s2d_fold "
                "stem; it requires orientation_arch='s2d' and "
                "orientation_s2d_fold=True")
        if self.orientation_stem_backend == "pallas" and (
                self.network_height % 8):
            raise ValueError(
                "orientation_stem_backend='pallas' needs "
                "network_height % 8 == 0")
        if self.detector_precision not in ("float", "int8"):
            raise ValueError(
                f"unknown detector_precision {self.detector_precision!r}")
        if self.wire_image_codec not in ("rgb8", "yuv420"):
            raise ValueError(
                f"unknown wire_image_codec {self.wire_image_codec!r}")
        if self.wire_cloud_dtype not in ("float32", "float16"):
            raise ValueError(
                f"unknown wire_cloud_dtype {self.wire_cloud_dtype!r}")
        if self.wire_image_codec == "yuv420" and (
                self.camera_image_height % 2 or self.camera_image_width % 2):
            raise ValueError("yuv420 wire codec needs even image dims")
        for name in ("max_points", "max_detections", "k_near",
                     "ransac_iters", "max_static_depth"):
            if getattr(self, name) <= 0:
                raise ValueError(f"{name} must be positive")
        return self


_YAML_KEYS = {f.name for f in dataclasses.fields(GridVisionConfig)}


def load_config(path: str, **overrides) -> GridVisionConfig:
    """Load a GridVisionConfig from a ROS-2-style parameter YAML.

    Accepts both the reference layout::

        /**:
          ros__parameters:
            image_topic: ...

    and a flat ``key: value`` mapping. Unknown keys raise (like ROS 2
    rejects undeclared parameters at launch).
    """
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    # Unwrap ROS 2 node-name / ros__parameters nesting.
    if len(raw) == 1:
        inner = next(iter(raw.values()))
        if isinstance(inner, dict) and "ros__parameters" in inner:
            raw = inner["ros__parameters"]
    raw = dict(raw)
    raw.update(overrides)
    unknown = set(raw) - _YAML_KEYS
    if unknown:
        raise KeyError(f"unknown config keys: {sorted(unknown)}")
    return GridVisionConfig(**raw).validate()
