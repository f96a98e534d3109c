"""Pytree value types for the engine.

Everything that crosses the jit boundary is one of these fixed-shape,
mask-carrying pytrees. They replace the reference's dynamically sized
std::vector<BoundingBox> / pcl::PointCloud / grid_map::GridMap with padded
arrays + validity masks (XLA needs static shapes; masking replaces the
reference's data-dependent branches).

Reference counterparts:
  Boxes      <-> std::vector<BoundingBox>   (object_detection.hpp:27-32)
  PointCloud <-> pcl::PointCloud<PointXYZI> (grid_vision_node.hpp:61)
  LShapePoses<-> std::vector<LShapePose>    (cloud_detections.hpp:19-25)
  GridState  <-> OccupancyGridMap.grid_map_ (occupancy_grid.hpp:22)
  Obs        <-> (init_image_, cloud_) latest-frame buffers
                 (grid_vision_node.cpp:79-106)
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .config import GridVisionConfig


def pytree_dataclass(cls):
    """Frozen dataclass registered as a JAX pytree (all fields are leaves)."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@pytree_dataclass
class Boxes:
    """Padded 2D detections in pixel space (SoA layout).

    xyxy: (D, 4) float32 [x_min, y_min, x_max, y_max]
    confidence: (D,) float32
    label: (D,) int32 class ids (ObjectClass)
    valid: (D,) bool
    """

    xyxy: jnp.ndarray
    confidence: jnp.ndarray
    label: jnp.ndarray
    valid: jnp.ndarray

    @staticmethod
    def empty(capacity: int) -> "Boxes":
        return Boxes(
            xyxy=jnp.zeros((capacity, 4), jnp.float32),
            confidence=jnp.zeros((capacity,), jnp.float32),
            label=jnp.full((capacity,), 10, jnp.int32),  # UNKNOWN
            valid=jnp.zeros((capacity,), bool),
        )

    @property
    def capacity(self) -> int:
        return self.xyxy.shape[-2]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    def centers(self) -> jnp.ndarray:
        """Box centers, matching computeDepthForBoundingBoxes's
        ``min + (max - min)/2`` form (cloud_detections.cpp:57-58)."""
        lo = self.xyxy[..., 0:2]
        hi = self.xyxy[..., 2:4]
        return lo + (hi - lo) / 2.0


@pytree_dataclass
class PointCloud:
    """Padded point cloud, packed valid-first.

    xyz: (P, 3) float32; intensity: (P,) float32; count: () int32.
    Points at index >= count are padding (the host packer writes a large
    sentinel so padded points never project into the image or win RANSAC).
    """

    xyz: jnp.ndarray
    intensity: jnp.ndarray
    count: jnp.ndarray

    PAD_SENTINEL = 1.0e8

    @staticmethod
    def empty(capacity: int) -> "PointCloud":
        return PointCloud(
            xyz=jnp.full((capacity, 3), PointCloud.PAD_SENTINEL, jnp.float32),
            intensity=jnp.zeros((capacity,), jnp.float32),
            count=jnp.zeros((), jnp.int32),
        )

    @staticmethod
    def from_numpy(xyz: np.ndarray, intensity: np.ndarray | None,
                   capacity: int) -> "PointCloud":
        """Host-side packer: drops non-finite points, packs valid-first,
        pads with the sentinel. Overflow is stride-subsampled (evenly
        spaced indices) rather than head-truncated, so scans larger than
        capacity keep full spatial coverage."""
        return PointCloud.pack_numpy(xyz, intensity, capacity)[0]

    @staticmethod
    def pack_host(xyz: np.ndarray, intensity: np.ndarray | None,
                  capacity: int):
        """Pure-numpy packer (no device transfer): returns
        (out_xyz (cap,3) f32, out_intensity (cap,) f32, n, dropped)."""
        xyz = np.asarray(xyz, np.float32).reshape(-1, 3)
        if intensity is None:
            intensity = np.zeros((xyz.shape[0],), np.float32)
        intensity = np.asarray(intensity, np.float32).reshape(-1)
        finite = np.isfinite(xyz).all(axis=1)
        xyz, intensity = xyz[finite], intensity[finite]
        dropped = max(0, xyz.shape[0] - capacity)
        if xyz.shape[0] > capacity:
            idx = np.linspace(0, xyz.shape[0] - 1, capacity).astype(np.int64)
            xyz, intensity = xyz[idx], intensity[idx]
        n = xyz.shape[0]
        out_xyz = np.full((capacity, 3), PointCloud.PAD_SENTINEL, np.float32)
        out_int = np.zeros((capacity,), np.float32)
        out_xyz[:n] = xyz[:n]
        out_int[:n] = intensity[:n]
        return out_xyz, out_int, n, dropped

    @staticmethod
    def pack_numpy(xyz: np.ndarray, intensity: np.ndarray | None,
                   capacity: int) -> tuple["PointCloud", int]:
        """from_numpy that also reports how many finite points were
        dropped by subsampling (capacity-saturation telemetry; the
        reference's dynamically-sized cloud never truncates)."""
        out_xyz, out_int, n, dropped = PointCloud.pack_host(
            xyz, intensity, capacity)
        return PointCloud(
            xyz=jnp.asarray(out_xyz),
            intensity=jnp.asarray(out_int),
            count=jnp.asarray(n, jnp.int32),
        ), dropped

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def mask(self) -> jnp.ndarray:
        idx = jnp.arange(self.capacity)
        return idx < self.count


@pytree_dataclass
class LShapePoses:
    """Padded 3D object poses (SoA of reference LShapePose structs).

    position: (N, 3); quat: (N, 4) xyzw; length/width/height: (N,);
    label: (N,) int32; valid: (N,) bool.
    """

    position: jnp.ndarray
    quat: jnp.ndarray
    length: jnp.ndarray
    width: jnp.ndarray
    height: jnp.ndarray
    label: jnp.ndarray
    valid: jnp.ndarray

    @staticmethod
    def empty(capacity: int) -> "LShapePoses":
        quat = jnp.zeros((capacity, 4), jnp.float32).at[:, 3].set(1.0)
        return LShapePoses(
            position=jnp.zeros((capacity, 3), jnp.float32),
            quat=quat,
            length=jnp.zeros((capacity,), jnp.float32),
            width=jnp.zeros((capacity,), jnp.float32),
            height=jnp.zeros((capacity,), jnp.float32),
            label=jnp.full((capacity,), 10, jnp.int32),
            valid=jnp.zeros((capacity,), bool),
        )

    @property
    def capacity(self) -> int:
        return self.position.shape[-2]


@pytree_dataclass
class GridState:
    """Occupancy-grid state: the only persistent state of the engine.

    log_odds / occupancy: (H, W) float32 where H = cells along x (forward),
    W = cells along y (lateral) in grid_map buffer order (index (0,0) is
    the max-x/max-y corner; see geometry.grid_index_from_position).
    rng: PRNG key consumed by RANSAC each step.
    step: () int32 monotonic step counter.
    """

    log_odds: jnp.ndarray
    occupancy: jnp.ndarray
    rng: jnp.ndarray
    step: jnp.ndarray

    @staticmethod
    def create(cfg: GridVisionConfig, seed: int = 0) -> "GridState":
        h, w = cfg.grid_size
        # Build on host (numpy) — one transfer per leaf instead of
        # device compute dispatches; matters on high-latency links.
        return GridState(
            log_odds=jnp.asarray(
                np.full((h, w), cfg.log_odds_prior, np.float32)),
            occupancy=jnp.asarray(
                np.full((h, w), cfg.init_probability, np.float32)),
            rng=jax.random.PRNGKey(seed),
            step=jnp.zeros((), jnp.int32),
        )

    @staticmethod
    def create_batch(cfg: GridVisionConfig, n: int,
                     seed: int = 0) -> "GridState":
        """Stacked per-rig states built in one jitted computation (a
        python loop of create() costs 4*n eager dispatches)."""
        import functools

        @functools.partial(jax.jit, static_argnums=(1, 2))
        def _make(seeds, h, w):
            return GridState(
                log_odds=jnp.full((n, h, w), cfg.log_odds_prior,
                                  jnp.float32),
                occupancy=jnp.full((n, h, w), cfg.init_probability,
                                   jnp.float32),
                rng=jax.vmap(jax.random.PRNGKey)(seeds),
                step=jnp.zeros((n,), jnp.int32),
            )

        h, w = cfg.grid_size
        return _make(jnp.arange(seed, seed + n), h, w)


@pytree_dataclass
class Obs:
    """One fused observation (latest camera frame + latest LiDAR scan).

    image: (H, W, 3) float32 RGB in [0, 255] (cv_bridge "rgb8" semantics,
    grid_vision_node.cpp:84, held as float for TPU friendliness).
    has_image / has_cloud: () bool — the reference's empty() checks
    (grid_vision_node.cpp:111, quirk Q1: the gate is && so a frame with
    either input present still runs).
    """

    image: jnp.ndarray
    cloud: PointCloud
    has_image: jnp.ndarray
    has_cloud: jnp.ndarray

    @staticmethod
    def create(cfg: GridVisionConfig, image=None, cloud=None) -> "Obs":
        if image is None:
            image = jnp.zeros(
                (cfg.camera_image_height, cfg.camera_image_width, 3),
                jnp.float32,
            )
            has_image = jnp.asarray(False)
        else:
            image = jnp.asarray(image, jnp.float32)
            has_image = jnp.asarray(True)
        if cloud is None:
            cloud = PointCloud.empty(cfg.max_points)
            has_cloud = jnp.asarray(False)
        else:
            has_cloud = cloud.count > 0
        return Obs(image=image, cloud=cloud, has_image=has_image,
                   has_cloud=has_cloud)

    # ------------------------------------------------------------------
    # Packed wire format: ONE contiguous uint8 buffer per observation.
    #
    # The streaming bottleneck on a tunnel/PCIe-attached device is the
    # number and size of host->device transfers: the naive Obs is SIX
    # transfers (image, xyz, intensity, count, 2 flags) of ~4.7 MB
    # (float32 image). The packed layout is one transfer of
    # 8 + H*W*3 + P*16 bytes (~1.05 MB at defaults — camera pixels are
    # rgb8 on the wire in the reference too, cv_bridge "rgb8",
    # grid_vision_node.cpp:84). Layout (little-endian):
    #   [0:4)  int32  count        [4] u8 has_image   [5] u8 has_cloud
    #   [6:8)  pad
    #   [8 : 8+H*W*3)              image rgb8
    #   [.. : ..+P*12)             xyz float32 (sentinel-padded)
    #   [.. : ..+P*4)              intensity float32
    # ------------------------------------------------------------------

    @staticmethod
    def _wire_sizes(cfg: GridVisionConfig):
        h, w, p = (cfg.camera_image_height, cfg.camera_image_width,
                   cfg.max_points)
        img = (h * w * 3 if cfg.wire_image_codec == "rgb8"
               else h * w + 2 * (h // 2) * (w // 2))      # yuv420
        cloud = (p * 16 if cfg.wire_cloud_dtype == "float32"
                 else p * 7)                               # f16 xyz + u8 i
        return img, cloud

    @staticmethod
    def packed_nbytes(cfg: GridVisionConfig) -> int:
        img, cloud = Obs._wire_sizes(cfg)
        return 8 + img + cloud

    # f16 can't hold the 1e8 pad sentinel; padded rows are rewritten from
    # `count` on unpack, so the wire value only needs to be finite.
    _F16_PAD = 60000.0

    @staticmethod
    def pack_bytes(image_u8: np.ndarray, xyz: np.ndarray,
                   intensity: np.ndarray, count: int, has_image: bool,
                   has_cloud: bool, cfg: GridVisionConfig) -> np.ndarray:
        """Host-side pack (numpy). image_u8: (H, W, 3) uint8; xyz/
        intensity already fixed-capacity sentinel-padded float32 arrays
        (PointCloud.pack_numpy / native.pack_cloud output)."""
        h, w = cfg.camera_image_height, cfg.camera_image_width
        p = cfg.max_points
        img_n, _ = Obs._wire_sizes(cfg)
        buf = np.empty(Obs.packed_nbytes(cfg), np.uint8)
        buf[0:4].view(np.int32)[0] = count
        buf[4] = 1 if has_image else 0
        buf[5] = 1 if has_cloud else 0
        buf[6:8] = 0
        o = 8
        img = np.ascontiguousarray(image_u8, np.uint8)
        if cfg.wire_image_codec == "rgb8":
            buf[o:o + img_n] = img.reshape(-1)
        else:
            y, u, v = rgb_to_yuv420(img)
            buf[o:o + h * w] = y.reshape(-1)
            buf[o + h * w:o + h * w + u.size] = u.reshape(-1)
            buf[o + h * w + u.size:o + img_n] = v.reshape(-1)
        o += img_n
        xyz = np.ascontiguousarray(xyz, np.float32)
        inten = np.ascontiguousarray(intensity, np.float32)
        if cfg.wire_cloud_dtype == "float32":
            buf[o:o + p * 12].view(np.float32)[:] = xyz.reshape(-1)
            o += p * 12
            buf[o:o + p * 4].view(np.float32)[:] = inten.reshape(-1)
        else:
            x16 = np.clip(xyz, -Obs._F16_PAD, Obs._F16_PAD
                          ).astype(np.float16)
            buf[o:o + p * 6].view(np.float16)[:] = x16.reshape(-1)
            o += p * 6
            buf[o:o + p] = np.clip(inten, 0, 255).astype(np.uint8)
        return buf

    @staticmethod
    def unpack(buf: jnp.ndarray, cfg: GridVisionConfig) -> "Obs":
        """Device-side unpack (pure jnp; call inside jit). With the rgb8
        codec the image stays uint8 — every consumer casts to the compute
        dtype on first touch, so no f32 copy is ever materialized in HBM;
        yuv420 decodes to float32 RGB (one fused linear pass)."""
        h, w = cfg.camera_image_height, cfg.camera_image_width
        p = cfg.max_points
        img_n, _ = Obs._wire_sizes(cfg)
        count = jax.lax.bitcast_convert_type(buf[0:4], jnp.int32)
        has_image = buf[4] > 0
        has_cloud = buf[5] > 0
        o = 8
        if cfg.wire_image_codec == "rgb8":
            image = buf[o:o + h * w * 3].reshape(h, w, 3)
        else:
            y = buf[o:o + h * w].reshape(h, w)
            cn = (h // 2) * (w // 2)
            u = buf[o + h * w:o + h * w + cn].reshape(h // 2, w // 2)
            v = buf[o + h * w + cn:o + img_n].reshape(h // 2, w // 2)
            image = yuv420_to_rgb(y, u, v)
        o += img_n
        if cfg.wire_cloud_dtype == "float32":
            xyz = jax.lax.bitcast_convert_type(
                buf[o:o + p * 12].reshape(p, 3, 4), jnp.float32)
            o += p * 12
            intensity = jax.lax.bitcast_convert_type(
                buf[o:o + p * 4].reshape(p, 4), jnp.float32)
        else:
            x16 = jax.lax.bitcast_convert_type(
                buf[o:o + p * 6].reshape(p, 3, 2), jnp.float16)
            valid = (jnp.arange(p) < count)[:, None]
            xyz = jnp.where(valid, x16.astype(jnp.float32),
                            PointCloud.PAD_SENTINEL)
            o += p * 6
            intensity = buf[o:o + p].astype(jnp.float32)
        return Obs(image=image,
                   cloud=PointCloud(xyz=xyz, intensity=intensity,
                                    count=count),
                   has_image=has_image, has_cloud=has_cloud)


# ----------------------------------------------------------------------
# ROI-delta input wire (round 4): the per-frame live path is TRANSFER-
# bound on this link (host render measured 1.1 ms/frame vs ~20 ms/frame
# achieved — docs/PERF.md), so the way up is fewer bytes per record.
# Between consecutive camera frames only the moving objects change; a
# delta record ships a FIXED-SIZE ROI window (static shape — one
# compiled unpack, no shape-bucket recompiles) positioned over the
# changed region, applied on device into the previous frame with
# dynamic_update_slice. When the change exceeds the window the encoder
# falls back to a keyframe record (the full Obs.pack_bytes buffer).
# The CLOUD ships full in every record: LiDAR scans resample every
# point every sweep, so point-level temporal deltas have nothing to
# exploit (measured: consecutive-scan nearest-neighbor residuals are
# the full jitter amplitude) — the f16+u8 wire dtype is the cloud's
# win. Delta layout (little-endian):
#   [0:4)  i32 count   [4] u8 has_image  [5] u8 has_cloud  [6:8) pad
#   [8:12) i32 roi_y0  [12:16) i32 roi_x0
#   [16 : 16+Hr*Wr*3)  ROI rgb8
#   [..]               cloud (same wire dtype rules as Obs.pack_bytes)
# ----------------------------------------------------------------------

def delta_roi_shape(cfg: GridVisionConfig):
    """Fixed delta ROI window (half the frame each axis: 4x fewer image
    bytes; covers the demo world's entire moving-object envelope)."""
    return cfg.camera_image_height // 2, cfg.camera_image_width // 2


def delta_nbytes(cfg: GridVisionConfig) -> int:
    hr, wr = delta_roi_shape(cfg)
    _, cloud = Obs._wire_sizes(cfg)
    return 16 + hr * wr * 3 + cloud


def pack_delta_bytes(roi_u8: np.ndarray, y0: int, x0: int,
                     xyz: np.ndarray, intensity: np.ndarray, count: int,
                     has_image: bool, has_cloud: bool,
                     cfg: GridVisionConfig) -> np.ndarray:
    """Host-side delta pack. roi_u8: (Hr, Wr, 3) uint8 window content at
    (y0, x0) of the NEW frame (delta_roi_shape dims). Requires
    wire_image_codec == 'rgb8' (the ROI ships raw)."""
    hr, wr = delta_roi_shape(cfg)
    p = cfg.max_points
    buf = np.empty(delta_nbytes(cfg), np.uint8)
    buf[0:4].view(np.int32)[0] = count
    buf[4] = 1 if has_image else 0
    buf[5] = 1 if has_cloud else 0
    buf[6:8] = 0
    buf[8:12].view(np.int32)[0] = y0
    buf[12:16].view(np.int32)[0] = x0
    o = 16
    buf[o:o + hr * wr * 3] = np.ascontiguousarray(
        roi_u8, np.uint8).reshape(-1)
    o += hr * wr * 3
    xyz = np.ascontiguousarray(xyz, np.float32)
    inten = np.ascontiguousarray(intensity, np.float32)
    if cfg.wire_cloud_dtype == "float32":
        buf[o:o + p * 12].view(np.float32)[:] = xyz.reshape(-1)
        o += p * 12
        buf[o:o + p * 4].view(np.float32)[:] = inten.reshape(-1)
    else:
        x16 = np.clip(xyz, -Obs._F16_PAD, Obs._F16_PAD).astype(np.float16)
        buf[o:o + p * 6].view(np.float16)[:] = x16.reshape(-1)
        o += p * 6
        buf[o:o + p] = np.clip(inten, 0, 255).astype(np.uint8)
    return buf


def unpack_delta(buf: jnp.ndarray, prev_image_u8: jnp.ndarray,
                 cfg: GridVisionConfig) -> "Obs":
    """Device-side delta unpack (pure jnp; call inside jit): patch the
    ROI into the carried previous frame, decode the cloud like
    Obs.unpack. Returns an Obs whose image is the FULL updated uint8
    frame (also the next call's prev_image_u8)."""
    hr, wr = delta_roi_shape(cfg)
    p = cfg.max_points
    count = jax.lax.bitcast_convert_type(buf[0:4], jnp.int32)
    has_image = buf[4] > 0
    has_cloud = buf[5] > 0
    y0 = jax.lax.bitcast_convert_type(buf[8:12], jnp.int32)
    x0 = jax.lax.bitcast_convert_type(buf[12:16], jnp.int32)
    o = 16
    roi = buf[o:o + hr * wr * 3].reshape(hr, wr, 3)
    image = jax.lax.dynamic_update_slice(
        prev_image_u8, roi, (y0, x0, jnp.zeros((), jnp.int32)))
    o += hr * wr * 3
    if cfg.wire_cloud_dtype == "float32":
        xyz = jax.lax.bitcast_convert_type(
            buf[o:o + p * 12].reshape(p, 3, 4), jnp.float32)
        o += p * 12
        intensity = jax.lax.bitcast_convert_type(
            buf[o:o + p * 4].reshape(p, 4), jnp.float32)
    else:
        x16 = jax.lax.bitcast_convert_type(
            buf[o:o + p * 6].reshape(p, 3, 2), jnp.float16)
        valid = (jnp.arange(p) < count)[:, None]
        xyz = jnp.where(valid, x16.astype(jnp.float32),
                        PointCloud.PAD_SENTINEL)
        o += p * 6
        intensity = buf[o:o + p].astype(jnp.float32)
    return Obs(image=image,
               cloud=PointCloud(xyz=xyz, intensity=intensity,
                                count=count),
               has_image=has_image, has_cloud=has_cloud)


_YUV_M = np.array([[0.299, 0.587, 0.114],
                   [-0.168736, -0.331264, 0.5],
                   [0.5, -0.418688, -0.081312]], np.float32).T


def rgb_to_yuv420(rgb: np.ndarray):
    """Host-side full-range BT.601 4:2:0 encode (what camera links carry
    natively). Returns (Y (H,W), U (H/2,W/2), V (H/2,W/2)) uint8.

    Chroma is computed AFTER the 2x2 box subsample: the RGB->CbCr map is
    affine, so it commutes with the block mean — identical result, 4x
    less chroma math (this encode sits on the streaming ingest hot path,
    runtime/stream.packed_from_scene)."""
    rgbf = rgb.astype(np.float32)
    y = rgbf @ _YUV_M[:, 0]
    # strided adds, not reshape+mean: the 6-d reduction materializes a
    # strided temp and runs ~6x slower than four contiguous adds
    sub = (rgbf[0::2, 0::2] + rgbf[0::2, 1::2]
           + rgbf[1::2, 0::2] + rgbf[1::2, 1::2]) * 0.25
    cbcr = sub @ _YUV_M[:, 1:] + 128.0
    to8 = lambda a: np.clip(a + 0.5, 0, 255).astype(np.uint8)
    return to8(y), to8(cbcr[..., 0]), to8(cbcr[..., 1])


def yuv420_to_rgb(y: jnp.ndarray, u: jnp.ndarray,
                  v: jnp.ndarray) -> jnp.ndarray:
    """Device-side decode (jnp): nearest-neighbor chroma upsample + the
    inverse BT.601 full-range matrix. Output float32 RGB in [0, 255]."""
    yf = y.astype(jnp.float32)
    uf = jnp.repeat(jnp.repeat(u.astype(jnp.float32) - 128.0, 2, 0), 2, 1)
    vf = jnp.repeat(jnp.repeat(v.astype(jnp.float32) - 128.0, 2, 0), 2, 1)
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


@pytree_dataclass
class Extrinsics:
    """Static frame tree replacing the reference's TF2 lookups
    (grid_vision_node.cpp:280-307, 337-382).

    Each transform is a 4x4 homogeneous matrix mapping source-frame points
    into the target frame.
    """

    lidar_to_camera: jnp.ndarray  # T such that p_cam = T @ p_lidar
    camera_to_base: jnp.ndarray   # T such that p_base = T @ p_cam

    @staticmethod
    def identity() -> "Extrinsics":
        eye = jnp.eye(4, dtype=jnp.float32)
        return Extrinsics(lidar_to_camera=eye, camera_to_base=eye)


@pytree_dataclass
class SaturationStats:
    """Capacity-saturation telemetry, int32 scalars per step.

    The reference's dynamically-sized std::vectors never truncate; this
    engine's fixed XLA capacities can bind, and when they do the step
    quietly diverges from reference semantics at exactly the busiest
    moments — these counters make that observable on device.

    prenms_overflow: anchors above confidence_threshold dropped by the
      max_candidates pre-NMS compaction (ops/decode.py).
    orientation_clamped: valid dynamic boxes beyond
      max_orientation_batch (quirk Q7 — the reference OVERFLOWS its TRT
      buffers here, src/vision_orientation.cpp:200-207; we clamp and
      count). Vision mode only; 0 in PCA mode.
    box_cloud_truncated: PCA-path boxes whose per-box sub-cloud exceeded
      max_points_per_box (the reference keeps all points). 0 in vision
      mode.
    orientation_dropped: candidates lost to the fleet orientation budget
      (pipeline.fleet_step). Always 0 in the single-rig step.
    static_depth_clamped: static boxes beyond max_static_depth whose kNN
      median depth was not computed (the reference computes depth for
      every static box; we keep the highest-confidence ones and count).

    Host-side cloud-subsampling drops (PointCloud.pack_numpy) are
    reported by the ingest layer (runtime/stream.StepStats), not here —
    they happen before data reaches the device.
    """

    prenms_overflow: jnp.ndarray
    orientation_clamped: jnp.ndarray
    box_cloud_truncated: jnp.ndarray
    orientation_dropped: jnp.ndarray
    static_depth_clamped: jnp.ndarray

    @staticmethod
    def zeros() -> "SaturationStats":
        z = jnp.zeros((), jnp.int32)
        return SaturationStats(prenms_overflow=z, orientation_clamped=z,
                               box_cloud_truncated=z, orientation_dropped=z,
                               static_depth_clamped=z)


@pytree_dataclass
class StepOutput:
    """Everything the reference publishes per tick, as arrays.

    boxes: final 2D detections (the annotated-image publish's content,
    grid_vision_node.cpp:239); poses: L-shape 3D objects (markers, :243);
    static_points: base-frame 3D positions of static detections (:183);
    static_depths: (D,) box-slot-aligned kNN median camera depths backing
    static_points, with the reference's preallocated -1.0 sentinel
    (cloud_detections.cpp:49) where no depth was computed (dynamic slot,
    no cloud overlap, or max_static_depth compaction) — consumers of
    static_points (the tracker) must gate on static_depths > 0, because a
    sentinel back-projects BEHIND the camera;
    static_boxes: the static split (marker labels); occupancy_i8: the
    nav_msgs/OccupancyGrid export, int8 0..100 (:240 via
    GridMapRosConverter::toOccupancyGrid(grid, "occupancy", 0.0, 1.0));
    saturation: capacity-saturation telemetry (SaturationStats).
    """

    boxes: Boxes
    poses: LShapePoses
    static_points: jnp.ndarray
    static_depths: jnp.ndarray
    static_boxes: Boxes
    occupancy_i8: jnp.ndarray
    saturation: SaturationStats


def tree_stack(items):
    """Stack a list of identical pytrees along a new leading axis (rigs)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *items)
