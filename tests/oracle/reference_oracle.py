"""NumPy oracle: literal transcriptions of the reference C++ math.

Each function re-derives, in plain NumPy and Python loops, the exact
semantics of a reference routine (cited per function). Tests compare the
TPU engine's fixed-shape masked implementations against these oracles on
random and adversarial inputs. Quirks Q1-Q11 (SURVEY.md §2.3) are
transcribed as-is, bugs included.
"""

from __future__ import annotations

import math

import numpy as np


# ---------------------------------------------------------------------------
# object_detection.cpp
# ---------------------------------------------------------------------------

def extract_bboxes(boxes: np.ndarray, confs: np.ndarray,
                   conf_threshold: float, iou_threshold: float,
                   orig_w: int, orig_h: int, resize: int):
    """object_detection.cpp:94-146. Returns list of dicts with integer-
    valued float coords, confidence, label — in post-NMS order."""
    bboxes = []
    for i in range(boxes.shape[0]):
        best = int(np.argmax(confs[i]))
        max_conf = float(confs[i, best])
        if max_conf >= conf_threshold:
            bboxes.append({
                "x_min": float(boxes[i, 0]), "y_min": float(boxes[i, 1]),
                "x_max": float(boxes[i, 2]), "y_max": float(boxes[i, 3]),
                "confidence": max_conf, "label": best,
            })
    kept = fast_non_max_suppression(bboxes, iou_threshold)
    denormalize_and_scale(kept, orig_w, orig_h, resize)
    return kept


def compute_iou(box, others: np.ndarray) -> np.ndarray:
    """computeIoU_Eigen (object_detection.cpp:148-164)."""
    if others.shape[0] == 0:
        return np.zeros((0,), np.float32)
    x1 = np.maximum(others[:, 0], box["x_min"])
    y1 = np.maximum(others[:, 1], box["y_min"])
    x2 = np.minimum(others[:, 2], box["x_max"])
    y2 = np.minimum(others[:, 3], box["y_max"])
    inter = np.maximum(x2 - x1, 0.0) * np.maximum(y2 - y1, 0.0)
    area1 = (others[:, 2] - others[:, 0]) * (others[:, 3] - others[:, 1])
    area2 = (box["x_max"] - box["x_min"]) * (box["y_max"] - box["y_min"])
    with np.errstate(divide="ignore", invalid="ignore"):
        return inter / (area1 + area2 - inter)


def fast_non_max_suppression(bboxes: list, iou_threshold: float) -> list:
    """object_detection.cpp:166-211. Sorted desc by confidence; kept boxes
    suppress all LATER boxes with IoU > threshold (strict); suppressed
    boxes do not suppress (``if(!keep[i]) continue``). Class-agnostic."""
    if not bboxes:
        return []
    bboxes = sorted(bboxes, key=lambda b: -b["confidence"])
    n = len(bboxes)
    mat = np.array([[b["x_min"], b["y_min"], b["x_max"], b["y_max"]]
                    for b in bboxes], np.float32)
    keep = [True] * n
    out = []
    for i in range(n):
        if not keep[i]:
            continue
        out.append(bboxes[i])
        ious = compute_iou(bboxes[i], mat[i + 1:])
        for j in range(len(ious)):
            if ious[j] > iou_threshold:
                keep[i + j + 1] = False
    return out


def denormalize_and_scale(bboxes: list, orig_w: int, orig_h: int,
                          resize: int) -> None:
    """object_detection.cpp:226-239 (quirk Q5: x*resize*(orig/resize),
    truncated via static_cast<int>, stored back as double)."""
    scale_x = float(orig_w) / resize
    scale_y = float(orig_h) / resize
    for b in bboxes:
        b["x_min"] = float(int(np.float32(b["x_min"]) * resize * np.float32(scale_x)))
        b["y_min"] = float(int(np.float32(b["y_min"]) * resize * np.float32(scale_y)))
        b["x_max"] = float(int(np.float32(b["x_max"]) * resize * np.float32(scale_x)))
        b["y_max"] = float(int(np.float32(b["y_max"]) * resize * np.float32(scale_y)))


# ---------------------------------------------------------------------------
# grid_map / occupancy_grid.cpp
# ---------------------------------------------------------------------------

class GridOracle:
    """grid_map::GridMap semantics as used by OccupancyGridMap.

    Geometry per the ctor (occupancy_grid.cpp:4-14): size = round(len/res)
    per axis, position (center) = (grid_x // 3, 0) (quirk Q8), buffer
    index (0,0) at the (+x, +y) corner.
    """

    def __init__(self, grid_x=50, grid_y=20, resolution=0.1,
                 decay=-0.2, hit=0.85, lo_min=-2.0, lo_max=3.6,
                 prior=0.0, init_p=0.5):
        self.len_x, self.len_y = float(grid_x), float(grid_y)
        self.res = float(resolution)
        self.size = (int(round(grid_x / resolution)),
                     int(round(grid_y / resolution)))
        self.center = (float(grid_x // 3), 0.0)
        self.decay, self.hit = decay, hit
        self.lo_min, self.lo_max = lo_min, lo_max
        self.log_odds = np.full(self.size, prior, np.float32)
        self.occupancy = np.full(self.size, init_p, np.float32)

    def get_index(self, px: float, py: float):
        """grid_map getIndex: valid iff inside the map; index counts down
        from the max corner."""
        max_x = self.center[0] + 0.5 * self.len_x
        max_y = self.center[1] + 0.5 * self.len_y
        ix = math.floor((max_x - px) / self.res)
        iy = math.floor((max_y - py) / self.res)
        if 0 <= ix < self.size[0] and 0 <= iy < self.size[1]:
            return (ix, iy)
        return None

    def _finish(self):
        self.log_odds = np.clip(self.log_odds, self.lo_min, self.lo_max)
        self.occupancy = 1.0 / (1.0 + np.exp(-self.log_odds))

    def update_decay_only(self):
        """updateMap(grid) (occupancy_grid.cpp:16-31)."""
        self.log_odds += self.decay
        self._finish()

    def _raster_corners(self, corners_xy):
        """updateGridCellsFast (occupancy_grid.cpp:140-183)."""
        idxs = []
        for (px, py) in corners_xy:
            idx = self.get_index(px, py)
            if idx is None:
                return  # skip whole box (quirk: any off-map corner)
            idxs.append(idx)
        ix = [i[0] for i in idxs]
        iy = [i[1] for i in idxs]
        self.log_odds[min(ix):max(ix) + 1, min(iy):max(iy) + 1] += self.hit

    def update_lshape(self, poses):
        """updateMap(grid, bboxes_pose) (occupancy_grid.cpp:65-105).
        poses: list of dicts with px, py, length, width."""
        self.log_odds += self.decay
        for p in poses:
            hl, hw = p["length"] / 2.0, p["width"] / 2.0
            corners = [(p["px"] + hl, p["py"] - hw),
                       (p["px"] + hl, p["py"] + hw),
                       (p["px"] - hl, p["py"] - hw),
                       (p["px"] - hl, p["py"] + hw)]
            self._raster_corners(corners)
        self._finish()

    ESTIMATED_DEPTH = {9: 3.5, 2: 0.6, 0: 2.5, 1: 2.5}  # class id -> depth

    def update_point_bbox(self, base_points, labels):
        """updateMap(grid, base_points, bboxes) (occupancy_grid.cpp:33-63 +
        computeBoundingBox3D :107-138). Dead code in the node (Q6)."""
        self.log_odds += self.decay
        for (bx, by, _bz), label in zip(base_points, labels):
            d = self.ESTIMATED_DEPTH.get(int(label), -1.0)
            corners = [(bx + d, by + d / 2.0), (bx + d, by - d / 2.0),
                       (bx, by - d / 2.0), (bx, by + d / 2.0)]
            self._raster_corners(corners)
        self._finish()

    def export_i8(self) -> np.ndarray:
        """GridMapRosConverter::toOccupancyGrid(grid, "occupancy", 0, 1)."""
        return np.round(np.clip(self.occupancy, 0.0, 1.0) * 100.0).astype(np.int8)


# ---------------------------------------------------------------------------
# cloud_detections.cpp
# ---------------------------------------------------------------------------

def build_image_points(points_cam: np.ndarray, K: np.ndarray) -> np.ndarray:
    """buildKDTree's projection loop (cloud_detections.cpp:8-40): camera-
    frame points with z > 0 -> (u, v, depth) rows."""
    out = []
    for p in points_cam:
        if p[2] <= 0:
            continue
        img = K @ p
        out.append((img[0] / img[2], img[1] / img[2], p[2]))
    return np.array(out, np.float32).reshape(-1, 3)


def knn_median_depths(image_points: np.ndarray, bboxes, k: int):
    """computeDepthForBoundingBoxes (cloud_detections.cpp:43-87).

    The KD-tree is 3D over (u, v, depth) and the query point has z=0 — so
    the depth participates in the distance metric (near points win). The
    median is depths[mid] after nth_element with mid = n // 2 (upper
    median for even n).
    """
    depths = []
    for b in bboxes:
        cx = b["x_min"] + (b["x_max"] - b["x_min"]) / 2.0
        cy = b["y_min"] + (b["y_max"] - b["y_min"]) / 2.0
        if image_points.shape[0] == 0:
            depths.append(-1.0)
            continue
        d2 = ((image_points[:, 0] - cx) ** 2 +
              (image_points[:, 1] - cy) ** 2 +
              image_points[:, 2] ** 2)
        nn = np.argsort(d2, kind="stable")[: k]
        vals = sorted(image_points[nn, 2].tolist())
        depths.append(vals[len(vals) // 2])
    return depths


def pixel_to_3d(u: float, v: float, depth: float, K_inv: np.ndarray):
    """cloud_detections.cpp:89-103."""
    return depth * (K_inv @ np.array([u, v, 1.0]))


def extract_cloud_per_bbox(points_cam: np.ndarray, K: np.ndarray, bboxes,
                           image_w: int, image_h: int):
    """extractCloudPerBBox (cloud_detections.cpp:249-298): finite points
    with z > 0.001 projecting inside the image are assigned to the FIRST
    bbox containing the pixel (break after match). Inclusive bbox edges."""
    clouds = [[] for _ in bboxes]
    for p in points_cam:
        if not np.all(np.isfinite(p)) or p[2] <= 0.001:
            continue
        img = K @ p
        u, v = img[0] / img[2], img[1] / img[2]
        if u < 0 or u >= image_w or v < 0 or v >= image_h:
            continue
        for i, b in enumerate(bboxes):
            if (b["x_min"] <= u <= b["x_max"] and
                    b["y_min"] <= v <= b["y_max"]):
                clouds[i].append(p)
                break
    return [np.array(c, np.float32).reshape(-1, 3) for c in clouds]


def radius_outlier_removal(points: np.ndarray, radius: float,
                           min_neighbors: int) -> np.ndarray:
    """pcl::RadiusOutlierRemoval (cloud_detections.cpp:150-154): keep a
    point iff at least ``min_neighbors`` points of the cloud (including
    itself) lie within ``radius``."""
    if points.shape[0] == 0:
        return points
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    counts = (d2 <= radius * radius).sum(axis=1)
    return points[counts >= min_neighbors]


def pca_lshape(points: np.ndarray):
    """computePCABoundingBox + bboxPoseEstimation post-filter math
    (cloud_detections.cpp:140-247). Input: filtered camera-frame points.

    data rows are (z, x); PCA mean/eigenvectors of the 2D data; extents
    from projections; angle in DEGREES fed to setRPY (quirk Q4);
    position = (center.y, centroid_y, center.x) remap.
    Returns dict or None for empty data.
    """
    if points.shape[0] == 0:
        return None
    centroid = points.mean(axis=0)  # pcl::compute3DCentroid
    data = np.stack([points[:, 2], points[:, 0]], axis=1)  # (z, x)
    mean = data.mean(axis=0)
    d = data - mean
    cov = d.T @ d / data.shape[0]
    evals, evecs = np.linalg.eigh(cov)          # ascending
    major = evecs[:, 1]
    minor = evecs[:, 0]
    # Canonical sign: cv::PCA sign is unspecified; fix major.x >= 0 (and
    # if major.x == 0, major.y >= 0) so oracle and engine agree.
    if major[0] < 0 or (major[0] == 0 and major[1] < 0):
        major = -major
    if minor[0] < 0 or (minor[0] == 0 and minor[1] < 0):
        minor = -minor
    proj_l = d @ major
    proj_w = d @ minor
    length = proj_l.max() - proj_l.min()
    width = proj_w.max() - proj_w.min()
    angle_deg = math.atan2(major[1], major[0]) * 180.0 / math.pi
    return {
        "px": float(mean[1]),        # center.y (the x coordinate)
        "py": float(centroid[1]),    # filled from 3D centroid y (:181)
        "pz": float(mean[0]),        # center.x (the z coordinate)
        "length": float(length),
        "width": float(width),
        "angle_deg": float(angle_deg),
        "quat": quat_set_rpy(0.0, -angle_deg, 0.0),  # degrees as radians!
    }


def quat_set_rpy(roll: float, pitch: float, yaw: float):
    """tf2::Quaternion::setRPY, xyzw."""
    hr, hp, hy = roll / 2.0, pitch / 2.0, yaw / 2.0
    sr, cr = math.sin(hr), math.cos(hr)
    sp, cp = math.sin(hp), math.cos(hp)
    sy, cy = math.sin(hy), math.cos(hy)
    return np.array([
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
        cr * cp * cy + sr * sp * sy,
    ])


# ---------------------------------------------------------------------------
# vision_orientation.cpp (MultiBin post-processing)
# ---------------------------------------------------------------------------

AVG_DIMS = {
    9: (3.884, 1.629, 1.526),   # VEHICLE (car_avg_*)
    0: (1.763, 0.597, 1.737),   # BIKE (bicycle_avg_*)
    1: (2.2, 0.8, 1.5),         # MOTORBIKE (bike_avg_*)
    2: (0.842, 0.660, 1.761),   # PERSON
}


def generate_bins(bins: int = 2):
    """vision_orientation.cpp:241-258 -> [pi/2, 3pi/2] for 2 bins."""
    interval = 2.0 * math.pi / bins
    out = [i * interval for i in range(bins)]
    return [a + interval / 2.0 for a in out]


def compute_alpha(orient: np.ndarray, argmax: int, angle_bins):
    """vision_orientation.cpp:260-275. orient: (bins*2,) [cos, sin] pairs."""
    cos_v = orient[argmax * 2 + 0]
    sin_v = orient[argmax * 2 + 1]
    return math.atan2(sin_v, cos_v) + angle_bins[argmax] - math.pi


def compute_theta_ray(bbox, fx: float, orig_w: int):
    """vision_orientation.cpp:277-292."""
    fovx = 2.0 * math.atan(orig_w / (2.0 * fx))
    box_center_x = (bbox["x_min"] + bbox["x_max"]) / 2.0
    dx = box_center_x - orig_w / 2.0
    sign = -1.0 if dx < 0 else 1.0
    dx = abs(dx)
    return sign * math.atan((2.0 * dx * math.tan(fovx / 2.0)) / orig_w)


def rotation_y(theta: float) -> np.ndarray:
    c, s = math.cos(theta), math.sin(theta)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def calc_location(dimension, bbox, alpha: float, theta_ray: float,
                  proj_mat: np.ndarray):
    """vision_orientation.cpp:294-447: the Deep3DBox 64-combination
    constrained least squares. dimension = (length, width, height); note
    dx = length/2, dy = width/2, dz = height/2 (the reference's comments
    claim height/width swapped, the code indexes 0/1/2 in order).
    Returns (best_loc (3,), orient)."""
    orient = alpha + theta_ray
    R = rotation_y(orient)
    box_corners = [bbox["x_min"], bbox["y_min"], bbox["x_max"], bbox["y_max"]]
    dx, dy, dz = dimension[0] / 2.0, dimension[1] / 2.0, dimension[2] / 2.0

    deg88 = 88 * math.pi / 180.0
    deg90 = 90 * math.pi / 180.0
    deg92 = 92 * math.pi / 180.0
    left_mult, right_mult = 1, -1
    if deg88 < alpha < deg92:
        left_mult, right_mult = 1, 1
    elif -deg92 < alpha < -deg88:
        left_mult, right_mult = -1, -1
    elif -deg90 < alpha < deg90:
        left_mult, right_mult = -1, 1
    switch_mult = 1 if alpha > 0 else -1

    left_constraints = [(left_mult * dx, i * dy, -switch_mult * dz)
                        for i in (-1, 1)]
    right_constraints = [(right_mult * dx, i * dy, switch_mult * dz)
                         for i in (-1, 1)]
    top_constraints = [(i * dx, -dy, j * dz)
                       for i in (-1, 1) for j in (-1, 1)]
    bottom_constraints = [(i * dx, dy, j * dz)
                          for i in (-1, 1) for j in (-1, 1)]

    best_loc, best_err = None, float("inf")
    indices = [0, 1, 0, 1]
    for left in left_constraints:
        for top in top_constraints:
            for right in right_constraints:
                for bottom in bottom_constraints:
                    constraint = [left, top, right, bottom]
                    A = np.zeros((4, 3), np.float64)
                    b = np.zeros((4,), np.float64)
                    for row in range(4):
                        M = np.eye(4, dtype=np.float64)
                        RX = R @ np.array(constraint[row], np.float64)
                        M[:3, 3] = RX
                        PM = proj_mat @ M  # (3,4)
                        idx = indices[row]
                        bv = box_corners[row]
                        A[row] = PM[idx, :3] - bv * PM[2, :3]
                        b[row] = bv * PM[2, 3] - PM[idx, 3]
                    loc, *_ = np.linalg.lstsq(A, b, rcond=None)
                    err = float(((A @ loc - b) ** 2).sum())
                    if err < best_err:
                        best_err = err
                        best_loc = loc
    return np.asarray(best_loc), orient


def post_process(orient_batch, conf_batch, dims_batch, bboxes,
                 proj_mat, orig_w):
    """vision_orientation.cpp:449-510. Returns list of pose dicts; boxes
    with non-dynamic labels are skipped (``continue``)."""
    angle_bins = generate_bins(2)
    out = []
    for i, bbox in enumerate(bboxes):
        if bbox["label"] not in AVG_DIMS:
            continue
        conf = conf_batch[i]
        argmax = int(np.argmax(conf))
        alpha = compute_alpha(orient_batch[i].reshape(-1), argmax, angle_bins)
        theta_ray = compute_theta_ray(bbox, proj_mat[0, 0], orig_w)
        avg_l, avg_w, avg_h = AVG_DIMS[bbox["label"]]
        # Note the index remap (:474-476): length <- dims[2] + avg_len,
        # width <- dims[0] + avg_wid, height <- dims[1] + avg_ht.
        length = dims_batch[i][2] + avg_l
        width = dims_batch[i][0] + avg_w
        height = dims_batch[i][1] + avg_h
        loc, orient = calc_location((length, width, height), bbox, alpha,
                                    theta_ray, proj_mat)
        out.append({
            "px": float(loc[0]), "py": float(loc[1]), "pz": float(loc[2]),
            "length": length, "width": width, "height": height,
            "orient": orient, "quat": quat_set_rpy(0, -orient, 0),
            "label": bbox["label"],
        })
    return out
