"""3D operator view (io/viz3d.py): geometry, occlusion, marker parity.

The reference's operator surface is RViz's 3D orbit camera over the
map + MarkerArray (/root/reference/rviz/config.rviz:251-270); these
tests pin the headless renderer that replaces it."""

import numpy as np
import pytest

from grid_vision_tpu.io.viz3d import OrbitCamera, render_scene


def _meta(res=0.2, cx=10.0, cy=0.0, lx=40.0, ly=40.0):
    return {"resolution": res, "center": (cx, cy), "length": (lx, ly)}


def _grid(rows=200, cols=200):
    g = np.full((rows, cols), -1, np.int8)
    g[40:160, 40:160] = 0        # free patch
    g[95:105, 95:105] = 100      # occupied blob near the center
    return g


def test_render_shapes_and_ground():
    img = render_scene(_grid(), _meta(), [], width=320, height=240)
    assert img.shape == (240, 320, 3) and img.dtype == np.uint8
    # the free patch must show up as near-white ground pixels
    assert (img.min(-1) > 240).sum() > 500
    # the occupied blob as near-black pixels
    assert (img.max(-1) < 60).sum() > 10
    # unknown gray ring present
    gray = (np.abs(img.astype(int) - np.array([170, 172, 178])).sum(-1)
            < 30)
    assert gray.sum() > 500


def test_no_grid_renders_background_only():
    img = render_scene(None, None, [], width=64, height=48)
    assert img.shape == (48, 64, 3)
    # only sky / far-ground / axis colors; no crash without a grid
    assert img.size > 0


def test_cube_visible_and_shaded():
    m = {"type": "cube", "position": [10.0, 0.0, 0.8],
         "scale": [4.0, 2.0, 1.6], "color": (0.0, 0.5, 1.0)}
    img = render_scene(_grid(), _meta(), [m], width=320, height=240)
    blue = (img[..., 2] > 140) & (img[..., 0] < 80)
    assert blue.sum() > 100
    # Lambert shading: the cube faces must not all be one flat value
    vals = np.unique(img[..., 2][blue])
    assert len(vals) >= 2


def test_cube_occludes_farther_cube():
    cam = OrbitCamera(distance=20.0, pitch=0.3, yaw=np.pi,
                      focal=(10.0, 0.0, 0.0))
    near = {"type": "cube", "position": [8.0, 0.0, 1.0],
            "scale": [2.0, 2.0, 2.0], "color": (1.0, 0.0, 0.0)}
    far = {"type": "cube", "position": [14.0, 0.0, 1.0],
           "scale": [2.0, 2.0, 2.0], "color": (0.0, 1.0, 0.0)}
    # camera sits behind the robot looking down +x: near (x=8) must
    # cover the center; z-buffer order must not depend on draw order
    for order in ([near, far], [far, near]):
        img = render_scene(None, _meta(), order, width=200, height=150,
                           cam=cam)
        c = img[75, 100]
        assert c[0] > 120 and c[1] < 80, c  # red (near) wins


def test_sphere_and_text_markers():
    ms = [{"type": "sphere", "position": [12.0, 2.0, 3.0],
           "scale": [0.8, 0.8, 0.8], "color": (1.0, 0.0, 0.0)},
          {"type": "text", "position": [12.0, -2.0, 3.0],
           "text": "SPEED LIMIT: 60 KMPH", "scale_z": 0.6,
           "color": (1.0, 1.0, 1.0)}]
    img = render_scene(_grid(), _meta(), ms, width=400, height=300)
    red = (img[..., 0] > 150) & (img[..., 1] < 80) & (img[..., 2] < 80)
    assert red.sum() > 20  # the light sphere
    # text pixels: pure white clusters above the ground
    white = img.min(-1) > 240
    assert white.any()


def test_tf_axes_at_origin():
    # yaw off the exact x-axis: at yaw == pi the x and z axes project
    # onto the same screen column and z-fight (both pass the ground
    # bias) — any real orbit pose separates them.
    cam = OrbitCamera(distance=8.0, pitch=0.6, yaw=np.pi - 0.5,
                      focal=(0.0, 0.0, 0.0))
    # robot=False: the ego-vehicle model (round 4) stands on the same
    # origin and occludes parts of the triad — this test isolates the
    # TF display itself
    img = render_scene(None, None, [], width=200, height=150, cam=cam,
                       robot=False)
    red = (img[..., 0] > 180) & (img[..., 1] < 100) & (img[..., 2] < 100)
    green = (img[..., 1] > 150) & (img[..., 0] < 100)
    bluez = (img[..., 2] > 180) & (img[..., 0] < 120) & (img[..., 1] < 140)
    assert red.any() and green.any() and bluez.any()


def test_markers_from_output_render_end_to_end(small_step_output=None):
    """The session marker dicts (io.viz.markers_from_output schema)
    render without adaptation: cube + sphere + text all visible."""
    markers = [
        {"ns": "lshape_bbox", "id": 0, "type": "cube",
         "position": [10.0, 1.0, 0.75],
         "orientation": [0.0, 0.0, 0.2588, 0.9659],
         "scale": [4.2, 1.8, 1.5], "color": (0.0, 0.5, 1.0),
         "lifetime_s": 0.1},
        {"ns": "traffic_light", "id": 1, "type": "sphere",
         "position": [16.0, -3.0, 4.0], "scale": [0.3, 0.3, 0.3],
         "color": (0.0, 1.0, 0.0), "lifetime_s": 0.2,
         "label": "TrafficLightGreen"},
        {"ns": "traffic_sign", "id": 2, "type": "text",
         "position": [18.0, 3.0, 4.0], "text": "SPEED LIMIT: 90 KMPH",
         "scale_z": 0.5, "color": (1.0, 1.0, 1.0), "lifetime_s": 0.2},
    ]
    img = render_scene(_grid(), _meta(), markers, width=400, height=300)
    blue = (img[..., 2] > 140) & (img[..., 0] < 80)
    green = (img[..., 1] > 150) & (img[..., 0] < 100) & (img[..., 2] < 100)
    assert blue.sum() > 50 and green.sum() > 3


def test_viewer_surface_uses_session_frame(tmp_path, monkeypatch):
    """view3d_frame_rgb consumes a SessionFrame end-to-end."""
    from grid_vision_tpu.runtime import native
    from grid_vision_tpu.runtime.session import (SessionPublisher,
                                                 SessionSubscriber)
    from grid_vision_tpu.runtime.viewer import view3d_frame_rgb
    from tests.test_viewer import _fake_output
    from grid_vision_tpu.config import GridVisionConfig

    monkeypatch.setattr(
        native, "shm_path",
        lambda session, channel: str(tmp_path / f"{session}.{channel}.mbx"))
    cfg = GridVisionConfig(grid_x=24, grid_y=12, resolution=0.25,
                           max_points=128, max_detections=8)
    pub = SessionPublisher("v3d", cfg, overlay=False)
    pub.publish(0, _fake_output(cfg))
    frame = SessionSubscriber("v3d").poll()
    img = view3d_frame_rgb(frame, width=320, height=240)
    assert img.shape == (240, 320, 3)
    pub.unlink()


def test_point_cloud_display_renders():
    """The 3D operator view renders the live cloud (PointCloud2 display,
    config.rviz:115): points in front of the camera change pixels, and
    nearer geometry still wins the z-buffer."""
    import numpy as np
    from grid_vision_tpu.io.viz3d import render_scene

    rng = np.random.default_rng(0)
    pts = np.column_stack([rng.uniform(5, 20, 500),
                           rng.uniform(-5, 5, 500),
                           rng.uniform(0.2, 2.0, 500)]).astype(np.float32)
    base = render_scene(None, None, [], width=160, height=120,
                        robot=False)
    with_cloud = render_scene(None, None, [], width=160, height=120,
                              cloud=pts, robot=False)
    assert (base != with_cloud).any(), "cloud drew nothing"
    # behind-camera points must not draw
    behind = render_scene(None, None, [], width=160, height=120,
                          cloud=np.array([[1e4, 1e4, 1e4]], np.float32),
                          robot=False)
    np.testing.assert_array_equal(base, behind)


def test_robot_model_renders_at_origin():
    """The RobotModel stand-in (config.rviz:73) draws the ego vehicle."""
    import numpy as np
    from grid_vision_tpu.io.viz3d import render_scene

    without = render_scene(None, None, [], width=160, height=120,
                           robot=False)
    with_robot = render_scene(None, None, [], width=160, height=120,
                              robot=True)
    assert (without != with_robot).any()


def test_session_cloudviz_roundtrip():
    """cloudviz channel: publisher subsample + decode round-trips, and
    the subscriber surfaces it as frame.cloud."""
    import numpy as np
    from grid_vision_tpu.config import GridVisionConfig
    from grid_vision_tpu.runtime.session import (SessionPublisher,
                                                 SessionSubscriber)
    from grid_vision_tpu.types import (Boxes, LShapePoses,
                                       SaturationStats, StepOutput)
    import jax.numpy as jnp

    cfg = GridVisionConfig(grid_x=24, grid_y=12, resolution=0.25,
                           camera_image_height=32, camera_image_width=32,
                           max_points=64)
    out = StepOutput(
        boxes=Boxes.empty(cfg.max_detections),
        poses=LShapePoses.empty(cfg.max_orientation_batch),
        static_points=jnp.zeros((cfg.max_detections, 3)),
        static_depths=jnp.full((cfg.max_detections,), -1.0),
        static_boxes=Boxes.empty(cfg.max_detections),
        occupancy_i8=jnp.zeros(cfg.grid_size, jnp.int8),
        saturation=SaturationStats.zeros())
    pub = SessionPublisher("gvtest-cloudviz", cfg, overlay=False)
    try:
        rng = np.random.default_rng(1)
        pts = rng.normal(size=(300, 3)).astype(np.float32)
        pub.publish(0, out, cloud_xyz=pts)
        sub = SessionSubscriber("gvtest-cloudviz")
        frame = sub.poll()
        sub.close()
        assert frame is not None and frame.cloud is not None
        np.testing.assert_array_equal(frame.cloud, pts)
    finally:
        pub.unlink()
        pub.close()
