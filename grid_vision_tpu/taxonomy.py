"""The 10-class object taxonomy and its static/dynamic split.

Mirrors the reference enum (include/grid_vision/object_detection.hpp:12-25),
the int->enum map (src/object_detection.cpp:252-269), the string names
(:272-289), the dynamic/static partition (src/grid_vision_node.cpp:384-403),
the per-class estimated grid footprint depths (src/occupancy_grid.cpp:185-196)
and the MultiBin per-class average dimensions
(include/grid_vision/vision_orientation.hpp:57-69).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np


class ObjectClass(enum.IntEnum):
    BIKE = 0
    MOTORBIKE = 1
    PERSON = 2
    TRAFFIC_LIGHT_GREEN = 3
    TRAFFIC_LIGHT_ORANGE = 4
    TRAFFIC_LIGHT_RED = 5
    TRAFFIC_SIGN_30 = 6
    TRAFFIC_SIGN_60 = 7
    TRAFFIC_SIGN_90 = 8
    VEHICLE = 9
    UNKNOWN = 10


NUM_CLASSES = 10  # the detector's class count (UNKNOWN is out-of-range only)

CLASS_NAMES = {
    ObjectClass.BIKE: "Bike",
    ObjectClass.MOTORBIKE: "Motorbike",
    ObjectClass.PERSON: "Person",
    ObjectClass.TRAFFIC_LIGHT_GREEN: "Light Green",
    ObjectClass.TRAFFIC_LIGHT_ORANGE: "Light Orange",
    ObjectClass.TRAFFIC_LIGHT_RED: "Light Red",
    ObjectClass.TRAFFIC_SIGN_30: "Sign 30",
    ObjectClass.TRAFFIC_SIGN_60: "Sign 60",
    ObjectClass.TRAFFIC_SIGN_90: "Sign 90",
    ObjectClass.VEHICLE: "Vehicle",
    ObjectClass.UNKNOWN: "Unknown",
}


def class_name(label: int) -> str:
    try:
        return CLASS_NAMES[ObjectClass(int(label))]
    except ValueError:
        return "Unknown"


# Dynamic classes get 3D pose estimation + grid rasterization; everything
# else ("static": lights/signs) only gets kNN-depth localization for
# visualization (grid_vision_node.cpp:384-403; quirk Q6: static detections
# never touch the grid).
_DYNAMIC = (
    ObjectClass.VEHICLE,
    ObjectClass.BIKE,
    ObjectClass.MOTORBIKE,
    ObjectClass.PERSON,
)

# Lookup table indexed by class id 0..10.
DYNAMIC_LUT = np.zeros(11, dtype=bool)
for _c in _DYNAMIC:
    DYNAMIC_LUT[int(_c)] = True


def is_dynamic(labels: jnp.ndarray) -> jnp.ndarray:
    """Vectorized dynamic/static split. labels: int array of class ids."""
    lut = jnp.asarray(DYNAMIC_LUT)
    return lut[jnp.clip(labels, 0, 10)]


# Per-class estimated footprint depth in meters for the (dead-code)
# point+bbox grid overload (occupancy_grid.cpp:185-196). -1 for classes
# with no footprint.
ESTIMATED_DEPTH_LUT = np.full(11, -1.0, dtype=np.float32)
ESTIMATED_DEPTH_LUT[int(ObjectClass.VEHICLE)] = 3.5
ESTIMATED_DEPTH_LUT[int(ObjectClass.PERSON)] = 0.6
ESTIMATED_DEPTH_LUT[int(ObjectClass.BIKE)] = 2.5
ESTIMATED_DEPTH_LUT[int(ObjectClass.MOTORBIKE)] = 2.5


def estimated_depth(labels: jnp.ndarray) -> jnp.ndarray:
    lut = jnp.asarray(ESTIMATED_DEPTH_LUT)
    return lut[jnp.clip(labels, 0, 10)]


# MultiBin per-class average (length, width, height) residual anchors
# (vision_orientation.hpp:57-69). Non-dynamic classes are zero; the
# reference skips them entirely in postProcessOutputs (:496-499).
AVG_DIMS_LUT = np.zeros((11, 3), dtype=np.float32)
AVG_DIMS_LUT[int(ObjectClass.VEHICLE)] = (3.884, 1.629, 1.526)
AVG_DIMS_LUT[int(ObjectClass.BIKE)] = (1.763, 0.597, 1.737)
AVG_DIMS_LUT[int(ObjectClass.MOTORBIKE)] = (2.2, 0.8, 1.5)
AVG_DIMS_LUT[int(ObjectClass.PERSON)] = (0.842, 0.660, 1.761)


def avg_dims(labels: jnp.ndarray) -> jnp.ndarray:
    """(N,) int labels -> (N, 3) average (length, width, height)."""
    lut = jnp.asarray(AVG_DIMS_LUT)
    return lut[jnp.clip(labels, 0, 10)]
