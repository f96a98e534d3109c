"""Model zoo: YOLOv4-tiny detector + MultiBin orientation regressor."""

from . import orientation_net, yolov4_tiny  # noqa: F401
