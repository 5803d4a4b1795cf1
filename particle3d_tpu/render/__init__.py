"""On-device rendering: camera math + z-buffered point-splat rasterizer."""

from .camera import Camera, camera_axes, view_matrix, projection_matrix, move_camera, rotate_camera
from .splat import render_frame

__all__ = [
    "Camera",
    "camera_axes",
    "view_matrix",
    "projection_matrix",
    "move_camera",
    "rotate_camera",
    "render_frame",
]
