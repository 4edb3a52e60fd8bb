"""Camera / projection manager.

Host-side orbit-camera state that produces immutable :class:`View` pytrees per
frame. Rebuilds the reference's ``ViewBase`` (reference: ViewBase.cpp) without
OpenGL: the reference builds its orbit rotation with the GL matrix stack
(``glRotatef`` about the matrix's own rows, reference: ViewBase.cpp:34-47) and
then rotates vectors by the matrix *transpose* (reference: ViewBase.cpp:26-32).
Algebraically that collapses to keeping one effective rotation ``C`` and
right-multiplying ``C <- C @ R_axis(-angle)`` per axis, which is what we do
with explicit axis-angle matrices.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from volrt.constants import DEFAULT_WIN_HEIGHT, DEFAULT_WIN_WIDTH
from volrt.core.types import View

# Camera distance limits (reference: ViewBase.cpp:17).
DISTANCE_LIMITS = (0.1, 3.0)
# Virtual view-plane size in model space for perspective mode
# (reference: ViewBase.cpp:103).
PERSPECTIVE_VIEW_SIZE = 1.5


def _rot_x(deg: float) -> np.ndarray:
    a = math.radians(deg)
    c, s = math.cos(a), math.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)


def _rot_y(deg: float) -> np.ndarray:
    a = math.radians(deg)
    c, s = math.cos(a), math.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def _rot_z(deg: float) -> np.ndarray:
    a = math.radians(deg)
    c, s = math.cos(a), math.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def _compose(angles: tuple[float, float, float]) -> np.ndarray:
    """The per-update rotation increment: ``Rx(-ax) @ Ry(-ay) @ Rz(-az)``."""
    ax, ay, az = angles
    return _rot_x(-ax) @ _rot_y(-ay) @ _rot_z(-az)


class Camera:
    """Mutable orbit-camera state (the ``ViewBase`` equivalent)."""

    def __init__(
        self,
        dims: tuple[int, int] = (DEFAULT_WIN_WIDTH, DEFAULT_WIN_HEIGHT),
        perspective: bool = False,
    ):
        self.dims = dims
        self.perspective = perspective
        self.cam_rot = np.eye(3, dtype=np.float32)
        self.light_rot = np.eye(3, dtype=np.float32)
        self.cam_dist = 3.0           # reference: ViewBase.cpp:18 cam_pos.z
        self.light_dist = 3.0
        self.virtual_view_size = 3.0  # reference: ViewBase.cpp:24
        # Pixel-to-angle / pixel-to-distance ratios (reference: ViewBase.cpp:22-23).
        self._update_pixel_ratios()

    def _update_pixel_ratios(self) -> None:
        w, h = self.dims
        self.pixel_ratio_rotation = 180.0 / min(w, h)
        self.pixel_ratio_translation = (
            DISTANCE_LIMITS[1] - DISTANCE_LIMITS[0]
        ) / (h / 2)

    # --- mutations (reference: ViewBase.cpp:57-113) ---

    def rotate(self, angles: tuple[float, float, float], reset: bool = False) -> None:
        inc = _compose(angles)
        self.cam_rot = (np.eye(3, dtype=np.float32) if reset else self.cam_rot) @ inc

    def rotate_pixels(self, dx: int, dy: int, dz: int = 0) -> None:
        r = self.pixel_ratio_rotation
        self.rotate((dy * r, dx * r, dz * r))

    def zoom(self, distance: float) -> None:
        self.cam_dist = float(
            np.clip(self.cam_dist + distance, *DISTANCE_LIMITS)
        )
        if not self.perspective:
            self.virtual_view_size = self.cam_dist

    def zoom_pixels(self, pixels: int) -> None:
        self.zoom(pixels * self.pixel_ratio_translation)

    def set_camera_position(
        self, angles: tuple[float, float, float], distance: float = 3.0
    ) -> None:
        # Reference: ViewBase.cpp:85-89.
        self.cam_dist = 0.0
        self.zoom(distance)
        self.rotate(angles, reset=True)

    def light_rotate_pixels(self, dx: int, dy: int) -> None:
        r = self.pixel_ratio_rotation
        self.light_rot = self.light_rot @ _compose((dy * r, dx * r, 0.0))

    def toggle_perspective(self, update_mode: bool = False) -> None:
        # Reference: ViewBase.cpp:100-105.
        if not update_mode:
            self.perspective = not self.perspective
        self.virtual_view_size = (
            PERSPECTIVE_VIEW_SIZE if self.perspective else self.cam_dist
        )

    def set_viewport_dims(self, dims: tuple[int, int], scale: float = 1.0) -> None:
        # Reference: ViewBase.cpp:107-113.
        self.dims = (int(dims[0] * scale), int(dims[1] * scale))
        self._update_pixel_ratios()

    # --- snapshot ---

    def view(self) -> View:
        """Snapshot the current state as an immutable View pytree
        (reference: ViewBase.cpp:49-55 update_view)."""
        origin = self.cam_rot @ np.array([0, 0, self.cam_dist], np.float32)
        direction = -origin / np.linalg.norm(origin)
        w, h = self.dims
        step_px = self.virtual_view_size / min(w, h)
        right = self.cam_rot @ np.array([step_px, 0, 0], np.float32)
        up = self.cam_rot @ np.array([0, step_px, 0], np.float32)
        light = self.light_rot @ np.array([0, 0, self.light_dist], np.float32)
        return View(
            origin=jnp.asarray(origin),
            direction=jnp.asarray(direction),
            right_plane=jnp.asarray(right),
            up_plane=jnp.asarray(up),
            light_pos=jnp.asarray(light),
            dims=self.dims,
            perspective=self.perspective,
        )
