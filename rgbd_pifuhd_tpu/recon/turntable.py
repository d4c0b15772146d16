"""Turntable video rendering of result meshes.

Replaces the reference's pytorch3d-based colab_util.generate_video_from_obj
(/root/reference/traindata/lib/colab_util.py:32-113) with the framework's
own software rasterizer + cv2 VideoWriter (no GPU/GL/pytorch3d needed).
"""

from __future__ import annotations

import numpy as np

from ..data.synthetic import rasterize_ortho, rotation_y
from .mesh import load_obj


def render_turntable_frames(verts: np.ndarray, faces: np.ndarray,
                            size: int = 512, n_frames: int = 36,
                            colors: np.ndarray | None = None):
    """Yield [H, W, 3] uint8 frames rotating the mesh about +y."""
    center = (verts.max(axis=0) + verts.min(axis=0)) / 2
    extent = float(np.abs(verts - center).max()) * 1.2
    for k in range(n_frames):
        R = rotation_y(360.0 * k / n_frames)
        v = (verts - center) @ R.T
        calib = np.diag([1 / extent, -1 / extent, 1 / extent, 1.0])
        out = rasterize_ortho(v, faces, size, calib)
        frame = np.ones((size, size, 3))
        m = out["mask"]
        frame[m] = out["rgb"][m]
        yield (frame * 255).astype(np.uint8)


def generate_video_from_obj(obj_path: str, video_path: str,
                            size: int = 512, n_frames: int = 36,
                            fps: int = 12) -> str:
    """OBJ -> turntable .mp4/.avi (colab_util parity)."""
    import cv2

    verts, faces, colors = load_obj(obj_path)
    fourcc = cv2.VideoWriter_fourcc(*("mp4v" if video_path.endswith(".mp4")
                                      else "MJPG"))
    writer = cv2.VideoWriter(video_path, fourcc, fps, (size, size))
    for frame in render_turntable_frames(verts, faces, size, n_frames):
        writer.write(frame[:, :, ::-1])
    writer.release()
    return video_path
