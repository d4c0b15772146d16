"""Offline training-data rendering for arbitrary OBJ subjects.

The framework-native equivalent of the reference's OpenGL PRT render
pipeline (traindata/render_data.py:147-340 + prt_util.py): for each subject
mesh it renders a yaw sweep (default step 4 degrees like the reference's
``__main__``; front/back 0/180 are what the datasets read) and writes the
RENDER/MASK/DEPTH/NORM/PARAM tree, with optional precomputed-radiance-
transfer (SH order 2) diffuse shading instead of the plain directional
shading.

No OpenGL/EGL: the software rasterizer (data/synthetic.py) does the
z-buffering; PRT/SH math lives in data/render.py.  Output conventions
match the reference (DEPTH = 255 - 255*z_norm, back NORM inverted,
PARAM = {ortho_ratio, scale, center, R}).
"""

from __future__ import annotations

import os

import numpy as np

from ..recon.mesh import load_obj_mtl, compute_vertex_normals
from .render import compute_prt, sh_shade, rotate_sh_coeffs
from .synthetic import rasterize_ortho, rotation_y


def _default_sh_env() -> np.ndarray:
    """A soft white top-lit SH environment (order 2, 9 coeffs)."""
    env = np.zeros(9)
    env[0] = 2.5          # ambient
    env[2] = 1.2          # y-directional (top light), l=1 m=0
    return env


def render_subject(
    root: str,
    subject: str,
    obj_path: str,
    size: int = 512,
    load_size: int = 1024,
    yaw_step: int = 180,
    pitch_list=(0,),
    use_prt: bool = False,
    prt_dirs: int = 6,
) -> int:
    """Render one subject's yaw sweep into the dataset tree.

    Returns the number of views written.  ``yaw_step=180`` writes only the
    front/back pair the datasets consume; ``yaw_step=4`` reproduces the
    reference's full 90-view sweep.
    """
    import cv2

    mesh = load_obj_mtl(obj_path)
    verts, faces = mesh["verts"], mesh["faces"]
    verts = verts.astype(np.float64)
    # reference approach (render_data.py:184-191): the mesh is NOT moved;
    # the camera is built around it — PARAM stores center (bbox middle) and
    # scale (world-units-per-model-unit so the world height is 180)
    vmin, vmax = verts.min(axis=0), verts.max(axis=0)
    center = (vmin + vmax) / 2.0
    height = max(vmax[1] - vmin[1], 1e-9)
    scale = 180.0 / height

    prt = None
    if use_prt:
        normals = compute_vertex_normals(verts, faces)
        prt = compute_prt(verts, faces, normals, order=2, n_dirs=prt_dirs)
        sh_env = _default_sh_env()

    for d in ("RENDER", "MASK", "DEPTH", "NORM", "PARAM"):
        os.makedirs(os.path.join(root, d, subject), exist_ok=True)

    ortho_ratio = 0.2 * (1024 / size)
    n_views = 0
    for pitch in pitch_list:
        for yaw in range(0, 360, yaw_step):
            R = rotation_y(yaw)
            translate = -(R @ center).reshape(3, 1)
            extrinsic = np.eye(4)
            extrinsic[:3, :3] = R
            extrinsic[:3, 3:4] = translate
            s = scale / ortho_ratio
            intr = np.diag([s, -s, s, 1.0])
            uv = np.diag([1.0 / (load_size // 2)] * 3 + [1.0])
            calib = uv @ intr @ extrinsic

            shade_v = None
            if prt is not None:
                # PRT diffuse shading: per-vertex transport . rotated env,
                # barycentrically interpolated by the rasterizer (the
                # reference's prt.fs vertex-PRT pipeline)
                env_rot = rotate_sh_coeffs(_default_sh_env(), R)
                shade_v = np.clip(sh_shade(prt, env_rot) / np.pi, 0.0, 1.5)
            out = rasterize_ortho(
                verts, faces, size, calib, vert_shade=shade_v,
                uvs=mesh["uvs"], face_uvs=mesh["face_uvs"],
                texture=mesh["texture"], face_albedo=mesh["face_albedo"])

            tag = f"{yaw}_{pitch}_00"
            cv2.imwrite(os.path.join(root, "RENDER", subject, f"{tag}.jpg"),
                        (out["rgb"][:, :, ::-1] * 255).astype(np.uint8))
            cv2.imwrite(os.path.join(root, "MASK", subject, f"{tag}.png"),
                        (out["mask"] * 255).astype(np.uint8))
            z = out["zbuf"]
            zn = np.zeros_like(z)
            m = out["mask"]
            if m.any():
                zmin, zmax = z[m].min(), z[m].max()
                zn[m] = (z[m] - zmin) / max(zmax - zmin, 1e-9)
            depth_png = (255 - 255 * zn).astype(np.uint8)
            depth_png[~m] = 0
            cv2.imwrite(os.path.join(root, "DEPTH", subject, f"{tag}.png"),
                        np.repeat(depth_png[:, :, None], 3, axis=2))
            nimg = np.ones((size, size, 3))
            nimg[m] = out["normal"][m] * 0.5 + 0.5
            if yaw == 180:
                nimg[m] = 1.0 - nimg[m]
            cv2.imwrite(os.path.join(root, "NORM", subject, f"{tag}.png"),
                        (nimg[:, :, ::-1] * 255).astype(np.uint8))
            np.save(os.path.join(root, "PARAM", subject, f"{tag}.npy"),
                    {"ortho_ratio": ortho_ratio, "scale": scale,
                     "center": center, "R": R})
            n_views += 1
    return n_views


def render_dataset(root: str, obj_dir: str, size: int = 512,
                   load_size: int = 1024, yaw_step: int = 180,
                   use_prt: bool = False) -> dict:
    """Render every ``*_100k.obj`` (or any .obj) in obj_dir into ``root``.

    Also copies the meshes into OBJ/ with the ``_100k.obj`` suffix the
    datasets expect.
    """
    import shutil

    os.makedirs(os.path.join(root, "OBJ"), exist_ok=True)
    written = {}
    for f in sorted(os.listdir(obj_dir)):
        if not f.endswith(".obj"):
            continue
        subject = f[:-9] if f.endswith("_100k.obj") else os.path.splitext(f)[0]
        dst = os.path.join(root, "OBJ", f"{subject}_100k.obj")
        src = os.path.join(obj_dir, f)
        if os.path.abspath(src) != os.path.abspath(dst):
            shutil.copyfile(src, dst)
        written[subject] = render_subject(
            root, subject, src, size=size, load_size=load_size,
            yaw_step=yaw_step, use_prt=use_prt,
        )
    return written
