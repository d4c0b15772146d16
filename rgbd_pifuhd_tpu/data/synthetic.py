"""Synthetic dataset generator: analytic meshes + software ortho renderer.

Serves two roles (SURVEY.md section 7, step 8):
- test/demo data: a full ``traindata``-layout tree (RENDER/MASK/DEPTH/NORM/
  PARAM/OBJ/gen/normal) generated from analytic meshes, so every training
  and reconstruction driver can run hermetically without the reference's
  renderppl assets or an OpenGL stack;
- the software orthographic rasterizer is the core of the offline data
  generator (the reference uses a GL PRT renderer, traindata/render_data.py;
  the PRT/SH lighting lives in data/render/).

Conventions match the reference's outputs:
- DEPTH png = 255 - 255*z_normalized (render_data.py:265)
- NORM png = view-space normal map on white background
- PARAM npy = {ortho_ratio, scale, center, R} (render_data.py:239)
- mesh normalized so its y-height is 180 world units (render_data.py:184-191)
"""

from __future__ import annotations

import os

import numpy as np

from ..recon.mesh import save_obj_with_color


# ------------------------------------------------------------ geometry
def make_icosphere(subdiv: int = 3, radius: float = 1.0):
    """Icosphere verts/faces via repeated subdivision of an icosahedron."""
    t = (1.0 + 5 ** 0.5) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], dtype=np.float64)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], dtype=np.int64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)

    for _ in range(subdiv):
        edge_mid: dict = {}
        new_faces = []
        vlist = list(verts)

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in edge_mid:
                m = vlist[a] + vlist[b]
                m /= np.linalg.norm(m)
                edge_mid[key] = len(vlist)
                vlist.append(m)
            return edge_mid[key]

        for f in faces:
            a, b, c = int(f[0]), int(f[1]), int(f[2])
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc],
                          [ab, bc, ca]]
        verts = np.asarray(vlist)
        faces = np.asarray(new_faces, dtype=np.int64)
    return verts * radius, faces


def make_capsule(height: float = 2.0, radius: float = 0.5, subdiv: int = 3):
    """Capsule: icosphere split at the equator and extruded along y."""
    v, f = make_icosphere(subdiv, radius)
    v = v.copy()
    v[:, 1] += np.where(v[:, 1] > 0, height / 2, -height / 2)
    return v, f


def normalize_mesh_height(verts: np.ndarray, target: float = 180.0):
    """Center and scale so the y-extent is ``target`` world units."""
    vmin, vmax = verts.min(axis=0), verts.max(axis=0)
    up = max(vmax[1] - vmin[1], 1e-9)
    center = (vmax + vmin) / 2
    return (verts - center) * (target / up)


def rotation_y(deg: float) -> np.ndarray:
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


# ------------------------------------------------------------ rasterizer
def rasterize_ortho(verts: np.ndarray, faces: np.ndarray, size: int,
                    calib: np.ndarray, albedo=(0.8, 0.65, 0.55)):
    """Orthographic z-buffer rasterizer (NumPy).

    ``calib`` maps world -> NDC ([-1, 1], y up); pixels follow the
    grid_sample convention (align_corners): u=-1 -> col 0, v=-1 -> row 0.

    Returns dict with rgb [H,W,3] float[0,1], mask [H,W] bool,
    zbuf [H,W] float (NDC z, +inf where empty), normal [H,W,3] view-space.
    """
    ndc = verts @ calib[:3, :3].T + calib[:3, 3]
    px = (ndc[:, 0] + 1.0) * 0.5 * (size - 1)
    py = (ndc[:, 1] + 1.0) * 0.5 * (size - 1)
    pz = ndc[:, 2]

    # face normals in view space (z toward viewer = -z front by convention)
    v0, v1, v2 = (ndc[faces[:, 0]], ndc[faces[:, 1]], ndc[faces[:, 2]])
    fn = np.cross(v1 - v0, v2 - v0)
    fn /= np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-12)

    # smooth vertex normals
    vn = np.zeros_like(verts)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    vn /= np.maximum(np.linalg.norm(vn, axis=1, keepdims=True), 1e-12)

    zbuf = np.full((size, size), np.inf)
    nbuf = np.zeros((size, size, 3))
    rgb = np.ones((size, size, 3))
    mask = np.zeros((size, size), dtype=bool)
    albedo = np.asarray(albedo)

    light = np.array([0.3, 0.6, -0.8])
    light /= np.linalg.norm(light)

    for t in range(len(faces)):
        i0, i1, i2 = faces[t]
        xs = np.array([px[i0], px[i1], px[i2]])
        ys = np.array([py[i0], py[i1], py[i2]])
        x0, x1 = int(np.floor(xs.min())), int(np.ceil(xs.max()))
        y0, y1 = int(np.floor(ys.min())), int(np.ceil(ys.max()))
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1, size - 1), min(y1, size - 1)
        if x1 < x0 or y1 < y0:
            continue
        gx, gy = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
        d = ((ys[1] - ys[2]) * (xs[0] - xs[2])
             + (xs[2] - xs[1]) * (ys[0] - ys[2]))
        if abs(d) < 1e-12:
            continue
        w0 = ((ys[1] - ys[2]) * (gx - xs[2]) + (xs[2] - xs[1]) * (gy - ys[2])) / d
        w1 = ((ys[2] - ys[0]) * (gx - xs[2]) + (xs[0] - xs[2]) * (gy - ys[2])) / d
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        z = w0 * pz[i0] + w1 * pz[i1] + w2 * pz[i2]
        yy, xx = gy[inside], gx[inside]
        zi = z[inside]
        closer = zi < zbuf[yy, xx]
        yy, xx, zi = yy[closer], xx[closer], zi[closer]
        if len(yy) == 0:
            continue
        wi = np.stack([w0[inside][closer], w1[inside][closer],
                       w2[inside][closer]], axis=1)
        n = (wi[:, 0:1] * vn[i0] + wi[:, 1:2] * vn[i1] + wi[:, 2:3] * vn[i2])
        n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
        zbuf[yy, xx] = zi
        nbuf[yy, xx] = n
        shade = np.clip(np.abs(n @ light), 0.15, 1.0)[:, None]
        rgb[yy, xx] = albedo * shade
        mask[yy, xx] = True

    return {"rgb": rgb, "mask": mask, "zbuf": zbuf, "normal": nbuf}


# ------------------------------------------------------------ dataset tree
def generate_synthetic_dataset(root: str, subjects=("sphere", "capsule"),
                               size: int = 512, load_size: int = 1024,
                               seed: int = 0) -> None:
    """Write a full traindata-layout tree from analytic meshes."""
    import cv2

    rng = np.random.default_rng(seed)
    for d in ("RENDER", "MASK", "DEPTH", "NORM", "PARAM", "OBJ", "gen",
              "normal"):
        os.makedirs(os.path.join(root, d), exist_ok=True)

    for si, name in enumerate(subjects):
        if name == "sphere":
            v, f = make_icosphere(3, 1.0)
        else:
            v, f = make_capsule(1.6, 0.55, 3)
        v = normalize_mesh_height(v, 180.0)
        # place roughly like the reference's training box (z around -430)
        center = np.array([-128.0, 100.0, -434.0])
        v = v + center
        save_obj_with_color(
            os.path.join(root, "OBJ", f"{name}_100k.obj"), v, f,
        )

        ortho_ratio = 0.2 * (1024 / size)
        scale = 1.0
        R0 = np.eye(3)

        for d in ("RENDER", "MASK", "DEPTH", "NORM", "PARAM"):
            os.makedirs(os.path.join(root, d, name), exist_ok=True)

        for yaw in (0, 180):
            R = rotation_y(yaw) @ R0
            # calib per TrainDataset._calib_from_param convention
            translate = -(R @ center).reshape(3, 1)
            extrinsic = np.eye(4)
            extrinsic[:3, :3] = R
            extrinsic[:3, 3:4] = translate
            s = scale / ortho_ratio
            intr = np.diag([s, -s, s, 1.0])
            uv = np.diag([1.0 / (load_size // 2)] * 3 + [1.0])
            calib = uv @ intr @ extrinsic

            out = rasterize_ortho(v, f, size, calib)
            tag = f"{yaw}_0_00"
            rgbb = (out["rgb"][:, :, ::-1] * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(root, "RENDER", name, f"{tag}.jpg"), rgbb)
            cv2.imwrite(os.path.join(root, "MASK", name, f"{tag}.png"),
                        (out["mask"] * 255).astype(np.uint8))
            z = out["zbuf"].copy()
            zn = np.zeros_like(z)
            if out["mask"].any():
                zmin, zmax = z[out["mask"]].min(), z[out["mask"]].max()
                zn[out["mask"]] = (z[out["mask"]] - zmin) / max(
                    zmax - zmin, 1e-9)
            depth_png = (255 - 255 * zn).astype(np.uint8)
            depth_png[~out["mask"]] = 0
            cv2.imwrite(os.path.join(root, "DEPTH", name, f"{tag}.png"),
                        np.repeat(depth_png[:, :, None], 3, axis=2))
            nimg = np.ones((size, size, 3))
            nimg[out["mask"]] = out["normal"][out["mask"]] * 0.5 + 0.5
            if yaw == 180:  # back view normals inverted (render_data.py:258)
                nimg[out["mask"]] = 1.0 - nimg[out["mask"]]
            cv2.imwrite(os.path.join(root, "NORM", name, f"{tag}.png"),
                        (nimg[:, :, ::-1] * 255).astype(np.uint8))
            np.save(
                os.path.join(root, "PARAM", name, f"{tag}.npy"),
                {"ortho_ratio": ortho_ratio, "scale": scale,
                 "center": center, "R": R},
            )

        # background-composited training image (transback.py equivalent)
        front = cv2.imread(os.path.join(root, "RENDER", name, "0_0_00.jpg"))
        m = cv2.imread(os.path.join(root, "MASK", name, "0_0_00.png"),
                       cv2.IMREAD_GRAYSCALE) > 127
        bg = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        bg = cv2.GaussianBlur(bg, (31, 31), 0)
        comp = np.where(m[:, :, None], front, bg)
        cv2.imwrite(os.path.join(root, "gen", f"{name}_{si}.png"), comp)

    # style images for the normal-pretrain loss
    for n in ("Fnormal.jpg", "Bnormal.jpg"):
        style = np.full((size, size, 3), 127, np.uint8)
        style[:, :, 0] = 200
        cv2.imwrite(os.path.join(root, "normal", n), style)
