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


def bumpy_radius(directions: np.ndarray, radius: float = 1.0,
                 amp: float = 0.08, omega: float = 25.0) -> np.ndarray:
    """Analytic radial field of the 'bumpy' subject: for unit directions
    ``d``, the surface radius is ``radius * (1 + amp * sin(w dx) sin(w dy)
    sin(w dz))``.  Deterministic and closed-form, so tests can measure a
    reconstruction's EXACT distance-to-surface along any direction."""
    d = np.asarray(directions, np.float64)
    s = np.sin(omega * d[..., 0]) * np.sin(omega * d[..., 1]) \
        * np.sin(omega * d[..., 2])
    return radius * (1.0 + amp * s)


def make_bumpy_sphere(subdiv: int = 5, radius: float = 1.0,
                      amp: float = 0.08, omega: float = 25.0):
    """Icosphere displaced radially by ``bumpy_radius`` — surface detail at
    a spatial frequency a half-resolution input image blurs away while the
    full-resolution image still resolves it (the two-level architecture's
    raison d'etre, exercised by tests/test_learning.py)."""
    v, f = make_icosphere(subdiv, 1.0)
    r = bumpy_radius(v, radius, amp, omega)
    return v * r[:, None], f


def normalize_mesh_height(verts: np.ndarray, target: float = 180.0):
    """Center and scale so the y-extent is ``target`` world units."""
    vmin, vmax = verts.min(axis=0), verts.max(axis=0)
    up = max(vmax[1] - vmin[1], 1e-9)
    center = (vmax + vmin) / 2
    return (verts - center) * (target / up)


# World position every synthetic subject is placed at (roughly the
# reference's training box: z around -430, TrainDataset.py B_MIN/B_MAX).
SUBJECT_CENTER = np.array([-128.0, 100.0, -434.0])


def bumpy_surface_frame(target_height: float = 180.0):
    """(c0, scale) of the 'bumpy' subject AFTER dataset placement: the
    generator normalizes height to ``target_height`` about the mesh
    center and translates to SUBJECT_CENTER, so the surface is exactly
    radial around ``c0`` with radius ``scale * bumpy_radius(dir)``.
    Single source of truth for tests/studies that measure exact
    distance-to-surface (they must not re-derive this placement)."""
    v0, _ = make_bumpy_sphere()
    vmin, vmax = v0.min(axis=0), v0.max(axis=0)
    scale = target_height / (vmax[1] - vmin[1])
    c0 = SUBJECT_CENTER - (vmax + vmin) / 2 * scale
    return c0, scale


def bumpy_surface_error(verts: np.ndarray) -> np.ndarray:
    """Per-vertex |r - r_expected| of ``verts`` (world coords) against the
    analytic bumpy surface in dataset placement."""
    c0, scale = bumpy_surface_frame()
    d = np.asarray(verts, np.float64) - c0
    r = np.linalg.norm(d, axis=1)
    dirs = d / np.maximum(r[:, None], 1e-12)
    return np.abs(r - scale * bumpy_radius(dirs))


def rotation_y(deg: float) -> np.ndarray:
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


# ------------------------------------------------------------ rasterizer
def _vertex_normals(verts: np.ndarray, faces: np.ndarray,
                    ndc: np.ndarray) -> np.ndarray:
    """Area-weighted smooth vertex normals in view (NDC) space."""
    v0, v1, v2 = (ndc[faces[:, 0]], ndc[faces[:, 1]], ndc[faces[:, 2]])
    fn = np.cross(v1 - v0, v2 - v0)
    fn /= np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-12)
    vn = np.zeros_like(verts, dtype=np.float64)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    vn /= np.maximum(np.linalg.norm(vn, axis=1, keepdims=True), 1e-12)
    return vn


def rasterize_ortho(verts: np.ndarray, faces: np.ndarray, size: int,
                    calib: np.ndarray, albedo=(0.8, 0.65, 0.55),
                    vert_shade: np.ndarray | None = None,
                    uvs: np.ndarray | None = None,
                    face_uvs: np.ndarray | None = None,
                    texture: np.ndarray | None = None,
                    face_albedo: np.ndarray | None = None):
    """Orthographic z-buffer rasterizer.

    Prefers the native C++ kernel (native/raster.cc: parallel two-pass,
    atomic depth test; 100k faces at 1024^2 in tens of ms) and falls back
    to the identical-algorithm vectorized NumPy implementation below.

    ``calib`` maps world -> NDC ([-1, 1], y up); pixels follow the
    grid_sample convention (align_corners): u=-1 -> col 0, v=-1 -> row 0.

    Args:
        vert_shade: optional ``[V]`` or ``[V, 3]`` per-vertex shading
            multiplier (e.g. PRT diffuse), barycentrically interpolated.
        uvs / face_uvs / texture / face_albedo: UV-mapped albedo sampling
            (reference prt.fs:24-31 AlbedoMap): ``uvs [T, 2]`` OBJ vt
            coords (origin bottom-left), ``face_uvs [F, 3]`` indices into
            uvs with -1 marking untextured faces, ``texture [th, tw, 3]``
            float RGB in [0,1] sampled bilinearly with repeat wrap,
            ``face_albedo [F, 3]`` per-face flat Kd used where no texture
            applies.  All optional (load_obj_mtl produces them).

    Returns dict with rgb [H,W,3] float[0,1], mask [H,W] bool,
    zbuf [H,W] float (NDC z, +inf where empty), normal [H,W,3] view-space.
    """
    from ..native import load_raster
    import ctypes

    lib = load_raster()
    if lib is None:
        return _rasterize_ortho_numpy(verts, faces, size, calib, albedo,
                                      vert_shade, uvs, face_uvs, texture,
                                      face_albedo)
    verts = np.asarray(verts, np.float64)
    faces_c = np.ascontiguousarray(faces, dtype=np.int32)
    ndc = verts @ calib[:3, :3].T + calib[:3, 3]
    px = np.ascontiguousarray((ndc[:, 0] + 1.0) * 0.5 * (size - 1))
    py = np.ascontiguousarray((ndc[:, 1] + 1.0) * 0.5 * (size - 1))
    pz = np.ascontiguousarray(ndc[:, 2])
    vn = np.ascontiguousarray(_vertex_normals(verts, faces_c, ndc))
    albedo_c = np.ascontiguousarray(albedo, np.float64)
    light = np.array([0.3, 0.6, -0.8])
    light /= np.linalg.norm(light)
    light = np.ascontiguousarray(light)

    dp = ctypes.POINTER(ctypes.c_double)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)

    shade_ch = 0
    vs_ptr = dp()
    if vert_shade is not None:
        vs = np.ascontiguousarray(np.asarray(vert_shade, np.float64))
        shade_ch = 1 if vs.ndim == 1 else vs.shape[1]
        vs_ptr = vs.ctypes.data_as(dp)

    uv_ptr, fuv_ptr, tex_ptr, falb_ptr = dp(), ip(), fp(), dp()
    th = tw = 0
    if texture is not None and uvs is not None and face_uvs is not None:
        uvs_c = np.ascontiguousarray(uvs, np.float64)
        fuv_c = np.ascontiguousarray(face_uvs, np.int32)
        tex_c = np.ascontiguousarray(texture, np.float32)
        th, tw = tex_c.shape[:2]
        uv_ptr = uvs_c.ctypes.data_as(dp)
        fuv_ptr = fuv_c.ctypes.data_as(ip)
        tex_ptr = tex_c.ctypes.data_as(fp)
    if face_albedo is not None:
        falb_c = np.ascontiguousarray(face_albedo, np.float64)
        falb_ptr = falb_c.ctypes.data_as(dp)

    zbuf = np.empty((size, size), np.float32)
    nbuf = np.empty((size, size, 3), np.float32)
    rgb = np.empty((size, size, 3), np.float32)
    mask = np.empty((size, size), np.uint8)
    rc = lib.raster_ortho(
        px.ctypes.data_as(dp), py.ctypes.data_as(dp), pz.ctypes.data_as(dp),
        ctypes.c_int64(len(verts)), vn.ctypes.data_as(dp), vs_ptr,
        ctypes.c_int(shade_ch),
        faces_c.ctypes.data_as(ip),
        ctypes.c_int64(len(faces_c)), ctypes.c_int64(size),
        albedo_c.ctypes.data_as(dp), light.ctypes.data_as(dp),
        uv_ptr, fuv_ptr, tex_ptr, ctypes.c_int64(th), ctypes.c_int64(tw),
        falb_ptr,
        zbuf.ctypes.data_as(fp),
        nbuf.ctypes.data_as(fp),
        rgb.ctypes.data_as(fp),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        0,
    )
    if rc != 0:
        return _rasterize_ortho_numpy(verts, faces, size, calib, albedo,
                                      vert_shade, uvs, face_uvs, texture,
                                      face_albedo)
    return {"rgb": rgb.astype(np.float64), "mask": mask.astype(bool),
            "zbuf": zbuf.astype(np.float64), "normal": nbuf.astype(np.float64)}


def _rasterize_ortho_numpy(verts: np.ndarray, faces: np.ndarray, size: int,
                           calib: np.ndarray, albedo=(0.8, 0.65, 0.55),
                           vert_shade: np.ndarray | None = None,
                           uvs: np.ndarray | None = None,
                           face_uvs: np.ndarray | None = None,
                           texture: np.ndarray | None = None,
                           face_albedo: np.ndarray | None = None):
    """Vectorized NumPy fallback of :func:`rasterize_ortho`.

    ``calib`` maps world -> NDC ([-1, 1], y up); pixels follow the
    grid_sample convention (align_corners): u=-1 -> col 0, v=-1 -> row 0.

    Two passes, no per-face Python loop (the reference renders through an
    OpenGL FBO, traindata/render_data.py:147-288; this is the CPU-native
    equivalent sized for its real workloads — a 100k-face subject at
    1024^2 rasterizes in well under a second):

    1. visibility — faces are bucketed by bbox pixel count; per bucket the
       candidate pixels of ALL faces are enumerated with one broadcast,
       barycentric-tested, and scattered into the z-buffer as packed
       ``(quantized z << 32) | face_id`` int64 via ``np.minimum.at`` —
       an atomic-min depth test, exactly GL's depth-buffer semantics.
    2. attributes — for each covered pixel, the winning face's barycentric
       coordinates are recomputed once; normals (and optional per-vertex
       shading) interpolate vectorized over covered pixels only.

    Args:
        vert_shade: optional ``[V]`` or ``[V, 3]`` per-vertex shading
            multiplier (e.g. PRT diffuse), barycentrically interpolated.

    Returns dict with rgb [H,W,3] float[0,1], mask [H,W] bool,
    zbuf [H,W] float (NDC z, +inf where empty), normal [H,W,3] view-space.
    """
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces)
    ndc = verts @ calib[:3, :3].T + calib[:3, 3]
    px = (ndc[:, 0] + 1.0) * 0.5 * (size - 1)
    py = (ndc[:, 1] + 1.0) * 0.5 * (size - 1)
    pz = ndc[:, 2]
    vn = _vertex_normals(verts, faces, ndc)

    zbuf = np.full((size, size), np.inf)
    nbuf = np.zeros((size, size, 3))
    rgb = np.ones((size, size, 3))
    mask = np.zeros((size, size), dtype=bool)
    albedo = np.asarray(albedo, np.float64)
    light = np.array([0.3, 0.6, -0.8])
    light /= np.linalg.norm(light)

    # per-face screen coords and edge-function setup
    fx = px[faces]                                      # [F, 3]
    fy = py[faces]
    fz = pz[faces]
    d = ((fy[:, 1] - fy[:, 2]) * (fx[:, 0] - fx[:, 2])
         + (fx[:, 2] - fx[:, 1]) * (fy[:, 0] - fy[:, 2]))
    x0 = np.clip(np.floor(fx.min(1)).astype(np.int64), 0, size - 1)
    x1 = np.clip(np.ceil(fx.max(1)).astype(np.int64), 0, size - 1)
    y0 = np.clip(np.floor(fy.min(1)).astype(np.int64), 0, size - 1)
    y1 = np.clip(np.ceil(fy.max(1)).astype(np.int64), 0, size - 1)
    w = x1 - x0 + 1
    h = y1 - y0 + 1
    keep = (np.abs(d) > 1e-12) & (np.ceil(fx.max(1)) >= 0) \
        & (np.floor(fx.min(1)) <= size - 1) \
        & (np.ceil(fy.max(1)) >= 0) & (np.floor(fy.min(1)) <= size - 1)

    # pack z into the high 32 bits for an atomic-min depth+id test
    zmin = float(pz.min())
    zspan = max(float(pz.max()) - zmin, 1e-12)

    def zq(z):
        q = (z - zmin) / zspan * float(2 ** 31 - 4)
        return np.clip(q, 0, 2 ** 31 - 2).astype(np.int64)

    packed = np.full(size * size, np.iinfo(np.int64).max, np.int64)
    area = (w * h).astype(np.int64)
    face_ids = np.arange(len(faces), dtype=np.int64)

    # bucket faces by candidate-pixel count to keep broadcasts tight
    bounds = [4, 16, 64, 256, 1024, 4096]
    while bounds[-1] < size * size:
        bounds.append(bounds[-1] * 4)
    lo = 0
    for cap in bounds:
        sel = np.nonzero(keep & (area > lo) & (area <= cap))[0]
        lo = cap
        if sel.size == 0:
            continue
        offs = np.arange(cap, dtype=np.int64)
        ws = w[sel][:, None]
        gx = x0[sel][:, None] + offs[None, :] % ws     # [Fb, cap]
        gy = y0[sel][:, None] + offs[None, :] // ws
        valid = gy <= y1[sel][:, None]
        gxf = gx.astype(np.float64)
        gyf = gy.astype(np.float64)
        X = fx[sel]
        Y = fy[sel]
        dd = d[sel][:, None]
        w0 = ((Y[:, 1:2] - Y[:, 2:3]) * (gxf - X[:, 2:3])
              + (X[:, 2:3] - X[:, 1:2]) * (gyf - Y[:, 2:3])) / dd
        w1 = ((Y[:, 2:3] - Y[:, 0:1]) * (gxf - X[:, 2:3])
              + (X[:, 0:1] - X[:, 2:3]) * (gyf - Y[:, 2:3])) / dd
        w2 = 1.0 - w0 - w1
        inside = valid & (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        Z = fz[sel]
        z = w0 * Z[:, 0:1] + w1 * Z[:, 1:2] + w2 * Z[:, 2:3]
        pix = (gy * size + gx)[inside]
        val = (zq(z[inside]) << 32) | np.broadcast_to(
            face_ids[sel][:, None], inside.shape)[inside]
        np.minimum.at(packed, pix, val)

    covered = np.nonzero(packed != np.iinfo(np.int64).max)[0]
    if covered.size == 0:
        return {"rgb": rgb, "mask": mask, "zbuf": zbuf, "normal": nbuf}

    # pass 2: attribute interpolation for winning (pixel, face) pairs
    fid = (packed[covered] & 0xFFFFFFFF).astype(np.int64)
    cy = (covered // size).astype(np.float64)
    cx = (covered % size).astype(np.float64)
    X = fx[fid]
    Y = fy[fid]
    dd = d[fid]
    w0 = ((Y[:, 1] - Y[:, 2]) * (cx - X[:, 2])
          + (X[:, 2] - X[:, 1]) * (cy - Y[:, 2])) / dd
    w1 = ((Y[:, 2] - Y[:, 0]) * (cx - X[:, 2])
          + (X[:, 0] - X[:, 2]) * (cy - Y[:, 2])) / dd
    w2 = 1.0 - w0 - w1
    tri = faces[fid]                                    # [P, 3]
    z = (w0 * pz[tri[:, 0]] + w1 * pz[tri[:, 1]] + w2 * pz[tri[:, 2]])
    n = (w0[:, None] * vn[tri[:, 0]] + w1[:, None] * vn[tri[:, 1]]
         + w2[:, None] * vn[tri[:, 2]])
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    shade = np.clip(np.abs(n @ light), 0.15, 1.0)[:, None]
    alb = np.broadcast_to(albedo, (len(fid), 3)).copy()
    if face_albedo is not None:
        alb = np.asarray(face_albedo, np.float64)[fid]
    if texture is not None and uvs is not None and face_uvs is not None:
        fuv = np.asarray(face_uvs, np.int64)[fid]          # [P, 3]
        textured = (fuv >= 0).all(axis=1)
        if textured.any():
            tex = np.asarray(texture, np.float64)
            th, tw = tex.shape[:2]
            uvt = np.asarray(uvs, np.float64)
            fu = fuv[textured]
            u = (w0[textured] * uvt[fu[:, 0], 0]
                 + w1[textured] * uvt[fu[:, 1], 0]
                 + w2[textured] * uvt[fu[:, 2], 0])
            vv = (w0[textured] * uvt[fu[:, 0], 1]
                  + w1[textured] * uvt[fu[:, 1], 1]
                  + w2[textured] * uvt[fu[:, 2], 1])
            u -= np.floor(u)                               # repeat wrap
            vv -= np.floor(vv)
            fx_ = u * (tw - 1)
            fy_ = (1.0 - vv) * (th - 1)                    # vt is y-up
            ix = np.clip(fx_.astype(np.int64), 0, max(tw - 2, 0))
            iy = np.clip(fy_.astype(np.int64), 0, max(th - 2, 0))
            du = (fx_ - ix)[:, None]
            dv = (fy_ - iy)[:, None]
            x2 = np.minimum(ix + 1, tw - 1)
            y2 = np.minimum(iy + 1, th - 1)
            alb[textured] = ((1 - dv) * ((1 - du) * tex[iy, ix]
                                         + du * tex[iy, x2])
                             + dv * ((1 - du) * tex[y2, ix]
                                     + du * tex[y2, x2]))
    col = alb * shade
    if vert_shade is not None:
        vs = np.asarray(vert_shade, np.float64)
        if vs.ndim == 1:
            vs = vs[:, None]
        s = (w0[:, None] * vs[tri[:, 0]] + w1[:, None] * vs[tri[:, 1]]
             + w2[:, None] * vs[tri[:, 2]])
        col = np.clip(col * s, 0.0, 1.0)

    yy = covered // size
    xx = covered % size
    zbuf[yy, xx] = z
    nbuf[yy, xx] = n
    rgb[yy, xx] = col
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
        elif name == "bumpy":
            v, f = make_bumpy_sphere()
        else:
            v, f = make_capsule(1.6, 0.55, 3)
        v = normalize_mesh_height(v, 180.0)
        center = SUBJECT_CENTER  # reference-like training box placement
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
