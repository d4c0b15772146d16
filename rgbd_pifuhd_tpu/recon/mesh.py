"""Mesh IO and host-side mesh utilities.

- ``save_obj_with_color`` — OBJ writer with per-vertex colors; faces are
  written with flipped winding ``f v0 v2 v1``, matching the reference's
  export convention (/root/reference/mesh_util.py:189-198).
- ``load_obj`` — minimal OBJ reader (v/vn/vt/f, triangulates quads), the
  equivalent of traindata/lib/renderer/mesh.py:48-160.
- ``connected_components`` / ``keep_largest_component`` — replaces the
  reference's trimesh ``.split()`` mesh cleaning (reconstruction.py:325-344)
  with a union-find over face connectivity; "largest" follows the reference
  in keeping the component with the greatest vertical (y) extent.
- ``compute_vertex_normals`` — area-weighted vertex normals
  (traindata/lib/renderer/mesh.py:300-320 equivalent).
"""

from __future__ import annotations

import os

import numpy as np


def save_obj_with_color(path: str, verts: np.ndarray, faces: np.ndarray,
                        colors: np.ndarray | None = None) -> None:
    """Write OBJ with 'v x y z r g b' lines and flipped face winding.

    Uses the native writer when built (~25x faster at 1M verts); the
    Python path produces byte-identical output.
    """
    from ..native import load_meshio

    lib = load_meshio()
    if lib is not None:
        import ctypes

        v = np.ascontiguousarray(verts, dtype=np.float32)
        f = np.ascontiguousarray(faces, dtype=np.int32)
        c = (np.ascontiguousarray(colors, dtype=np.float32)
             if colors is not None else None)
        rc = lib.obj_write(
            path.encode(),
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            if c is not None else None,
            ctypes.c_int64(len(v)),
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(len(f)),
        )
        if rc == 0:
            return

    verts = np.asarray(verts, dtype=np.float64)
    faces = np.asarray(faces, dtype=np.int64)
    lines = []
    if colors is None:
        for v in verts:
            lines.append(f"v {v[0]:.4f} {v[1]:.4f} {v[2]:.4f}")
    else:
        colors = np.asarray(colors, dtype=np.float64)
        for v, c in zip(verts, colors):
            lines.append(
                f"v {v[0]:.4f} {v[1]:.4f} {v[2]:.4f} "
                f"{c[0]:.4f} {c[1]:.4f} {c[2]:.4f}"
            )
    for f in faces + 1:
        lines.append(f"f {f[0]} {f[2]} {f[1]}")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def save_ply_with_color(path: str, verts: np.ndarray, faces: np.ndarray,
                        colors: np.ndarray | None = None) -> None:
    """Binary little-endian PLY writer (serving-oriented output format).

    The reference exports text OBJ only (mesh_util.py:189-198); a 1.3M-vert
    colored mesh is ~90 MB of decimal text and the formatting dominates the
    host tail.  Binary PLY is a near-memcpy: two packed structured arrays
    stream straight to the file (~10-40x faster at 1M verts).  Colors are
    stored as uchar RGB (the device already quantizes to uint8 precision);
    face winding is flipped exactly like the OBJ writer, so importers see
    the same orientation.
    """
    v = np.asarray(verts, np.float32)
    f = np.asarray(faces)
    V, F = len(v), len(f)
    has_c = colors is not None
    props = ["property float x", "property float y", "property float z"]
    if has_c:
        props += ["property uchar red", "property uchar green",
                  "property uchar blue"]
    header = "\n".join(
        ["ply", "format binary_little_endian 1.0",
         f"element vertex {V}"] + props +
        [f"element face {F}",
         "property list uchar int vertex_indices", "end_header", ""])
    vdt = (np.dtype([("xyz", "<f4", 3), ("rgb", "u1", 3)]) if has_c
           else np.dtype([("xyz", "<f4", 3)]))
    vbuf = np.empty(V, vdt)
    vbuf["xyz"] = v
    if has_c:
        c = np.asarray(colors, np.float32)
        vbuf["rgb"] = np.clip(np.round(c * 255.0), 0, 255).astype(np.uint8)
    fdt = np.dtype([("n", "u1"), ("idx", "<i4", 3)])
    fbuf = np.empty(F, fdt)
    fbuf["n"] = 3
    fbuf["idx"] = f[:, [0, 2, 1]]  # flipped winding, as the OBJ writer
    with open(path, "wb") as fh:
        fh.write(header.encode("ascii"))
        vbuf.tofile(fh)
        fbuf.tofile(fh)


def load_ply(path: str):
    """Read a binary-little-endian PLY written by ``save_ply_with_color``.

    Returns ``(verts [V,3] f32, faces [F,3] i32 — winding un-flipped back,
    colors [V,3] f32 in [0,1] or None)``.
    """
    with open(path, "rb") as fh:
        V = F = 0
        has_c = False
        while True:
            line = fh.readline().decode("ascii").strip()
            if line.startswith("element vertex"):
                V = int(line.split()[-1])
            elif line.startswith("element face"):
                F = int(line.split()[-1])
            elif line == "property uchar red":
                has_c = True
            elif line == "end_header":
                break
        vdt = (np.dtype([("xyz", "<f4", 3), ("rgb", "u1", 3)]) if has_c
               else np.dtype([("xyz", "<f4", 3)]))
        vbuf = np.fromfile(fh, vdt, V)
        fbuf = np.fromfile(fh, np.dtype([("n", "u1"), ("idx", "<i4", 3)]), F)
    verts = vbuf["xyz"].astype(np.float32)
    colors = (vbuf["rgb"].astype(np.float32) / 255.0) if has_c else None
    faces = fbuf["idx"][:, [0, 2, 1]].astype(np.int32)
    return verts, faces, colors


def format_faces_block(faces: np.ndarray):
    """Pre-format the OBJ face block (flipped winding) into a native text
    buffer WITHOUT writing it — callers run this while the device is still
    computing vertex colors; the streamed writer appends it after the last
    vertex group (pipeline._write_obj_streamed, which also frees it).
    Returns an opaque blob or None when the native library is unavailable
    (fall back to save_obj_with_color).
    """
    from ..native import load_meshio
    lib = load_meshio()
    if lib is None or getattr(lib, "obj_format_faces", None) is None:
        return None
    import ctypes

    f = np.ascontiguousarray(faces, np.int32)
    buf = ctypes.POINTER(ctypes.c_char)()
    ln = ctypes.c_int64()
    rc = lib.obj_format_faces(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(f)), ctypes.byref(buf), ctypes.byref(ln))
    if rc != 0:
        return None
    return (lib, buf, ln)


def load_obj(path: str):
    """Minimal OBJ reader -> (verts [V,3], faces [F,3], colors or None).

    Handles 'v' (with optional rgb), 'f' with /vt/vn suffixes and quads
    (fan triangulation), ignoring everything else.
    """
    verts, colors, faces = [], [], []
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                vals = [float(x) for x in parts[1:]]
                verts.append(vals[:3])
                if len(vals) >= 6:
                    colors.append(vals[3:6])
            elif parts[0] == "f":
                idx = [int(p.split("/")[0]) - 1 for p in parts[1:]]
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    v = np.asarray(verts, dtype=np.float32)
    f = np.asarray(faces, dtype=np.int32)
    c = np.asarray(colors, dtype=np.float32) if colors else None
    return v, f, c


def load_obj_mtl(path: str):
    """OBJ reader with UV / material support (the textured-subject loader,
    reference traindata/lib/renderer/mesh.py:110-221 load_obj_mesh_mtl).

    Parses ``vt`` texture coords, ``mtllib``/``usemtl`` material switches,
    and the referenced .mtl files (``newmtl`` / ``Kd`` / ``map_Kd``).
    Returns a dict:

        verts       [V, 3] float32
        faces       [F, 3] int32
        uvs         [T, 2] float32 (or None when the OBJ has no vt)
        face_uvs    [F, 3] int32 indices into uvs; -1 = face has no UVs
        face_albedo [F, 3] float64 per-face flat Kd (fallback shading for
                    faces without a texture; default 0.8/0.65/0.55)
        texture     [th, tw, 3] float32 in [0,1] RGB, or None — the first
                    map_Kd image found (the reference renders one albedo
                    map per material group, prt.fs:24-31; subjects ship a
                    single skin texture)

    Negative OBJ indices and quad faces (fan triangulation) are handled.
    """
    obj_dir = os.path.dirname(os.path.abspath(path))
    default_kd = (0.8, 0.65, 0.55)
    materials: dict[str, dict] = {}

    def parse_mtl(mtl_path: str) -> None:
        if not os.path.exists(mtl_path):
            return
        cur = None
        with open(mtl_path) as fh:
            for line in fh:
                parts = line.split()
                if not parts:
                    continue
                if parts[0] == "newmtl":
                    cur = parts[1] if len(parts) > 1 else ""
                    materials.setdefault(cur, {"Kd": default_kd,
                                               "map_Kd": None})
                elif parts[0] == "Kd" and cur is not None:
                    materials[cur]["Kd"] = tuple(
                        float(x) for x in parts[1:4])
                elif (parts[0] == "map_Kd" and cur is not None
                      and len(parts) > 1):
                    # filename = rest of the line (may contain spaces)
                    materials[cur]["map_Kd"] = os.path.join(
                        obj_dir, line.split(None, 1)[1].strip())

    verts, uvs, faces, face_uvs, face_mats = [], [], [], [], []
    cur_mat = None
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "mtllib" and len(parts) > 1:
                # filename = rest of the line (may contain spaces)
                parse_mtl(os.path.join(obj_dir,
                                       line.split(None, 1)[1].strip()))
            elif tag == "usemtl":
                cur_mat = parts[1] if len(parts) > 1 else None
            elif tag == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif tag == "vt":
                uvs.append([float(parts[1]), float(parts[2])])
            elif tag == "f":
                vi, ti = [], []
                for p in parts[1:]:
                    comps = p.split("/")
                    i = int(comps[0])
                    vi.append(i - 1 if i > 0 else len(verts) + i)
                    if len(comps) > 1 and comps[1]:
                        j = int(comps[1])
                        ti.append(j - 1 if j > 0 else len(uvs) + j)
                    else:
                        ti.append(-1)
                for k in range(1, len(vi) - 1):
                    faces.append([vi[0], vi[k], vi[k + 1]])
                    face_uvs.append([ti[0], ti[k], ti[k + 1]])
                    face_mats.append(cur_mat)

    texture = None
    tex_mat = None
    for name, m in materials.items():
        if m["map_Kd"] and os.path.exists(m["map_Kd"]):
            try:
                import cv2
                img = cv2.imread(m["map_Kd"])
                if img is not None:
                    texture = img[:, :, ::-1].astype(np.float32) / 255.0
                    tex_mat = name
                    break
            except ImportError:
                pass

    F = len(faces)
    face_albedo = np.empty((F, 3), np.float64)
    fuv = np.asarray(face_uvs, np.int32).reshape(F, 3)
    for i, mat in enumerate(face_mats):
        kd = materials.get(mat, {}).get("Kd", default_kd)
        face_albedo[i] = kd
        # faces of a DIFFERENT textured material (multi-texture OBJ) fall
        # back to their flat Kd: single-texture support, documented above
        if texture is not None and mat != tex_mat:
            fuv[i] = -1
    return {
        "verts": np.asarray(verts, np.float32),
        "faces": np.asarray(faces, np.int32).reshape(F, 3),
        "uvs": np.asarray(uvs, np.float32) if uvs else None,
        "face_uvs": fuv,
        "face_albedo": face_albedo,
        "texture": texture,
    }


def connected_components(n_verts: int, faces: np.ndarray) -> np.ndarray:
    """Union-find vertex labels [V] from face connectivity."""
    parent = np.arange(n_verts, dtype=np.int64)

    def find(i):
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:  # path compression
            parent[i], i = root, parent[i]
        return root

    for f in np.asarray(faces, dtype=np.int64):
        a = find(f[0])
        b = find(f[1])
        c = find(f[2])
        parent[b] = a
        parent[c] = a
    return np.array([find(i) for i in range(n_verts)], dtype=np.int64)


def keep_largest_component(verts: np.ndarray, faces: np.ndarray,
                           colors: np.ndarray | None = None, axis: int = 0):
    """Keep the connected component with the largest extent along ``axis``.

    Parity with the reference's meshcleaning (reconstruction.py:325-344),
    which keeps the component with the largest axis-0 extent
    (``bounds[1,0] - bounds[0,0]``).
    """
    labels = connected_components(len(verts), faces)
    roots, inv = np.unique(labels, return_inverse=True)
    best, best_h = None, -1.0
    for k, r in enumerate(roots):
        sel = inv == k
        if sel.sum() < 3:
            continue
        ys = verts[sel][:, axis]
        h = float(ys.max() - ys.min())
        if h > best_h:
            best, best_h = k, h
    keep = inv == best
    remap = -np.ones(len(verts), dtype=np.int64)
    remap[keep] = np.arange(int(keep.sum()))
    fmask = keep[faces].all(axis=1)
    new_faces = remap[faces[fmask]].astype(np.int32)
    new_colors = colors[keep] if colors is not None else None
    return verts[keep], new_faces, new_colors


def compute_vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted per-vertex normals (normalized).

    Scatter-adds via ``np.bincount`` — ~20x faster than ``np.add.at`` at
    multi-million-face meshes (the `normal_mode='mesh'` coloring path is
    chosen for speed, so the host scatter must not become the new tail).
    """
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)  # magnitude == 2*area
    normals = np.zeros((len(verts), 3), dtype=np.float64)
    idx = faces.reshape(-1)  # [3F] — each face scatters into 3 verts
    for c in range(3):
        w = np.broadcast_to(fn[:, c:c + 1], (len(fn), 3)).reshape(-1)
        normals[:, c] = np.bincount(idx, weights=w, minlength=len(verts))
    lens = np.linalg.norm(normals, axis=1, keepdims=True)
    return (normals / np.maximum(lens, 1e-12)).astype(np.float32)


def save_ply_points(path: str, points: np.ndarray,
                    colors: np.ndarray | None = None) -> None:
    """ASCII PLY point-cloud dump (debugging aid; replaces the reference's
    traindata/lib/sample_util.py save_samples_truncted_prob)."""
    points = np.asarray(points, dtype=np.float64)
    n = len(points)
    has_c = colors is not None
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if has_c:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write("end_header\n")
        if has_c:
            c255 = np.clip(np.asarray(colors) * 255, 0, 255).astype(int)
            for p, c in zip(points, c255):
                f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} "
                        f"{c[0]} {c[1]} {c[2]}\n")
        else:
            for p in points:
                f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f}\n")


def save_occupancy_samples_ply(path: str, points: np.ndarray,
                               prob: np.ndarray) -> None:
    """Red = inside (prob > 0.5), green = outside (sample_util parity)."""
    prob = np.asarray(prob).reshape(-1)
    colors = np.stack(
        [prob > 0.5, prob <= 0.5, np.zeros_like(prob)], axis=1
    ).astype(np.float64)
    save_ply_points(path, points, colors)
