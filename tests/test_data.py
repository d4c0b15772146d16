"""Data-layer tests: preprocessing, containment, sampling, synthetic tree,
dataset readers."""

import os

import numpy as np
import pytest

from rgbd_pifuhd_tpu.data.preprocessing import (
    addrect,
    rect_to_ndc_transform,
    normalize_image,
)
from rgbd_pifuhd_tpu.data.containment import (
    MeshContainmentTester,
    points_in_mesh,
)
from rgbd_pifuhd_tpu.data.sampling import (
    sample_surface_points,
    sample_occupancy_points,
)
from rgbd_pifuhd_tpu.data.synthetic import (
    make_icosphere,
    make_capsule,
    normalize_mesh_height,
    rasterize_ortho,
    generate_synthetic_dataset,
)


def test_addrect_zero_pad():
    img = np.arange(25, dtype=np.uint8).reshape(5, 5, 1)
    out = addrect(img, (-2, -2, 5, 5))  # crop extends past top-left
    assert out.shape == (5, 5, 1)
    assert out[0, 0, 0] == 0 and out[2, 2, 0] == img[0, 0, 0]
    out2 = addrect(img, (1, 1, 3, 3))
    np.testing.assert_array_equal(out2[:, :, 0], img[1:4, 1:4, 0])


def test_rect_ndc_transform_centers_rect():
    # a rect centered in the image must produce pure scaling
    t = rect_to_ndc_transform((256, 256, 512, 512), 1024, 1024)
    assert t[0, 3] == 0.0 and t[1, 3] == 0.0
    assert t[0, 0] == 2.0  # 1024/512 zoom


def test_normalize_image_range():
    img = np.array([[[0, 128, 255]]], dtype=np.uint8)
    out = normalize_image(img)
    np.testing.assert_allclose(out[0, 0], [-1.0, 0.00392157, 1.0], atol=1e-5)


def test_containment_sphere(rng):
    v, f = make_icosphere(3, 1.0)
    pts = rng.uniform(-1.5, 1.5, (2000, 3))
    inside = points_in_mesh(pts, v, f)
    r = np.linalg.norm(pts, axis=1)
    # icosphere at subdiv 3 approximates the unit sphere within ~1%
    clear = (r < 0.95) | (r > 1.05)
    np.testing.assert_array_equal(inside[clear], (r < 1.0)[clear])


def test_containment_translated_capsule(rng):
    v, f = make_capsule(1.6, 0.5, 2)
    v = v + np.array([10.0, -5.0, 3.0])
    tester = MeshContainmentTester(v, f)
    assert tester.contains(np.array([[10.0, -5.0, 3.0]]))[0]
    assert not tester.contains(np.array([[0.0, 0.0, 0.0]]))[0]


def test_surface_sampling_on_surface(rng):
    v, f = make_icosphere(3, 2.0)
    pts = sample_surface_points(v, f, 500, rng)
    r = np.linalg.norm(pts, axis=1)
    assert np.abs(r - 2.0).max() < 0.05  # on the (faceted) sphere


def test_occupancy_sampling_balance(rng):
    v, f = make_icosphere(2, 1.0)
    v = normalize_mesh_height(v, 100.0)
    samples, labels = sample_occupancy_points(
        v, f, 300, v.min(0) - 10, v.max(0) + 10, rng, sigma=5.0)
    assert samples.shape == (300, 3) and labels.shape == (300, 1)
    frac_in = labels.mean()
    assert 0.2 < frac_in <= 0.5  # balanced-ish, never more than half inside


def test_rasterizer_sphere_mask_and_depth():
    v, f = make_icosphere(3, 1.0)
    v = normalize_mesh_height(v, 180.0) + np.array([0.0, 0.0, -400.0])
    # calib: world -> NDC with y flip, scaled to fit
    calib = np.diag([1 / 128, -1 / 128, 1 / 128, 1.0])
    calib[2, 3] = 400.0 / 128
    out = rasterize_ortho(v, f, 128, calib)
    m = out["mask"]
    assert 0.1 < m.mean() < 0.6
    # sphere: mask is (roughly) a disc centered in the image
    ys, xs = np.nonzero(m)
    assert abs(xs.mean() - 63.5) < 2 and abs(ys.mean() - 63.5) < 2
    # depth exists only on the mask
    assert np.isinf(out["zbuf"][~m]).all()
    assert np.isfinite(out["zbuf"][m]).all()


def test_native_rasterizer_matches_numpy():
    """C++ kernel (native/raster.cc) vs the vectorized NumPy fallback."""
    from rgbd_pifuhd_tpu.data.synthetic import _rasterize_ortho_numpy
    from rgbd_pifuhd_tpu.native import load_raster

    v, f = make_icosphere(3, 1.0)
    v = normalize_mesh_height(v, 1.8)
    calib = np.eye(4)
    b = _rasterize_ortho_numpy(v, f, 96, calib)
    a = rasterize_ortho(v, f, 96, calib)
    if load_raster() is None:
        return  # no compiler: both paths are the same implementation
    np.testing.assert_array_equal(a["mask"], b["mask"])
    m = a["mask"]
    np.testing.assert_allclose(a["zbuf"][m], b["zbuf"][m], atol=1e-5)
    np.testing.assert_allclose(a["normal"][m], b["normal"][m], atol=1e-5)
    np.testing.assert_allclose(a["rgb"][m], b["rgb"][m], atol=1e-5)

    # per-vertex shading interpolation path
    shade = np.linspace(0.2, 1.0, len(v))
    a = rasterize_ortho(v, f, 96, calib, vert_shade=shade)
    b = _rasterize_ortho_numpy(v, f, 96, calib, vert_shade=shade)
    np.testing.assert_allclose(a["rgb"][m], b["rgb"][m], atol=1e-5)


def test_color_jitter_gated_and_applied(tmp_path):
    from rgbd_pifuhd_tpu.data.datasets import TrainDataset
    from rgbd_pifuhd_tpu.utils.options import Options
    import dataclasses

    root = os.path.join(tmp_path, "td")
    generate_synthetic_dataset(root, subjects=("sphere",), size=64,
                               load_size=128)
    base = Options(dataroot=root, load_size=128, load_size_big=128,
                   load_size_local=64, num_sample_inout=16, sigma=5.0)

    off = TrainDataset(base, load_mesh=False, seed=0)
    a = off[0]["img"]
    b = off[0]["img"]
    np.testing.assert_array_equal(a, b)  # default: no jitter, deterministic

    on = TrainDataset(dataclasses.replace(base, use_aug=True, aug_blur=1.0),
                      load_mesh=False, seed=0)
    c = on[0]["img"]
    assert np.abs(c[..., :3] - a[..., :3]).max() > 1e-3  # rgb jittered
    np.testing.assert_array_equal(c[..., 3:], a[..., 3:])  # depth untouched


def test_encode_objs_cli(tmp_path):
    from rgbd_pifuhd_tpu.cli.encode_objs import explore

    p = os.path.join(tmp_path, "a.obj")
    text = "# mağza\nv 0 0 0\n"           # ğ: differs across encodings
    with open(p, "wb") as fh:
        fh.write(text.encode("ISO-8859-9"))
    q = os.path.join(tmp_path, "b.obj")
    with open(q, "w", encoding="utf-8") as fh:
        fh.write(text)
    assert explore(tmp_path) == 1               # only the ISO file changes
    assert open(p, encoding="utf-8").read() == text
    assert open(q, encoding="utf-8").read() == text


def test_synthetic_tree_and_datasets(tmp_path, rng):
    from rgbd_pifuhd_tpu.data.datasets import TrainDataset, EvalDataset
    from rgbd_pifuhd_tpu.utils.options import Options

    root = os.path.join(tmp_path, "traindata")
    generate_synthetic_dataset(root, subjects=("sphere",), size=128,
                               load_size=256)
    for d in ("RENDER/sphere", "MASK/sphere", "DEPTH/sphere", "NORM/sphere",
              "PARAM/sphere", "OBJ", "gen", "normal"):
        assert os.listdir(os.path.join(root, d)), d

    opt = Options(dataroot=root, load_size=256, load_size_big=256,
                  load_size_local=128, num_sample_inout=100, sigma=5.0)
    ds = TrainDataset(opt, use_crop=False)
    assert len(ds) == 1
    item = ds[0]
    assert item["img"].shape == (1, 256, 256, 6)
    assert item["img_512"].shape == (128, 128, 6)
    assert item["samples"].shape == (100, 3)
    assert set(np.unique(item["labels"])) <= {0.0, 1.0}
    assert item["labels"].mean() > 0.05  # sampler found the inside

    # calib projects mesh center into the unit box
    from rgbd_pifuhd_tpu.ops import geometry as G
    import jax.numpy as jnp
    center = np.array([[[-128.0, 100.0, -434.0]]], np.float32)
    ndc = np.asarray(G.orthogonal(jnp.asarray(center),
                                  jnp.asarray(item["calib"][None])))
    assert np.abs(ndc).max() < 0.5

    ev = EvalDataset(opt)
    assert len(ev) == 1 and "samples" in ev[0]


def test_composite_over_backgrounds(tmp_path):
    from rgbd_pifuhd_tpu.data.composite import composite_over_backgrounds

    root = os.path.join(tmp_path, "td")
    generate_synthetic_dataset(root, subjects=("sphere",), size=64,
                               load_size=64)
    written = composite_over_backgrounds(root, per_subject=2, seed=1)
    assert len(written) == 2
    import cv2
    img = cv2.imread(written[0])
    assert img.shape == (64, 64, 3)


def test_turntable_frames(tmp_path):
    from rgbd_pifuhd_tpu.data.synthetic import make_icosphere
    from rgbd_pifuhd_tpu.recon.turntable import render_turntable_frames

    v, f = make_icosphere(2, 1.0)
    frames = list(render_turntable_frames(v.astype(np.float32),
                                          f.astype(np.int32),
                                          size=64, n_frames=3))
    assert len(frames) == 3
    assert frames[0].shape == (64, 64, 3) and frames[0].dtype == np.uint8
    # the sphere must actually appear (non-white pixels)
    assert (frames[0] < 250).any()


def test_ply_dump(tmp_path):
    from rgbd_pifuhd_tpu.recon.mesh import save_occupancy_samples_ply

    pts = np.random.default_rng(0).uniform(-1, 1, (20, 3))
    prob = np.linspace(0, 1, 20)
    path = os.path.join(tmp_path, "s.ply")
    save_occupancy_samples_ply(path, pts, prob)
    text = open(path).read()
    assert "element vertex 20" in text
    body = text.split("end_header\n")[1].strip().split("\n")
    assert len(body) == 20
    assert all(l.endswith(("255 0 0", "0 255 0")) for l in body)


def test_render_dataset_from_obj(tmp_path):
    """render_data-equivalent: OBJ subjects -> full tree -> TrainDataset."""
    from rgbd_pifuhd_tpu.data.render_dataset import render_dataset
    from rgbd_pifuhd_tpu.data.composite import composite_over_backgrounds
    from rgbd_pifuhd_tpu.data.datasets import TrainDataset
    from rgbd_pifuhd_tpu.recon.mesh import save_obj_with_color
    from rgbd_pifuhd_tpu.utils.options import Options

    objs = os.path.join(tmp_path, "objs")
    os.makedirs(objs)
    v, f = make_icosphere(2, 1.0)
    save_obj_with_color(os.path.join(objs, "subj.obj"), v, f)

    root = os.path.join(tmp_path, "td")
    views = render_dataset(root, objs, size=64, load_size=64, yaw_step=180)
    assert views == {"subj": 2}
    composite_over_backgrounds(root)

    opt = Options(dataroot=root, load_size=64, load_size_big=64,
                  load_size_local=64, num_sample_inout=64, sigma=0.05)
    ds = TrainDataset(opt, b_min="auto", b_max="auto")
    assert len(ds) == 1
    item = ds[0]
    assert item["samples"].shape == (64, 3)
    assert item["labels"].mean() > 0.05
    # calib from PARAM must project the mesh center near NDC origin
    from rgbd_pifuhd_tpu.ops import geometry as G
    import jax.numpy as jnp
    ndc = np.asarray(G.orthogonal(jnp.zeros((1, 1, 3)),
                                  jnp.asarray(item["calib"][None])))
    assert np.abs(ndc).max() < 0.2


def test_prefetcher_order_and_errors():
    from rgbd_pifuhd_tpu.data.prefetch import Prefetcher

    items = list(Prefetcher(lambda i: i * i, range(10), num_threads=3))
    assert items == [i * i for i in range(10)]

    def bad(i):
        if i == 3:
            raise ValueError("boom")
        return i

    with pytest.raises(ValueError):
        list(Prefetcher(bad, range(5), num_threads=2))


def test_prefetch_batches_tail():
    """drop_last=False yields the remainder as one shorter batch; the
    training default (drop_last=True) keeps only full batches — and a
    dataset smaller than batch_size still yields its items under
    drop_last=False (previously zero batches -> NaN eval hazard)."""
    from rgbd_pifuhd_tpu.data.prefetch import prefetch_batches

    data = list(range(10))
    collate = list
    full = [b for b in prefetch_batches(data, 4, collate, range(10))]
    assert [len(b) for b in full] == [4, 4]
    every = [b for b in prefetch_batches(data, 4, collate, range(10),
                                         drop_last=False)]
    assert [len(b) for b in every] == [4, 4, 2]
    assert sorted(sum(every, [])) == data

    tiny = [b for b in prefetch_batches(data[:3], 8, collate, range(3),
                                        drop_last=False)]
    assert [len(b) for b in tiny] == [3]
    assert list(prefetch_batches(data[:3], 8, collate, range(3))) == []


def test_sh_basis_and_prt():
    from rgbd_pifuhd_tpu.data.render import (
        sh_basis, sample_sphere_directions, compute_prt, rotate_sh_coeffs)
    from rgbd_pifuhd_tpu.recon.mesh import compute_vertex_normals

    rng = np.random.default_rng(0)
    dirs = sample_sphere_directions(32, rng)  # 1024 stratified dirs
    B = sh_basis(dirs, order=2)
    assert B.shape == (1024, 9)
    # orthonormality: (4pi/N) * B^T B ~ I (Monte-Carlo tolerance)
    gram = B.T @ B * (4 * np.pi / len(dirs))
    np.testing.assert_allclose(gram, np.eye(9), atol=0.06)

    # SH rotation preserves function values: f(R^-1 d) = (R.coeffs).basis(d)
    coeffs = rng.standard_normal(9)
    R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])  # 90deg about z
    rotated = rotate_sh_coeffs(coeffs, R)
    d = dirs[:5]
    f_rot = sh_basis(d, 2) @ rotated
    f_orig = sh_basis(d @ R, 2) @ coeffs   # f(R^-1 d) with row-vec convention
    np.testing.assert_allclose(f_rot, f_orig, atol=1e-6)

    # PRT on a sphere: unoccluded, transport ~ clamped cosine
    v, f = make_icosphere(1, 1.0)
    n = compute_vertex_normals(v, f.astype(np.int32))
    prt = compute_prt(v, f, n, order=2, n_dirs=6)
    assert prt.shape == (len(v), 9)
    # ambient coefficient positive everywhere (Y00 > 0, cos-weighted)
    assert (prt[:, 0] > 0).all()


def _checker_quad(tmp_path, tex_size=64, checks=8):
    """Textured unit quad OBJ + MTL + checkerboard PNG on disk."""
    import cv2

    tex = np.zeros((tex_size, tex_size, 3), np.uint8)
    c = tex_size // checks
    for i in range(checks):
        for j in range(checks):
            if (i + j) % 2 == 0:
                tex[i * c:(i + 1) * c, j * c:(j + 1) * c] = (255, 0, 0)
            else:
                tex[i * c:(i + 1) * c, j * c:(j + 1) * c] = (0, 0, 255)
    cv2.imwrite(str(tmp_path / "checker.png"), tex[:, :, ::-1])
    (tmp_path / "quad.mtl").write_text(
        "newmtl skin\nKd 0.5 0.5 0.5\nmap_Kd checker.png\n")
    (tmp_path / "quad.obj").write_text(
        "mtllib quad.mtl\n"
        "v -1 -1 0\nv 1 -1 0\nv 1 1 0\nv -1 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "usemtl skin\n"
        "f 1/1 2/2 3/3 4/4\n")
    return str(tmp_path / "quad.obj")


def test_load_obj_mtl_spaced_filenames(tmp_path):
    """mtllib/map_Kd filenames may contain spaces (common in scanned
    assets); the loader must take the rest of the line, not the last
    whitespace token."""
    import shutil
    from rgbd_pifuhd_tpu.recon.mesh import load_obj_mtl

    _checker_quad(tmp_path)
    shutil.move(str(tmp_path / "checker.png"),
                str(tmp_path / "skin texture.png"))
    (tmp_path / "my materials.mtl").write_text(
        "newmtl skin\nKd 0.5 0.5 0.5\nmap_Kd skin texture.png\n")
    (tmp_path / "spaced.obj").write_text(
        "mtllib my materials.mtl\n"
        "v -1 -1 0\nv 1 -1 0\nv 1 1 0\nv -1 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "usemtl skin\n"
        "f 1/1 2/2 3/3 4/4\n")
    mesh = load_obj_mtl(str(tmp_path / "spaced.obj"))
    assert mesh["texture"] is not None and mesh["texture"].shape[2] == 3
    np.testing.assert_allclose(mesh["face_albedo"], 0.5)


def test_load_obj_mtl_and_textured_raster(tmp_path):
    """UV/MTL loading + albedo-texture sampling (reference
    traindata/lib/renderer/mesh.py:110-221 + prt.fs AlbedoMap): a
    checkerboard-textured quad renders per-pixel checker colors, identical
    between the C++ kernel and the NumPy fallback."""
    from rgbd_pifuhd_tpu.recon.mesh import load_obj_mtl
    from rgbd_pifuhd_tpu.data.synthetic import (
        rasterize_ortho, _rasterize_ortho_numpy)

    mesh = load_obj_mtl(_checker_quad(tmp_path))
    assert mesh["verts"].shape == (4, 3)
    assert mesh["faces"].shape == (2, 3)  # quad fan-triangulated
    assert mesh["uvs"].shape == (4, 2)
    assert (mesh["face_uvs"] >= 0).all()
    assert mesh["texture"] is not None and mesh["texture"].shape[2] == 3
    np.testing.assert_allclose(mesh["face_albedo"], 0.5)

    size = 96
    calib = np.eye(4)
    calib[2, 2] = -1.0  # keep +z toward the camera
    kw = dict(uvs=mesh["uvs"], face_uvs=mesh["face_uvs"],
              texture=mesh["texture"], face_albedo=mesh["face_albedo"])
    a = rasterize_ortho(mesh["verts"], mesh["faces"], size, calib, **kw)
    b = _rasterize_ortho_numpy(mesh["verts"], mesh["faces"], size, calib,
                               **kw)
    m = a["mask"] & b["mask"]
    assert m.sum() > size * size * 0.8  # quad covers the frame
    np.testing.assert_allclose(a["rgb"][m], b["rgb"][m], atol=2e-5)

    # per-pixel checker: flat normal => constant shade; red/blue regions
    rgb = a["rgb"]
    # pixel at uv ~ (0.06, 0.06) -> texture row ~bottom (v=0 is bottom,
    # image row th-1): checker cell (7, 0) -> (7+0) odd -> blue
    y_lo = int(0.03 * (size - 1))
    x_lo = int(0.03 * (size - 1))
    px_lo = rgb[y_lo, x_lo]
    assert px_lo[2] > px_lo[0] * 3, px_lo  # blue >> red
    # one checker cell over in x -> red
    x_next = int((0.03 + 1.0 / 8) * (size - 1))
    px_next = rgb[y_lo, x_next]
    assert px_next[0] > px_next[2] * 3, px_next  # red >> blue

    # untextured faces fall back to per-face Kd
    mesh2 = dict(mesh)
    mesh2["face_uvs"] = np.full_like(mesh["face_uvs"], -1)
    c = rasterize_ortho(mesh["verts"], mesh["faces"], size, calib,
                        uvs=mesh["uvs"], face_uvs=mesh2["face_uvs"],
                        texture=mesh["texture"],
                        face_albedo=mesh["face_albedo"])
    mm = c["mask"]
    flat = c["rgb"][mm]
    assert np.allclose(flat[:, 0], flat[:, 1], atol=1e-6)  # gray Kd


def test_render_subject_textured_obj(tmp_path):
    """The offline render driver on a textured OBJ writes textured RENDER/
    images (reference render_data.py + prt.fs albedo sampling): the
    checkerboard shows up as distinct red and blue pixel populations."""
    import cv2
    from rgbd_pifuhd_tpu.data.render_dataset import render_subject

    obj = _checker_quad(tmp_path)
    root = str(tmp_path / "out")
    n = render_subject(root, "quad", obj, size=96, load_size=96,
                       yaw_step=180)
    assert n == 2
    img = cv2.imread(os.path.join(root, "RENDER", "quad", "0_0_00.jpg"))
    assert img is not None
    rgb = img[:, :, ::-1].astype(np.float64)
    mask = cv2.imread(os.path.join(root, "MASK", "quad", "0_0_00.png"),
                      cv2.IMREAD_GRAYSCALE) > 127
    sel = rgb[mask]
    reddish = (sel[:, 0] > sel[:, 2] * 2).mean()
    bluish = (sel[:, 2] > sel[:, 0] * 2).mean()
    assert reddish > 0.2 and bluish > 0.2, (reddish, bluish)
