"""Benchmark: end-to-end coarse+fine mesh reconstruction on one TPU chip.

Primary metric (BASELINE.json): seconds per mesh at 512^3 coarse+fine.
vs_baseline is computed against the driver-set north-star of 2.0 s/mesh —
value < 1.0 means faster than the target.

This is ONE CONTINUOUS gen_mesh() call — encode, sparse two-phase 512^3
grid evaluation, device->host sparse transfer, sparse-direct marching
cubes, fd-normal vertex coloring, OBJ write — not stitched components.

The surface is the TRAINED FLAGSHIP model's own field: the checkpoint
from scripts/train_bench_flagship.py (384.6M params) reconstructs
end-to-end with no blend; when the checkpoint is absent the bench TRAINS
it in-process first (reduced steps, stage-level resume).  Only if that
fails does it fall back to the round-3 scheme — untrained flagship
compute blended 1e-6 over the committed trained-tiny field
(assets/bench_tiny) or, without any checkpoint, an analytic capsule; the
emitted "surface" field says which path ran.

Also reported: pipelined multi-subject throughput (gen_mesh_many overlaps
host marching with the next subject's device evaluation) and raw grid-query
points/sec/chip.

Prints ONE JSON line.
"""

import json
import os
import time

import numpy as np

# Transient tunnel/backend failure signatures: the remote-compile link can
# drop mid-request (BENCH_r02 died in jax.jit(model.init) on
# "read body: response body closed before all bytes were read") — such
# errors are environmental, not code faults, and the run must retry.
_TRANSIENT = ("remote_compile", "response body", "INTERNAL", "UNAVAILABLE",
              "DEADLINE_EXCEEDED", "Connection reset", "Socket closed")


def _is_transient(e: BaseException) -> bool:
    s = f"{type(e).__name__}: {e}"
    return any(t in s for t in _TRANSIENT)


def run_with_retry(fn, attempts: int = 3, label: str = ""):
    """Retry ``fn`` on transient backend/tunnel errors with a short pause."""
    for k in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — filtered by _is_transient
            if k + 1 >= attempts or not _is_transient(e):
                raise
            import sys
            print(f"[bench] transient backend error in {label or 'step'} "
                  f"(attempt {k + 1}/{attempts}): {e}", file=sys.stderr)
            time.sleep(5.0 * (k + 1))


def _flagship_trained_field(repo: str):
    """Load (or regenerate) the trained FLAGSHIP checkpoint.

    Returns ``(params, opt_model, data)`` — trained flagship params (f32 on
    device), the checkpoint's embedded Options, and the capsule subject's
    data dict at flagship load sizes — or None when no checkpoint exists
    and in-bench regeneration is disabled/fails.

    The checkpoint (~770 MB f16, scripts/train_bench_flagship.py) is too
    large to commit; it lives in ``~/.cache/rgbd_pifuhd_tpu/flagship``.
    When absent, the bench TRAINS it in-process at reduced step counts
    (BENCH_TRAIN_FLAGSHIP=0 disables) — data and params stay device-
    resident during training, so the slow tunnel link is not on the
    training path.
    """
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "train_bench_flagship",
        os.path.join(repo, "scripts", "train_bench_flagship.py"))
    tbf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tbf)

    ckpt_path = os.environ.get(
        "RGBD_PIFUHD_FLAGSHIP_CKPT",
        os.path.join(tbf.DEFAULT_OUT, "ckpt"))
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    dataroot = os.path.join(base, "rgbd_flagship_data")
    if not os.path.exists(ckpt_path):
        if os.environ.get("BENCH_TRAIN_FLAGSHIP", "1") != "1":
            return None
        import sys
        print("[bench] no flagship checkpoint: training in-bench "
              "(reduced steps)", file=sys.stderr)
        try:
            ckpt_path = tbf.train_flagship(
                dataroot, os.path.dirname(ckpt_path) or ".",
                steps_nml=200, steps_coarse=800, steps_fine=800,
                log_every=100)
        except Exception as e:  # noqa: BLE001 — fall back to tiny blend
            if _is_transient(e):
                raise
            print(f"[bench] in-bench flagship training failed: {e}",
                  file=sys.stderr)
            return None

    import jax
    import jax.numpy as jnp
    from rgbd_pifuhd_tpu.data.datasets import TrainDataset
    from rgbd_pifuhd_tpu.utils import checkpoint as ckpt_mod
    from rgbd_pifuhd_tpu.utils.options import Options

    import sys
    state = ckpt_mod.load_checkpoint(ckpt_path)
    opt_model = Options.from_dict(state["opt"])
    # Upload f16 (half the bytes over the tunnel), cast to f32 on device —
    # CHUNKED with a forced drain + heartbeat every ~64 MB: the one-shot
    # tree upload is a multi-minute silent window during which a tunnel
    # flap looks identical to normal progress (observed 2026-08-19: an
    # upload stalled at ~2 s CPU / 18 min wall); with heartbeats the
    # watchdog's silence rule kills a real stall in minutes instead.
    total_mb = sum(getattr(x, "nbytes", 0)
                   for x in jax.tree.leaves(state["params"])) / 1e6
    print(f"[bench] uploading flagship checkpoint ({total_mb:.0f} MB f16 "
          "over the tunnel — minutes)", file=sys.stderr)
    leaves, treedef = jax.tree.flatten(state["params"])
    up, acc, done_mb = [], 0.0, 0.0
    for x in leaves:
        d = jnp.asarray(x)
        if getattr(x, "dtype", None) == np.float16:
            d = d.astype(jnp.float32)
        up.append(d)
        acc += getattr(x, "nbytes", 0)
        if acc > 64e6 and d.size:
            float(d.ravel()[0])          # drain the async upload queue
            done_mb += acc / 1e6
            acc = 0.0
            print(f"[bench] ... {done_mb:.0f}/{total_mb:.0f} MB uploaded",
                  file=sys.stderr)
    params = jax.tree.unflatten(treedef, up)

    tbf.ensure_flagship_dataset(dataroot)
    import dataclasses
    ds = TrainDataset(dataclasses.replace(opt_model, dataroot=dataroot),
                      load_mesh=False, seed=0)
    idx = next(i for i in range(len(ds))
               if "capsule" in os.path.basename(ds.img_files[i]))
    item = ds[idx]
    data = {"img": jnp.asarray(item["img"]),
            "img_512": jnp.asarray(item["img_512"])[None],
            "calib": jnp.asarray(item["calib"], jnp.float32)}
    return params, opt_model, data


def _tiny_trained_field(repo: str):
    """Load the committed trained-tiny checkpoint and the capsule subject.

    Returns ``(tiny_occ, data)`` — a world-space occupancy closure over the
    TRAINED tiny two-level model (scripts/train_bench_tiny.py) plus the
    flagship-resolution data dict of the same synthetic capsule subject —
    or None when the checkpoint is absent (analytic-capsule fallback).
    Both views share the subject's world frame, so the trained field and
    the flagship lattice align exactly.
    """
    ckpt_path = os.path.join(repo, "assets", "bench_tiny", "ckpt")
    if not os.path.exists(ckpt_path):
        return None
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "train_bench_tiny",
        os.path.join(repo, "scripts", "train_bench_tiny.py"))
    tbt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tbt)

    import jax.numpy as jnp
    from rgbd_pifuhd_tpu.data.datasets import TrainDataset
    from rgbd_pifuhd_tpu.data.synthetic import generate_synthetic_dataset
    from rgbd_pifuhd_tpu.models import MultiResPIFu
    from rgbd_pifuhd_tpu.utils import checkpoint as ckpt_mod
    from rgbd_pifuhd_tpu.utils.options import Options

    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    tiny_root = tbt.ensure_tiny_dataset(
        os.path.join(base, "rgbd_bench_tiny_data"))
    import dataclasses
    state = ckpt_mod.load_checkpoint(ckpt_path)
    t_opt = Options.from_dict(state["opt"])
    # bf16 activations for the tiny field's inference (same as the
    # flagship path; the 0.5 level set is insensitive at this precision)
    cfg_mr = dataclasses.replace(t_opt.netMR, compute_dtype="bfloat16")
    cfg_g = dataclasses.replace(t_opt.netG, compute_dtype="bfloat16")
    tiny_model = MultiResPIFu(cfg=cfg_mr, cfg_global=cfg_g)
    import jax
    import numpy as _np
    tiny_params = jax.tree.map(  # stored float16 -> compute float32
        lambda x: _np.asarray(x, _np.float32)
        if getattr(x, "dtype", None) == _np.float16 else x,
        state["params"])
    item = TrainDataset(tbt.tiny_options(tiny_root), load_mesh=False,
                        seed=0)[0]
    timg = jnp.asarray(item["img_512"])[None]
    tcalib = jnp.asarray(item["calib"], jnp.float32)
    tg = tiny_model.apply(tiny_params, timg, last_only=True,
                          method=MultiResPIFu.filter_global)
    tl = tiny_model.apply(tiny_params, timg[None], tg, last_only=True,
                          method=MultiResPIFu.filter_local)

    # The trained field is only meaningful inside its training sampling
    # box (TRAIN_B_MIN/B_MAX — outside it supervision is zero and a
    # single-view PIFu extrudes along z); the reference reconstructs
    # inside the same box (EvalDataset B_MIN/B_MAX, reconstruction
    # create_grid), so the bench windows the field identically.
    bmin = jnp.asarray(item["b_min"], jnp.float32)
    bmax = jnp.asarray(item["b_max"], jnp.float32)

    def tiny_occ(world_pts):
        out = tiny_model.apply(
            tiny_params, tl, tg, world_pts[None, None],
            tcalib[None, None], tcalib[None],
            method=MultiResPIFu.query)
        inside = jnp.all((world_pts >= bmin) & (world_pts <= bmax),
                         axis=-1)
        return jnp.where(inside, out.preds[0, :, 0], 0.0)

    # flagship-resolution images of the SAME subject (1024^2 render: the
    # capsule fills the NDC box like a real full-frame subject)
    flag_root = os.path.join(base, "rgbd_bench_flag_data")
    if not os.path.isdir(os.path.join(flag_root, "RENDER", "capsule")):
        generate_synthetic_dataset(flag_root, subjects=("capsule",),
                                   size=1024, load_size=1024, seed=0)
    fopt = Options(dataroot=flag_root, load_size=1024, load_size_big=1024,
                   load_size_local=512, num_sample_inout=8, sigma=8.0)
    fitem = TrainDataset(fopt, load_mesh=False, seed=0)[0]
    data = {"img": jnp.asarray(fitem["img"]),
            "img_512": jnp.asarray(fitem["img_512"])[None],
            "calib": jnp.asarray(fitem["calib"], jnp.float32)}
    return tiny_occ, data, (cfg_mr, cfg_g)


def main():
    from rgbd_pifuhd_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()  # second process skips the tunnel compiles

    import jax
    import jax.numpy as jnp
    from rgbd_pifuhd_tpu.models import MultiResPIFu
    from rgbd_pifuhd_tpu.recon.pipeline import Reconstructor
    from rgbd_pifuhd_tpu.utils.options import Options
    from __graft_entry__ import _configs

    import dataclasses

    resolution = 512
    repo = os.path.dirname(os.path.abspath(__file__))
    rng = np.random.default_rng(0)
    f32 = np.float32

    # ---- preferred surface: the TRAINED FLAGSHIP model's own field
    # (scripts/train_bench_flagship.py) — gen_mesh runs it end-to-end
    # with no blend.  Falls back to the round-3 scheme (untrained
    # flagship compute blended 1e-6 over the trained-tiny field /
    # analytic capsule) when no flagship checkpoint can be produced.
    flag = run_with_retry(lambda: _flagship_trained_field(repo),
                          label="flagship field setup")
    tiny = None
    if flag is not None:
        params, opt_model, data0 = flag
        cfg_g, cfg_l = opt_model.netG, opt_model.netMR  # bf16 embedded
        model = MultiResPIFu(cfg=cfg_l, cfg_global=cfg_g)
        img_l, img_g = data0["img"], data0["img_512"]
        calib = data0["calib"]
        surface_label = "trained flagship field"
    else:
        cfg_g, cfg_l, _, _ = _configs(tiny=False)
        # bf16 activations for the inference path (params stay f32)
        cfg_g = dataclasses.replace(cfg_g, compute_dtype="bfloat16")
        cfg_l = dataclasses.replace(cfg_l, compute_dtype="bfloat16")
        model = MultiResPIFu(cfg=cfg_l, cfg_global=cfg_g)

        tiny = run_with_retry(lambda: _tiny_trained_field(repo),
                              label="trained-tiny field setup")
        if tiny is not None:
            tiny_occ, data0, (t_opt_netmr, t_opt_netg) = tiny
            img_l, img_g = data0["img"], data0["img_512"]
            calib = data0["calib"]
        else:
            img_g = jnp.asarray(
                rng.standard_normal((1, 512, 512, 6)).astype(f32))
            img_l = jnp.asarray(
                rng.standard_normal((1, 1024, 1024, 6)).astype(f32))
            calib = jnp.eye(4, dtype=jnp.float32)

        params = run_with_retry(
            lambda: jax.jit(model.init)(
                jax.random.PRNGKey(0), img_l[None], img_g,
                jnp.zeros((1, 1, 8, 3), f32), calib[None, None],
                calib[None], jnp.zeros((1, 1, 8, 1), f32),
            ),
            label="model.init")
        surface_label = ("trained-tiny two-level field (assets/bench_tiny)"
                         if tiny is not None
                         else "analytic capsule (fallback)")

    def capsule_occ(pts):
        """Human-scale analytic surface (vertical capsule, NDC coords) —
        fallback when the trained-tiny checkpoint is absent."""
        dz = jnp.clip(jnp.abs(pts[:, 2]) - 0.5, 0.0, None)
        d = jnp.sqrt(pts[:, 0] ** 2 + pts[:, 1] ** 2 + dz ** 2)
        return jax.nn.sigmoid((0.36 - d) * 170.0)

    class BenchReconstructor(Reconstructor):
        """Round-3 fallback: flagship query blended (1e-6) with a stand-in
        surface field — FULL flagship compute runs per query point (the
        blend is not DCE-able), while the iso-surface comes from the
        TRAINED tiny two-level model's field (assets/bench_tiny, world
        coords shared with the flagship calib) or the analytic capsule."""

        def __init__(self, model, params, opt):
            super().__init__(model, params, opt)
            inner = self._query
            surface_occ = tiny_occ if tiny is not None else capsule_occ

            def blended(world_pts, *args):
                return (surface_occ(world_pts)
                        + 1e-6 * (inner(world_pts, *args) - 0.5))

            self._query = blended

    opt = Options(resolution=resolution, use_octree=True)
    recon = (Reconstructor(model, params, opt) if flag is not None
             else BenchReconstructor(model, params, opt))
    data = {"img": img_l, "img_512": img_g, "calib": calib}

    # RAM-backed output dir: measures the pipeline, not the sandbox disk
    out_dir = ("/dev/shm/rgbd_pifuhd_bench" if os.path.isdir("/dev/shm")
               else "/tmp/rgbd_pifuhd_bench")
    os.makedirs(out_dir, exist_ok=True)
    obj_path = os.path.join(out_dir, "bench.obj")

    # ---- warmup: first pass compiles everything; then keep running until
    # two consecutive passes agree within 5% (sandbox caches / tunnel
    # connection pools warm over several passes — BENCH_r03's timed runs
    # were still warming at run 7), capped at 6 passes total.
    import sys
    prev = None
    for widx in range(6):
        t0 = time.time()
        r = run_with_retry(lambda: recon.gen_mesh(data, obj_path, resolution),
                           label=f"warmup gen_mesh {widx + 1}")
        dt = time.time() - t0
        print(f"[bench] warmup pass {widx + 1}: {dt:.2f}s", file=sys.stderr)
        if prev is not None and widx >= 1 and \
                abs(dt - prev) <= 0.05 * min(dt, prev):
            break
        prev = dt

    # ---- headline + opt-in output paths, sampled ROUND-ROBIN so all
    # three see the same machine-state distribution (BENCH_r03 sampled
    # ply/serving best-of-3 after the headline's best-of-8, which made
    # the strictly-cheaper serving path read slower than plain PLY).
    # The sandbox host CPU and tunnel are throttled erratically
    # (identical runs vary >2x), so each path reports the min of its 8
    # samples (interference removal; every phase of the best run really
    # executed back-to-back) with the median alongside as the robust
    # statistic.  Selection rule: min of N=8, fixed from round 3 on
    # (rounds 1-2 used best-of-5).
    ply_path = os.path.join(out_dir, "bench.ply")
    serving_path = os.path.join(out_dir, "bench_serving.ply")
    opt_serving = dataclasses.replace(opt, normal_mode="mesh")
    times, phases = [], []
    ply_times, serving_times = [], []
    for _ in range(8):
        t0 = time.time()
        r = recon.gen_mesh(data, obj_path, resolution)
        times.append(time.time() - t0)
        phases.append(r["phases"])
        # opt-in: same gen_mesh, binary-PLY save path (near-memcpy write)
        t0 = time.time()
        recon.gen_mesh(data, ply_path, resolution)
        ply_times.append(time.time() - t0)
        # opt-in serving path: geometric mesh normals (zero device
        # color work) + binary PLY; normal_mode is read at call time so
        # flipping opt reuses every compiled computation.  NOTE: "zero
        # device work" is not "free" — mesh normals are computed on the
        # HOST (recon/mesh.compute_vertex_normals over every face), so on
        # this 1-core sandbox the path can read SLOWER than device
        # fd-normals; it wins on multi-core serving hosts where the
        # device is the contended resource
        recon.opt = opt_serving
        t0 = time.time()
        recon.gen_mesh(data, serving_path, resolution)
        serving_times.append(time.time() - t0)
        recon.opt = opt
        print(f"[bench] timed round {len(times)}/8: obj {times[-1]:.2f}s "
              f"ply {ply_times[-1]:.2f}s serving {serving_times[-1]:.2f}s",
              file=sys.stderr)
    best = int(np.argmin(times))
    secs = float(times[best])
    ply_secs = float(min(ply_times))
    serving_secs = float(min(serving_times))

    # ---- phase breakdown (separately timed; NOT the headline number)
    # NOTE: block_until_ready does NOT synchronize on the tunneled axon
    # backend; every phase timing ends in a scalar readback instead.
    l_feats, g_feats = recon.encode(data["img"], data["img_512"])
    float(l_feats.im_feats.sum())        # warm the sum-readback compile
    t0 = time.time()
    l_feats, g_feats = recon.encode(data["img"], data["img_512"])
    float(l_feats.im_feats.sum())
    t_enc = time.time() - t0
    t0 = time.time()
    field = recon.evaluate_field(l_feats, g_feats, calib, resolution)
    t_field = time.time() - t0            # device eval + sparse transfer
    # query points actually evaluated inside the jitted evaluator(s),
    # computed from the path taken (three- vs two-level octree) with the
    # same chunk paddings the kernels use — including any auto-escalated
    # budgets (recon._esc_budgets)
    n1 = resolution // 8 + 1
    n_corner = -(-n1 ** 3 // 1024) * 1024         # padded corner lattice
    esc = recon._esc_budgets.get(resolution, {})
    K1 = esc.get("cells") or opt.num_refine_cells
    if getattr(opt, "octree_levels", 3) == 3:
        K2 = esc.get("subcells") or opt.num_refine_subcells
        c1 = min(8192, K1)
        c2 = min(4096, K2)
        n_eval_pts = (n_corner
                      + (-(-K1 // c1) * c1) * 27   # stride-4 probes
                      + (-(-K2 // c2) * c2) * 64)  # dense 4^3 blocks
    else:
        n_eval_pts = n_corner + K1 * 512
    t0 = time.time()
    verts_idx, faces = recon.extract_mesh(
        field, resolution, algorithm=recon._marching_algo())
    t_march = time.time() - t0            # sparse-direct marching (same
    # algorithm the headline gen_mesh runs — opt.marching_algo)
    # device->host transfer: every array of the field tuple except the
    # final host-derived scan-cell origins
    xfer_mb = sum(np.asarray(a).nbytes for a in field[:-1]) / 1e6

    # ---- multi-subject throughput: serial vs two-slot pipelined,
    # measured BACK-TO-BACK on the same machine state so the comparison
    # is honest (the sandbox throttles erratically; ordering artifacts
    # previously made the pipeline look like a pessimization)
    datas = []
    for k in range(3):
        rk = np.random.default_rng(k + 1)
        datas.append({
            "img": jnp.asarray(
                rk.standard_normal((1, 1024, 1024, 6)).astype(f32)),
            "img_512": jnp.asarray(
                rk.standard_normal((1, 512, 512, 6)).astype(f32)),
            "calib": calib,
        })
    paths = [os.path.join(out_dir, f"pipe{k}.obj") for k in range(3)]
    # three rounds with alternating order (SP, PS, SP), best of each:
    # the sandbox speeds up monotonically as caches warm (see runs_s),
    # so a fixed ordering hands the later — faster — slots to one side;
    # with SP/PS/SP the two mins land on adjacent late slots (5 and 6)
    def run_serial():
        t0 = time.time()
        for d, p in zip(datas, paths):
            recon.gen_mesh(d, p, resolution)
        return (time.time() - t0) / 3.0

    def run_piped():
        t0 = time.time()
        recon.gen_mesh_many(datas, paths, use_color=0,
                            resolution=resolution)
        return (time.time() - t0) / 3.0

    serial3 = piped = float("inf")
    for ridx, swap in enumerate((False, True, False)):
        a, b = (run_piped, run_serial) if swap else (run_serial, run_piped)
        ta, tb = a(), b()
        ts, tp = (tb, ta) if swap else (ta, tb)
        serial3 = min(serial3, ts)
        piped = min(piped, tp)
        print(f"[bench] multi-subject round {ridx + 1}/3: "
              f"serial {ts:.2f}s piped {tp:.2f}s", file=sys.stderr)
    # On a 1-core host gen_mesh_many auto-falls-back to the serial path,
    # so BOTH labels above sample the SAME code path and any split between
    # them is throttle noise attributed to different names (BENCH_r02's
    # "pessimization" artifact).  Pool the samples in that case and say so.
    try:
        pipeline_engaged = len(os.sched_getaffinity(0)) > 1
    except (AttributeError, OSError):
        pipeline_engaged = (os.cpu_count() or 1) > 1
    if not pipeline_engaged:
        serial3 = piped = min(serial3, piped)

    # ---- grid-query throughput: points evaluated inside the two-phase
    # jit divided by its wall time (includes the sparse transfer, so this
    # is conservative).  Per-call standalone timing over the tunnel is
    # dominated by dispatch/readback RTT and block_until_ready does not
    # synchronize on this backend, so the in-pipeline number is the
    # honest one.
    pps = n_eval_pts / t_field

    # ---- flops-counted MFU per device phase (VERDICT r3 task 2).
    # Encode: XLA's own HLO flop count of the two encoder jits (lowered
    # client-side, no execution).  Field eval: analytic per-point MLP
    # MACs (utils/flops.py) x points actually evaluated — the MLP chain
    # is ~all the field-phase device flops (feature sampling is gathers).
    # MFU denominators use the chip's published bf16 peak; t_field
    # includes the sparse device->host transfer, so field MFU is
    # conservative.
    from rgbd_pifuhd_tpu.utils.flops import (
        device_peak_flops, lowered_flops, two_level_query_flops_per_point)
    f_enc_g = lowered_flops(recon._filter_global, params, img_g)
    f_enc_l = lowered_flops(recon._filter_local, params, img_l[None],
                            g_feats)
    flops_encode = (f_enc_g + f_enc_l) if (f_enc_g and f_enc_l) else None
    per_pt = two_level_query_flops_per_point(cfg_l, cfg_g)
    if flag is None and tiny is not None:
        # the blended fallback also runs the trained-tiny model per point
        per_pt += two_level_query_flops_per_point(t_opt_netmr, t_opt_netg)
    flops_field = per_pt * n_eval_pts
    peak = device_peak_flops(jax.devices()[0])
    mfu = {
        "achieved_tflops_encode": (round(flops_encode / t_enc / 1e12, 2)
                                   if flops_encode else None),
        "achieved_tflops_field": round(flops_field / t_field / 1e12, 2),
        "mfu_encode": (round(flops_encode / t_enc / peak, 4)
                       if flops_encode and peak else None),
        "mfu_field": (round(flops_field / t_field / peak, 4)
                      if peak else None),
        "peak_bf16_tflops": round(peak / 1e12, 1) if peak else None,
    }

    print(json.dumps({
        "metric": "secs_per_mesh_512_coarse_fine",
        "value": round(secs, 4),
        "unit": "s",
        "vs_baseline": round(secs / 2.0, 4),
        "runs_s": [round(t, 3) for t in times],
        "n_runs": len(times),
        "median_s": round(float(np.median(times)), 4),
        "best_run_phases": phases[best],
        "r1_composition_s": round(t_enc + t_field + t_march, 4),
        "serial_secs_per_mesh": round(serial3, 4),
        "pipelined_secs_per_mesh": round(piped, 4),
        "pipeline_engaged": pipeline_engaged,
        "ply_secs_per_mesh": round(ply_secs, 4),
        "ply_median_s": round(float(np.median(ply_times)), 4),
        "serving_secs_per_mesh": round(serving_secs, 4),
        "serving_median_s": round(float(np.median(serving_times)), 4),
        "grid_diag": recon.last_grid_diag,
        "encode_s": round(t_enc, 4),
        "field_eval_and_transfer_s": round(t_field, 4),
        "sparse_marching_s": round(t_march, 4),
        "transfer_mb": round(xfer_mb, 2),
        "grid_query_pts_per_sec_per_chip": round(pps),
        **mfu,
        "mesh_verts": int(len(r["verts"])),
        "surface": surface_label,
        "device": str(jax.devices()[0]),
        "note": ("headline = one continuous gen_mesh (encode + sparse "
                 "512^3 eval + sparse-direct marching + fd-normal coloring "
                 "+ OBJ write). Selection rule: min of N=8 timed passes "
                 "(N fixed since round 3; rounds 1-2 used best-of-5), "
                 "median_s reported alongside; warmup loops until two "
                 "consecutive passes agree within 5% (max 6). headline/"
                 "ply/serving are sampled ROUND-ROBIN (8 samples each) so "
                 "their mins are comparable. serial_secs_per_mesh and "
                 "pipelined_secs_per_mesh are measured back-to-back in "
                 "order-swapped rounds on identical machine state; on "
                 "this 1-core host gen_mesh_many auto-falls-back to the "
                 "serial path (a worker thread cannot overlap CPU-bound "
                 "marching with one core — measured +0.3-0.5 s/mesh of "
                 "pure contention), so the two numbers measure the same "
                 "code path here; the two-slot worker pipeline engages "
                 "on multi-core hosts. mfu_* = counted flops / time / "
                 "published bf16 peak; t_field includes the sparse "
                 "device->host transfer (conservative). Device reached "
                 "through a slow dev tunnel and a single throttled host "
                 "core, so transfers and host stages are overstated vs "
                 "any production host"),
    }))


def _run_inner():
    # one whole-run retry: a transient tunnel drop anywhere must not turn
    # the driver-recorded benchmark red (BENCH_r02 was rc=1 for exactly
    # this; the per-step retries above catch the common cases first)
    try:
        main()
    except Exception as e:  # noqa: BLE001
        if not _is_transient(e):
            raise
        import sys
        print(f"[bench] transient backend error, restarting run: {e}",
              file=sys.stderr)
        time.sleep(10.0)
        main()


def _tunnel_alive(timeout_s: float = 150.0) -> bool:
    """True iff a tiny device readback completes within ``timeout_s``.

    The observed failure mode (2026-08-18, again 2026-08-19) is the tunnel
    HANGING outright for hours — even a 128x128 matmul readback blocks
    indefinitely.  A hung attempt burns its whole 2400 s deadline learning
    nothing, so the watchdog probes first with a disposable subprocess
    (SIGKILL always lands; an in-process probe could not be cancelled).
    """
    import subprocess
    import sys

    code = ("import jax, jax.numpy as jnp; "
            "x = jnp.ones((128, 128)); print(float((x @ x).sum()))")
    child = subprocess.Popen(
        [sys.executable, "-c", code], stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL, start_new_session=True)
    try:
        return child.wait(timeout=timeout_s) == 0
    except subprocess.TimeoutExpired:
        import signal
        try:
            os.killpg(child.pid, signal.SIGKILL)
        except OSError:
            child.kill()
        child.wait()
        return False


def _wait_for_tunnel(budget_s: float, probe_timeout_s: float = 150.0,
                     sleep_s: float = 180.0) -> None:
    """Block until the tunnel answers a probe, up to ``budget_s``.

    On budget exhaustion the watchdog proceeds anyway — the per-attempt
    deadline still bounds a hung run; this just stops a known-hung tunnel
    from burning both attempts back-to-back.
    """
    import sys

    t0 = time.time()
    while not _tunnel_alive(probe_timeout_s):
        waited = time.time() - t0
        if waited + sleep_s > budget_s:
            print(f"[bench] tunnel probe still hanging after {waited:.0f}s;"
                  " proceeding under the attempt deadline", file=sys.stderr)
            return
        print(f"[bench] tunnel hung (tiny readback > {probe_timeout_s:.0f}"
              f"s); retrying probe in {sleep_s:.0f}s", file=sys.stderr)
        time.sleep(sleep_s)


def _default_deadline_s() -> float:
    """Per-attempt watchdog deadline: 2400 s covers a bench run against an
    existing flagship checkpoint; when the checkpoint must be TRAINED
    in-bench (~1800 s on this chip before the first timed pass), a 2400 s
    attempt is guaranteed to die mid-bench and waste its training on the
    retry, so the deadline grows to 4200 s.  BENCH_DEADLINE_S overrides."""
    ckpt = os.environ.get(
        "RGBD_PIFUHD_FLAGSHIP_CKPT",
        os.path.expanduser(  # keep in sync with train_bench_flagship.DEFAULT_OUT
            "~/.cache/rgbd_pifuhd_tpu/flagship/ckpt"))
    trains = (not os.path.exists(ckpt)
              and os.environ.get("BENCH_TRAIN_FLAGSHIP", "1") == "1")
    return 4200.0 if trains else 2400.0


def _pump(stream, sink, stamp):
    """Forward child output line-by-line, stamping last-activity time."""
    for line in iter(stream.readline, ""):
        sink.write(line)
        sink.flush()
        stamp[0] = time.time()
    stream.close()


def _run_watchdog(cmd=None, retry_sleep=30.0, probe=None):
    """Run the bench in a child process under PROGRESS-AWARE supervision.

    Retries (error-filtered) catch tunnel failures that RAISE; they cannot
    catch the tunnel simply HANGING — a blocked jax call never returns to
    Python, so no signal handler or timeout fires in-process (observed
    2026-08-18: a 256x256 matmul readback blocked >240 s).

    A fixed total deadline turned out to be the WRONG kill rule on its
    own: on 2026-08-19 the tunnel flapped on a ~10-60 min cadence, and a
    connection ESTABLISHED before a flap keeps working — the deadline
    killed a healthy attempt mid-run, and the replacement process then
    blocked on the flapped tunnel.  The child's stdout/stderr are
    therefore piped through (the driver still reads the JSON line from
    parent stdout) and the kill rule is SILENCE: no output line for
    ``BENCH_SILENCE_S`` (default min(900, deadline)) means a real hang —
    the child emits heartbeats at every phase.  The total deadline
    (``BENCH_DEADLINE_S``; auto 2400 s / 4200 s-when-training) remains as
    an absolute backstop.  On kill the whole process group dies and the
    run is retried (3 attempts; training resumes from stage
    checkpoints, a trained checkpoint is reused).
    ``cmd`` overrides the child command (tests; tunnel-touching callers
    like train_bench_flagship --supervised pass ``probe=True`` to keep
    the per-attempt probe gate they would otherwise lose).
    """
    import subprocess
    import sys
    import threading

    probe_budget = float(os.environ.get("BENCH_PROBE_WAIT_S", "1500"))
    env = dict(os.environ, BENCH_CHILD="1", PYTHONUNBUFFERED="1")
    if probe is None:
        probe = cmd is None  # the real bench child talks to the tunnel
    if cmd is None:
        cmd = [sys.executable, os.path.abspath(__file__)]
    attempts = 3
    for attempt in range(1, attempts + 1):
        if probe and probe_budget > 0:
            _wait_for_tunnel(probe_budget)
        # re-evaluated per attempt: attempt 1 may have finished training
        # and saved the checkpoint before dying mid-bench — attempt 2
        # then needs only the tighter no-training deadline
        deadline = float(os.environ.get("BENCH_DEADLINE_S", "0")) \
            or (_default_deadline_s() if probe else 2400.0)
        silence = float(os.environ.get("BENCH_SILENCE_S", "0")) \
            or min(900.0, deadline)
        # A PROGRESSING run outlives the deadline (2026-08-20: a crawling
        # tunnel stretched the timed rounds to ~45 s each and the fixed
        # deadline killed the run seconds before its final JSON; the
        # retry then re-uploaded 769 MB over the same crawling tunnel).
        # Past the deadline the kill needs BOTH stale output (>300 s) —
        # fresh heartbeats mean the run is slow, not hung — and the hard
        # cap bounds even a heartbeat-emitting run absolutely.
        stale = min(300.0, silence)
        hard_cap = float(os.environ.get("BENCH_HARD_CAP_S", "0")) \
            or 3.0 * deadline
        child = subprocess.Popen(cmd, env=env, start_new_session=True,
                                 stdout=subprocess.PIPE,
                                 stderr=subprocess.PIPE, text=True)
        stamp = [time.time()]
        t0 = time.time()
        pumps = [
            threading.Thread(target=_pump, daemon=True,
                             args=(child.stdout, sys.stdout, stamp)),
            threading.Thread(target=_pump, daemon=True,
                             args=(child.stderr, sys.stderr, stamp)),
        ]
        for t in pumps:
            t.start()
        timed_out = None
        while child.poll() is None:
            now = time.time()
            if now - stamp[0] > silence:
                timed_out = f"silent for {silence:.0f}s"
                break
            if now - t0 > deadline and now - stamp[0] > stale:
                timed_out = (f"no result after {deadline:.0f}s with output "
                             f"stale for {now - stamp[0]:.0f}s")
                break
            if now - t0 > hard_cap:
                timed_out = f"no result after hard cap {hard_cap:.0f}s"
                break
            time.sleep(1.0)
        if timed_out is not None:
            import signal
            print(f"[bench] {timed_out} "
                  f"(attempt {attempt}/{attempts}): backend hang — "
                  f"killing run",
                  file=sys.stderr)
            try:
                os.killpg(child.pid, signal.SIGKILL)
            except OSError:
                child.kill()
            child.wait()
            for t in pumps:
                t.join(timeout=10.0)
            if attempt == attempts:
                raise SystemExit(
                    "bench: backend hung through all attempts") from None
            time.sleep(retry_sleep)
            continue
        rc = child.wait()
        for t in pumps:
            t.join(timeout=10.0)
        raise SystemExit(rc)


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD") == "1":
        _run_inner()
    else:
        _run_watchdog()
