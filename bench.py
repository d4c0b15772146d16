"""Benchmark: end-to-end coarse+fine mesh reconstruction on one TPU chip.

Primary metric (BASELINE.json): seconds per mesh at 512^3 coarse+fine.
vs_baseline is computed against the driver-set north-star of 2.0 s/mesh —
value < 1.0 means faster than the target.

This is ONE CONTINUOUS gen_mesh() call — encode, sparse two-phase 512^3
grid evaluation, device->host sparse transfer, sparse-direct marching
cubes, fd-normal vertex coloring, OBJ write — not stitched components.

The surface is a TRAINED FLAGSHIP-class model's own field, reconstructed
end-to-end with no blend: the full 384.6M-param checkpoint
(scripts/train_bench_flagship.py) when cached, else the COMMITTED
flagship-lite (assets/bench_flagship_lite — identical encoders+MLP
chains, so identical field-phase work; normal nets width-scaled ngf16).
Only when neither exists does the bench TRAIN the full flagship
in-process (reduced steps, stage-level resume), and only if that fails
does it fall back to the round-3 scheme — untrained flagship compute
blended 1e-6 over the committed trained-tiny field (assets/bench_tiny)
or, without any checkpoint, an analytic capsule; the emitted "surface"
field says which path ran.

Also reported: pipelined multi-subject throughput (gen_mesh_many overlaps
host marching with the next subject's device evaluation) and raw grid-query
points/sec/chip.

Prints ONE JSON line.
"""

import json
import os
import time

import numpy as np

# Transient-error retry lives in the package (utils/retry.py); surface
# loaders live in scripts/bench_surfaces.py.  Keep the historical names —
# scripts (field_quality_study) and docs refer to bench._*_trained_field.
from rgbd_pifuhd_tpu.utils.retry import (  # noqa: E402
    is_transient as _is_transient,
    run_with_retry,
)

_REPO = os.path.dirname(os.path.abspath(__file__))


def _surfaces():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_surfaces", os.path.join(_REPO, "scripts",
                                       "bench_surfaces.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _flagship_trained_field(repo: str):
    return _surfaces().flagship_trained_field(repo)


def _tiny_trained_field(repo: str):
    return _surfaces().tiny_trained_field(repo)


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
        params, opt_model, data0, surface_label = flag
        cfg_g, cfg_l = opt_model.netG, opt_model.netMR  # bf16 embedded
        model = MultiResPIFu(cfg=cfg_l, cfg_global=cfg_g)
        img_l, img_g = data0["img"], data0["img_512"]
        calib = data0["calib"]
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
    # capture the HEADLINE subject's octree diagnostics NOW — the
    # multi-subject section below runs random-noise images whose fields
    # escalate far harder, and last_grid_diag is overwritten per call
    grid_diag = dict(recon.last_grid_diag or {})
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
        "grid_diag": grid_diag,
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


# ---- supervision: rgbd_pifuhd_tpu.utils.watchdog owns the machinery
# (tunnel probes, silence/deadline/hard-cap kill rules, retries) so a
# regression in this measurement script can never take the supervisor
# down with it.  These shims keep the historical bench-level API that
# scripts and tests call.

def _tunnel_alive(timeout_s: float = 150.0) -> bool:
    from rgbd_pifuhd_tpu.utils import watchdog
    return watchdog.tunnel_alive(timeout_s)


def _wait_for_tunnel(budget_s: float, probe_timeout_s: float = 150.0,
                     sleep_s: float = 180.0) -> None:
    from rgbd_pifuhd_tpu.utils import watchdog
    watchdog.wait_for_tunnel(budget_s, probe_timeout_s, sleep_s)


def _run_watchdog(cmd=None, retry_sleep=30.0, probe=None):
    """Supervise a child command (default: this bench) — see
    rgbd_pifuhd_tpu/utils/watchdog.py for the kill rules and their field
    history.  ``probe`` defaults to True only for the real bench child
    (cmd=None), which talks to the tunnel; explicit-cmd callers that do
    too (train_bench_flagship --supervised) pass probe=True."""
    import sys
    from rgbd_pifuhd_tpu.utils import watchdog

    if probe is None:
        probe = cmd is None
    if cmd is None:
        cmd = [sys.executable, os.path.abspath(__file__)]
    watchdog.run_watchdog(cmd, retry_sleep=retry_sleep, probe=probe)


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD") == "1":
        _run_inner()
    else:
        _run_watchdog()
