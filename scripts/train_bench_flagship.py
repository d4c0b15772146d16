"""Train the FLAGSHIP-config model whose field bench.py reconstructs.

Round 3's bench surface was a trained *tiny* model blended at 1e-6 under
untrained flagship compute.  This script closes that gap (VERDICT round 3
task 1): it trains the actual flagship architecture — 4-stack/256-ch
coarse encoder, full-res fine encoder, both pix2pixHD normal nets, 384.6M
params (__graft_entry__._configs(tiny=False)) — on the framework's own
synthetic multi-subject dataset with the reference's three-stage recipe:

1. pretrain netF/netB on GT normal maps (pretrain_netG.py:68-229; L1-only
   since no pretrained VGG16 exists in this environment — the measured
   better choice, see scripts/vgg_gap_study.py),
2. pretrain the coarse level (pretrain_netG.py:231-344) with the trained
   normal nets frozen (stop_gradient, PIFuNetwNML semantics),
3. train the fine level on 512^2 crop windows with the frozen coarse
   (train.py:159-204, use_crop).

The checkpoint (f16, ~770 MB — too large to commit) is written to
``~/.cache/rgbd_pifuhd_tpu/flagship/ckpt`` where bench.py looks for it;
bench.py regenerates it in-bench (fewer steps) when absent.

Run on the real TPU (~10-20 min including compiles):
    python scripts/train_bench_flagship.py [--steps-fine 1200] [--out DIR]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# One module owns the dataset recipe + configs shared between training
# here and inference in bench.py (same discipline as train_bench_tiny).
FLAG_DATA_KW = dict(subjects=("sphere", "capsule"), size=1024,
                    load_size=1024, seed=0)

DEFAULT_OUT = os.path.expanduser("~/.cache/rgbd_pifuhd_tpu/flagship")
# The committed flagship-LITE checkpoint (VERDICT r4 item 6): identical
# hourglass encoders and MLP chains to the flagship — so the field-phase
# per-point work the bench times is IDENTICAL — with the pix2pixHD normal
# nets width-scaled ngf 64->16 (same topology, 4 downsamplings / 9
# resblocks; 11.4M params each vs 182.5M).  42.6M params total ~= 85 MB
# f16: small enough to commit, which makes the bench's cold start a
# checkpoint load instead of a 30+ min in-bench training run.
DEFAULT_LITE_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "bench_flagship_lite")
LITE_NML_NGF = 16


def flagship_options(dataroot: str, lite: bool = False):
    """Flagship training Options: the graft-entry configs (bf16 compute)
    over 1024^2 renders, 512^2 global input, 4096 sample points.

    ``lite=True`` width-scales ONLY the normal nets (ngf 64->16, same
    topology); encoders and MLP chains stay flagship-exact.
    """
    from __graft_entry__ import _configs
    from rgbd_pifuhd_tpu.utils.options import Options

    cfg_g, cfg_l, _, _ = _configs(tiny=False)
    cfg_g = dataclasses.replace(cfg_g, compute_dtype="bfloat16")
    cfg_l = dataclasses.replace(cfg_l, compute_dtype="bfloat16")
    if lite:
        cfg_g = dataclasses.replace(cfg_g, nml_ngf=LITE_NML_NGF)
    return Options(dataroot=dataroot, load_size=1024, load_size_big=1024,
                   load_size_local=512, num_sample_inout=4096, sigma=8.0,
                   netG=cfg_g, netMR=cfg_l)


def ensure_flagship_dataset(root: str) -> str:
    from rgbd_pifuhd_tpu.data.synthetic import generate_synthetic_dataset
    if not os.path.isdir(os.path.join(
            root, "RENDER", FLAG_DATA_KW["subjects"][-1])):
        generate_synthetic_dataset(root, **FLAG_DATA_KW)
    return root


def _memoize_imread():
    """Cache cv2.imread by path for this process: the trainer re-reads the
    same 4 renders thousands of times through TrainDataset.__getitem__ on
    one throttled host core."""
    import cv2

    orig = cv2.imread
    if getattr(cv2.imread, "_flagship_memo", False):
        return
    cache: dict = {}

    def imread(path, *a):
        key = (path,) + a
        if key not in cache:
            cache[key] = orig(path, *a)
        v = cache[key]
        return None if v is None else v.copy()

    imread._flagship_memo = True
    cv2.imread = imread


# ---- stage-level resume -------------------------------------------------
# bench.py runs this trainer inside a 2400 s watchdog (bench._run_watchdog)
# that SIGKILLs a hung attempt and retries once.  Without resume points a
# kill mid-training loses everything and attempt 2 restarts from zero —
# likely dying the same way.  Each completed stage therefore persists a
# small f16 checkpoint next to the final one; a rerun with the SAME recipe
# (step counts / optimizer / lr / far_boost / seed, checked via a sidecar
# tag) skips completed stages.  Stage files are deleted after the final
# checkpoint lands.

def _stage_paths(out_dir: str):
    return (os.path.join(out_dir, "stage1_nml"),
            os.path.join(out_dir, "stage2_coarse"))


def _pull_f16(tree):
    """f32 leaves -> f16 ON DEVICE, then pull: halves the bytes crossing
    the slow tunnel link (same discipline as the final checkpoint save)."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda x: np.asarray(x.astype(jnp.float16))
        if getattr(x, "dtype", None) == jnp.float32 else np.asarray(x),
        tree)


def _push_f32(tree):
    """Upload f16 leaves as-is (half the tunnel bytes) and cast to f32 ON
    DEVICE; non-f16 leaves upload unchanged."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda x: jnp.asarray(x).astype(jnp.float32)
        if getattr(x, "dtype", None) == np.float16 else jnp.asarray(x),
        tree)


def _save_stage(path, tree, opt, tag):
    from rgbd_pifuhd_tpu.utils import checkpoint as ckpt

    os.makedirs(os.path.dirname(path), exist_ok=True)
    # heartbeats around the device->host pull: a full-flagship stage is
    # ~365 MB f16 over the slow tunnel (minutes of legitimate silence),
    # and the supervising watchdog kills on BENCH_SILENCE_S of quiet
    mb = sum(getattr(x, "nbytes", getattr(x, "size", 0) * 2)
             for x in __import__("jax").tree.leaves(tree)) / 2e6
    print(f"[stage] saving {os.path.basename(path)} (~{mb:.0f} MB f16 "
          "pull)", flush=True)
    # tag is written LAST (and removed first): a kill mid-save leaves a
    # tagless — hence ignored — stage file, never a validated corrupt one
    if os.path.exists(path + ".tag"):
        os.remove(path + ".tag")
    ckpt.save_checkpoint(path, _pull_f16(tree), opt)
    with open(path + ".tag", "w") as f:
        f.write(tag)
    print(f"[stage] saved {os.path.basename(path)}", flush=True)


def _load_stage(path, tag):
    """Return the stage tree (f32 on device) iff the stage file exists and
    was produced by the same recipe; None otherwise."""
    from rgbd_pifuhd_tpu.utils import checkpoint as ckpt

    try:
        if os.path.exists(path) and os.path.exists(path + ".tag"):
            with open(path + ".tag") as f:
                if f.read() == tag:
                    print(f"[stage] loading resume point "
                          f"{os.path.basename(path)} "
                          f"({os.path.getsize(path) / 1e6:.0f} MB upload)",
                          flush=True)
                    out = _push_f32(ckpt.load_checkpoint(path)["params"])
                    print(f"[stage] loaded {os.path.basename(path)}",
                          flush=True)
                    return out
    except Exception as e:  # noqa: BLE001 — a corrupt resume point (e.g.
        # killed mid-save) must mean "retrain the stage", never a crash
        print(f"[stage] ignoring unreadable resume point {path}: {e}",
              flush=True)
    return None


def _coarse_ambiguity(coarse, g_vars, img, calib_np) -> int:
    """Level-1 octree cells whose corner spread exceeds the reference's
    0.05 skip threshold (mesh_util.py:179), on the bench's own lattice.

    The 512^3 reconstruction's first octree level is a 64^3 cell grid
    whose corners form the 65^3 lattice of NDC [-1,1]^3 mapped through
    inv(calib).  Every cell counted here is a cell the evaluator MUST
    refine; when the count exceeds ``Options.num_refine_cells`` the
    bench auto-escalates its budgets 2-8x and secs/mesh doubles — so
    this number, not the loss, is the field-quality gate.
    """
    import jax
    import jax.numpy as jnp

    from rgbd_pifuhd_tpu.models import CoarsePIFu

    n = 65
    inv = np.linalg.inv(np.asarray(calib_np, np.float64))
    idx = np.stack(np.meshgrid(*([np.arange(n, dtype=np.float64)] * 3),
                               indexing="ij"), -1).reshape(-1, 3)
    world = ((idx * (2.0 / (n - 1)) - 1.0) @ inv[:3, :3].T
             + inv[:3, 3]).astype(np.float32)
    feats = coarse.apply(g_vars, img, method=CoarsePIFu.filter)

    @jax.jit
    def q(pts):
        out = coarse.apply(g_vars, feats, pts[None],
                           jnp.asarray(calib_np, jnp.float32)[None],
                           method=CoarsePIFu.query)
        return out.preds[-1, 0, :, 0]

    chunk = 65536
    pad = -(-len(world) // chunk) * chunk
    wp = np.pad(world, ((0, pad - len(world)), (0, 0)))
    occ = np.concatenate([
        np.asarray(q(jnp.asarray(wp[i:i + chunk])))
        for i in range(0, pad, chunk)])[:len(world)].reshape(n, n, n)
    corners = np.stack([occ[dx:dx + n - 1, dy:dy + n - 1, dz:dz + n - 1]
                        for dx in (0, 1) for dy in (0, 1)
                        for dz in (0, 1)])
    spread = corners.max(axis=0) - corners.min(axis=0)
    return int((spread > 0.05).sum())


def train_flagship(dataroot: str, out_dir: str, steps_nml: int = 300,
                   steps_coarse: int = 1200, steps_fine: int = 1200,
                   log_every: int = 50, seed: int = 0,
                   opt_name: str = "adam", lr: float = 3e-3,
                   far_boost: float = 2.0, lite: bool = False,
                   sharpen_target: int = 10000,
                   sharpen_max_steps: int = 0,
                   fine_anneal_steps: int = 0) -> str:
    """Three-stage flagship training; returns the checkpoint path.

    Loss readbacks happen every ``log_every`` steps only — each readback
    costs a ~20-40 ms tunnel round trip, and async dispatch keeps the
    device busy between them.

    ``opt_name``/``lr`` drive the occupancy stages (coarse + fine).  The
    reference's RMSprop 1e-3 (train.py:141) converges the LOSS here but
    leaves the FIELD fuzzy at this step budget: measured on a 65^3
    world lattice after 1200 coarse steps, rmsprop leaves ~164k/275k
    lattice values in (0.02, 0.98) and ~137k/262k cells with corner
    disagreement > 0.05 — 60% of empty space ambiguous, which makes every
    downstream octree (ours or the reference's mesh_util.py:179 rule)
    refine an order of magnitude more cells than the true surface needs.
    Adam 3e-3 (what train_bench_tiny uses) saturates the field in the
    same budget; see /tmp history in docs/PERFORMANCE.md.  The reference
    recipe remains available via ``--optimizer rmsprop --lr 1e-3``.

    ``far_boost`` appends ``far_boost * num_sample_inout`` extra PURE
    uniform box samples (exact containment labels) to every occupancy
    step.  The reference's balanced sampler (TrainDataset.py:98-159,
    mirrored in data/sampling.py) feeds only ~n/4 uniform points into a
    ~17n pool and then fills the n/2 outside quota mostly with
    near-surface jitter — ~3% of each step supervises far space.  A tiny
    model is forced decisive anyway; at 384M params the field stays
    ambiguous over ~25% of the reconstruction volume (measured adam
    3e-3 / 1200 steps: 75k/262k lattice cells with corner disagreement
    > 0.05 vs ~6k for a clean capsule field), and every downstream
    octree refines those cells.  Extra query points are nearly free on
    TPU next to the 1024^2 encoder pass (the MLP is ~1 MFLOP/point).
    """
    import jax
    import jax.numpy as jnp

    from rgbd_pifuhd_tpu.data.datasets import TrainDataset
    from rgbd_pifuhd_tpu.models import CoarsePIFu, MultiResPIFu
    from rgbd_pifuhd_tpu.models.pix2pix import GlobalGenerator
    from rgbd_pifuhd_tpu.train.trainers import (
        make_coarse_train_step, make_fine_train_step,
        make_normal_train_step, make_optimizer)
    from rgbd_pifuhd_tpu.utils import checkpoint as ckpt
    from rgbd_pifuhd_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    _memoize_imread()
    t_start = time.time()

    opt = flagship_options(ensure_flagship_dataset(dataroot), lite=lite)
    cfg_g = opt.netG
    ds = TrainDataset(opt, seed=seed)
    n_items = len(ds)
    assert n_items >= 1, f"empty dataset at {dataroot}"

    def log(stage, i, total, loss):
        print(f"[{stage} {i}/{total}] loss={loss:.4f} "
              f"(t+{time.time() - t_start:.0f}s)", flush=True)

    stage1_path, stage2_path = _stage_paths(out_dir)
    tag = json.dumps(
        dict(steps_nml=steps_nml, steps_coarse=steps_coarse,
             steps_fine=steps_fine, opt=opt_name, lr=lr,
             far_boost=far_boost, seed=seed, lite=lite,
             sharpen=[sharpen_target, sharpen_max_steps]), sort_keys=True)
    g_resume = _load_stage(stage2_path, tag)

    # ---- stage 1: normal nets on GT normal maps (L1-only)
    gen = GlobalGenerator(output_nc=3, ngf=cfg_g.nml_ngf,
                          n_downsampling=cfg_g.nml_n_downsampling,
                          n_blocks=cfg_g.nml_n_blocks)
    items = [ds[i] for i in range(n_items)]  # images fixed; crop/points not
    nml_params = None if g_resume is not None else _load_stage(
        stage1_path, tag)
    if g_resume is not None:
        print("[stage] resuming past stage 2 (coarse resume point found)",
              flush=True)
    elif nml_params is not None:
        print("[stage] resuming past stage 1 (normal-net resume point "
              "found)", flush=True)
    if g_resume is None and nml_params is None:
        nml_params = {}
        for net_name, target_key in (("netF", "imF"), ("netB", "imB")):
            # per-net resume point: a tunnel-flap kill between netF and
            # netB must not retrain netF (observed 2026-08-21: flap
            # windows can be shorter than the whole stage)
            net_path = f"{stage1_path}_{net_name}"
            prev = _load_stage(net_path, tag)
            if prev is not None:
                print(f"[stage] resuming {net_name} from its resume "
                      "point", flush=True)
                nml_params[net_name] = prev
                continue
            batches = [
                {"images": jnp.asarray(it["img"][0])[None],
                 "target": jnp.asarray(it[target_key])[None]}
                for it in items
            ]
            params = gen.init(jax.random.PRNGKey(seed),
                              batches[0]["images"])
            tx = make_optimizer("adam", 2e-4)
            opt_state = tx.init(params)
            step = jax.jit(make_normal_train_step(
                lambda p, x: gen.apply(p, x), tx, perceptual_fn=None))
            for i in range(steps_nml):
                params, opt_state, m = step(params, opt_state,
                                            batches[i % n_items])
                if i % log_every == 0 or i + 1 == steps_nml:
                    log(net_name, i, steps_nml, float(m["loss"]))
            nml_params[net_name] = params["params"]
            _save_stage(net_path, nml_params[net_name], opt, tag)
        # no combined stage-1 save: the per-net files cover resume and a
        # second 730 MB pull would double the stage's tunnel cost

    # Per-step host->device traffic must stay tiny: the tunnel link runs
    # ~16 MB/s, so images are uploaded ONCE per subject and stay device-
    # resident; each step uploads only fresh sample points/labels (~64 KB).
    from rgbd_pifuhd_tpu.data.datasets import _calib_from_param
    from rgbd_pifuhd_tpu.data.preprocessing import rect_to_ndc_transform
    from rgbd_pifuhd_tpu.data.sampling import sample_occupancy_points

    img_g = [jnp.asarray(it["img_512"])[None] for it in items]      # 512^2
    img_big = [jnp.asarray(it["img"]) for it in items]        # [1,1024^2,6]
    calib_g = [jnp.asarray(it["calib"], jnp.float32)[None] for it in items]
    geom = []  # (verts, faces, tester, calib, intr_local, extrinsic)
    for it in items:
        v, fc = ds.meshes[it["name"]]
        param = np.load(os.path.join(
            dataroot, "PARAM", it["name"], "0_0_00.npy"),
            allow_pickle=True).item()
        calib_np, extrinsic = _calib_from_param(param, opt.load_size)
        intr_local = calib_np @ np.linalg.inv(extrinsic)
        geom.append((v, fc, ds.testers[it["name"]], calib_np, intr_local,
                     extrinsic))
    # Per-STAGE sample streams: stage 3 must draw the same data whether
    # stage 2 ran in this process or was restored from a resume point (a
    # shared stream would have been advanced by stage 2's draws, so a
    # resumed run would silently train on different samples than an
    # uninterrupted one with the identical recipe tag).
    rng_coarse = np.random.default_rng(seed)
    rng_fine = np.random.default_rng(seed + 101)

    box_len = np.asarray(ds.b_max, np.float64) - np.asarray(
        ds.b_min, np.float64)
    n_far = int(round(far_boost * opt.num_sample_inout))

    def sample_batch(k: int, rng, far_mult: int = 1):
        v, fc, tester, *_ = geom[k]
        s, lbl = sample_occupancy_points(
            v, fc, opt.num_sample_inout, ds.b_min, ds.b_max, rng,
            sigma=opt.sigma, tester=tester)
        if n_far:
            u = (rng.uniform(size=(n_far * far_mult, 3)) * box_len
                 + ds.b_min).astype(np.float32)
            ul = tester.contains(u)[:, None].astype(np.float32)
            s = np.concatenate([s, u])
            lbl = np.concatenate([lbl, ul])
        return jnp.asarray(s), jnp.asarray(lbl)

    # ---- stage 2: coarse pretrain with frozen trained normal nets
    if g_resume is not None:
        g_vars = g_resume
    else:
        coarse = CoarsePIFu(cfg_g)
        s0, l0 = sample_batch(0, rng_coarse)
        g_vars = coarse.init(jax.random.PRNGKey(seed), img_g[0], s0[None],
                             calib_g[0], l0[None])
        g_params = dict(g_vars["params"])
        g_params["netF"] = nml_params["netF"]
        g_params["netB"] = nml_params["netB"]
        g_vars = {**g_vars, "params": g_params}
        tx = make_optimizer(opt_name, lr)
        g_state = tx.init(g_vars["params"])
        # donate variables+opt_state: at 384M params the old and new trees
        # must not coexist in HBM (adam doubles the moment memory vs
        # rmsprop)
        g_step = jax.jit(make_coarse_train_step(coarse, tx, gamma=0.5),
                         donate_argnums=(0, 1))
        for i in range(steps_coarse):
            k = i % n_items
            s, lbl = sample_batch(k, rng_coarse)
            batch = {"images": img_g[k], "points": s[None],
                     "calibs": calib_g[k], "labels": lbl[None]}
            g_vars, g_state, m = g_step(g_vars, g_state, batch)
            if i % log_every == 0 or i + 1 == steps_coarse:
                log("coarse", i, steps_coarse, float(m["loss"]))

        # --- outcome-targeted sharpening: loss convergence does NOT
        # guarantee a decisive field (2026-08-21: two same-recipe draws
        # landed at 17k and 75k ambiguous cells vs the 12288-cell bench
        # budget, doubling secs/mesh through budget escalation).  Keep
        # training in 400-step slabs until the bench subject's level-1
        # lattice fits the budget or the extension budget runs out.
        k_cap = next((i for i, it in enumerate(items)
                      if "capsule" in it["name"]), 0)
        cap_calib = np.asarray(calib_g[k_cap][0])
        n_amb = _coarse_ambiguity(coarse, g_vars, img_g[k_cap], cap_calib)
        extra = 0
        print(f"[sharpen] ambiguous cells after {steps_coarse} steps: "
              f"{n_amb} (target <= {sharpen_target})", flush=True)
        # Extension slabs are MEASURE-ONLY by default (sharpen_max_steps
        # = 0): measured 2026-08-21, +2400 annealed far-boosted slabs
        # improved this coarse-lattice count 66k -> 53k while the
        # EVALUATOR's level-1 full-query activity degraded 17k -> 81k
        # (4.7x) — the two metrics anti-correlated, and secs/mesh
        # tracks the evaluator's.  The count is logged as the field-
        # quality diagnostic; pass sharpen_max_steps > 0 to re-enable
        # the extension experiment.
        if n_amb > sharpen_target and sharpen_max_steps > 0:
            # extension slabs anneal: adam at the training lr bounces on
            # its noise floor (measured 56k -> 59k -> 53k ambiguous over
            # two same-lr slabs); fresh moments at lr/10 settle the far
            # field instead of re-stirring it
            tx_s = make_optimizer(opt_name, lr * 0.1)
            g_state = tx_s.init(g_vars["params"])
            g_step = jax.jit(make_coarse_train_step(coarse, tx_s,
                                                    gamma=0.5),
                             donate_argnums=(0, 1))
        while n_amb > sharpen_target and extra < sharpen_max_steps:
            for j in range(400):
                k = (steps_coarse + extra + j) % n_items
                # 3x far supervision: the slabs exist to pin FAR space,
                # and extra uniform labeled points are nearly free next
                # to the encoder pass
                s, lbl = sample_batch(k, rng_coarse, far_mult=3)
                batch = {"images": img_g[k], "points": s[None],
                         "calibs": calib_g[k], "labels": lbl[None]}
                g_vars, g_state, m = g_step(g_vars, g_state, batch)
            extra += 400
            n_amb = _coarse_ambiguity(coarse, g_vars, img_g[k_cap],
                                      cap_calib)
            print(f"[sharpen] +{extra} steps (lr/10, far x3): "
                  f"loss={float(m['loss']):.4f} "
                  f"ambiguous cells={n_amb}", flush=True)
        g_state = None  # free the coarse moments before stage 3 allocates
        _save_stage(stage2_path, g_vars, opt, tag)

    # ---- stage 3: fine training on 512^2 crops, frozen coarse.
    # The crop window rect=[256, U(10,512), 512, 512] (TrainDataset
    # use_crop, reference TrainDataset.py:223-237) is sliced ON DEVICE
    # out of the resident 1024^2 stack; its NDC transform folds into
    # calib_local on host exactly as the dataset does.
    model = MultiResPIFu(cfg=opt.netMR, cfg_global=cfg_g,
                         train_full_pifu=False)

    @jax.jit
    def crop512(im, y):
        return jax.lax.dynamic_slice(im, (0, y, 256, 0), (1, 512, 512, 6))

    def crop_batch(k: int, i: int):
        y = int(rng_fine.integers(10, 512))
        im_local = crop512(img_big[k], y)[None]       # [1, 1, 512, 512, 6]
        trans = rect_to_ndc_transform([256, y, 512, 512], 1024, 1024,
                                      flip_y=True)
        _, _, _, _, intr_local, extrinsic = geom[k]
        calib_local = (trans @ intr_local @ extrinsic).astype(np.float32)
        s, lbl = sample_batch(k, rng_fine)
        return {"images_local": im_local, "images_global": img_g[k],
                "points": s[None, None],
                "calib_local": jnp.asarray(calib_local)[None, None],
                "calib_global": calib_g[k], "labels": lbl[None, None]}

    b0 = crop_batch(0, 0)
    f_vars = model.init(
        jax.random.PRNGKey(seed + 1), b0["images_local"],
        b0["images_global"], b0["points"], b0["calib_local"],
        b0["calib_global"], b0["labels"])
    f_params = dict(f_vars["params"])
    f_params["netG"] = g_vars["params"]
    f_vars = {**f_vars, "params": f_params}
    # netG is frozen (stop_gradient) in stage 3: mask it out of the
    # optimizer so no moments are allocated for its 384M-param subtree
    # (with adam that alone is ~3 GB of HBM)
    import optax
    tx_f = optax.masked(make_optimizer(opt_name, lr),
                        {k: k != "netG" for k in f_params})
    f_state = tx_f.init(f_vars["params"])
    f_step = jax.jit(make_fine_train_step(model, tx_f),
                     donate_argnums=(0, 1))
    for i in range(steps_fine):
        f_vars, f_state, m = f_step(f_vars, f_state,
                                    crop_batch(i % n_items, i))
        if i % log_every == 0 or i + 1 == steps_fine:
            log("fine", i, steps_fine, float(m["loss"]))

    # OPT-IN annealed tail (fine_anneal_steps > 0; default off — it was
    # part of the checkpoint-B experiment whose evaluator-activity came
    # out 4.7x worse than the plain recipe's, see the sharpen note):
    # extra lr/10 steps with fresh moments on the fine stage.
    if fine_anneal_steps > 0:
        tx_fa = optax.masked(make_optimizer(opt_name, lr * 0.1),
                             {k: k != "netG" for k in f_params})
        f_state = tx_fa.init(f_vars["params"])
        f_step_a = jax.jit(make_fine_train_step(model, tx_fa),
                           donate_argnums=(0, 1))
        for i in range(fine_anneal_steps):
            f_vars, f_state, m = f_step_a(f_vars, f_state,
                                          crop_batch(i % n_items, i))
            if i % log_every == 0 or i + 1 == fine_anneal_steps:
                log("fine-anneal", i, fine_anneal_steps,
                    float(m["loss"]))

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "ckpt")
    f16 = _pull_f16(f_vars)
    ckpt.save_checkpoint(path, f16, opt,
                         epoch=steps_nml + steps_coarse + steps_fine)
    for p in (stage1_path, f"{stage1_path}_netF", f"{stage1_path}_netB",
              stage2_path):                     # resume points served their
        for q in (p, p + ".tag"):               # purpose; reclaim the cache
            if os.path.exists(q):
                os.remove(q)
    n_params = sum(x.size for x in jax.tree.leaves(f_vars))
    print(f"saved {path} ({n_params / 1e6:.1f}M params, "
          f"final fine loss {float(m['loss']):.4f}, "
          f"total {time.time() - t_start:.0f}s)", flush=True)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-nml", type=int, default=300)
    ap.add_argument("--steps-coarse", type=int, default=1200)
    ap.add_argument("--steps-fine", type=int, default=1200)
    ap.add_argument("--out", default=DEFAULT_OUT)
    ap.add_argument("--dataroot", default=(
        "/dev/shm/rgbd_flagship_data" if os.path.isdir("/dev/shm")
        else "/tmp/rgbd_flagship_data"))
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--optimizer", default="adam",
                    help="occupancy-stage optimizer (adam | rmsprop; "
                         "rmsprop 1e-3 = the reference recipe)")
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--far-boost", type=float, default=2.0,
                    help="extra pure-uniform labeled samples per step, as "
                         "a multiple of num_sample_inout (0 = reference "
                         "sampler only)")
    ap.add_argument("--lite", action="store_true",
                    help="train the flagship-LITE variant (normal nets "
                         "width-scaled ngf 64->16, encoders/MLPs "
                         "flagship-exact; 42.6M params ~= 85 MB f16 — "
                         "small enough to commit as the bench's "
                         "cold-start surface). Default --out becomes "
                         "assets/bench_flagship_lite")
    ap.add_argument("--supervised", action="store_true",
                    help="re-exec this training under bench.py's "
                         "progress-aware watchdog: probe-gate a hung "
                         "tunnel, SIGKILL on output silence, retry with "
                         "stage-level resume. Use on flaky device links "
                         "(a blocked jax call never returns to Python, so "
                         "no in-process timeout can catch a tunnel hang)")
    args = ap.parse_args()
    if args.lite and args.out == DEFAULT_OUT:
        args.out = DEFAULT_LITE_OUT
    if args.supervised:
        import bench  # repo root is on sys.path (top of this file)

        # training runs longer than a plain bench: silence-kill after
        # 600 s of no output (steps log every --log-every; the longest
        # single compile observed is ~120 s), absolute deadline 4200 s
        # per attempt at the full default step counts
        os.environ.setdefault("BENCH_DEADLINE_S", "4200")
        os.environ.setdefault("BENCH_SILENCE_S", "600")
        os.environ.setdefault("BENCH_PROBE_WAIT_S", "1800")
        # Re-build the child argv from PARSED args (not by filtering
        # sys.argv): argparse accepts prefix abbreviations like --super,
        # which a string filter would pass through to the child, causing
        # an endless nested-watchdog re-exec.
        cmd = [sys.executable, os.path.abspath(__file__),
               "--steps-nml", str(args.steps_nml),
               "--steps-coarse", str(args.steps_coarse),
               "--steps-fine", str(args.steps_fine),
               "--out", args.out,
               "--dataroot", args.dataroot,
               "--log-every", str(args.log_every),
               "--optimizer", args.optimizer,
               "--lr", str(args.lr),
               "--far-boost", str(args.far_boost)]
        if args.lite:
            cmd.append("--lite")
        # probe=True keeps the PER-ATTEMPT tunnel-probe gate: training
        # talks to the device tunnel on every attempt, and a retry after
        # a tunnel flap must wait for the tunnel to answer again.
        bench._run_watchdog(cmd=cmd, retry_sleep=60.0,
                            probe=True)  # raises SystemExit
    train_flagship(args.dataroot, args.out, args.steps_nml,
                   args.steps_coarse, args.steps_fine, args.log_every,
                   opt_name=args.optimizer, lr=args.lr,
                   far_boost=args.far_boost, lite=args.lite)


if __name__ == "__main__":
    main()
