"""Reconstruction CLI (reference run_recon.py / reconstruction.recon).

Checkpoint-restore semantics match the reference (reconstruction.py:252-269):
the checkpoint's embedded options override the CLI except dataroot /
resolution / results_path / loadSize.

``--demo-sphere`` runs hermetically: generates a synthetic subject, uses a
freshly-initialized model, and reconstructs — the smoke-test path.
``--demo-trained`` is the hermetic demo with a REAL field: it loads the
committed trained-tiny two-level checkpoint (assets/bench_tiny, trained by
scripts/train_bench_tiny.py), regenerates its synthetic capsule subject,
and reconstructs an actual surface — checkpoint restore + recon
end-to-end with no external data.

use_color: 0 = fd-normal colors (gen_mesh), 1 = image colors
(gen_mesh_imgColor), 2 = image colors + largest-component cleanup + back
inpainting (gen_mesh_imgColor_plus).
"""

from __future__ import annotations

import os
import sys



def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    demo = False
    if "--demo-sphere" in argv:
        demo = True
        argv.remove("--demo-sphere")
    demo_trained = False
    if "--demo-trained" in argv:
        demo_trained = True
        argv.remove("--demo-trained")

    from ..utils.options import parse_options
    opt = parse_options(argv)

    from ..utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()  # repeat runs skip the 20-120s compiles

    import jax
    import jax.numpy as jnp
    from ..models.multires import MultiResPIFu
    from ..recon.pipeline import Reconstructor
    from ..utils import checkpoint as ckpt
    from ..data.readdata import InferenceDataset

    if demo_trained:
        from ..data.synthetic import generate_synthetic_dataset
        from ..data.datasets import TrainDataset
        from ..utils.options import Options
        import dataclasses
        import numpy as np

        path = opt.load_netMR_checkpoint_path or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "assets", "bench_tiny", "ckpt")
        if not os.path.exists(path):
            raise SystemExit(
                f"trained demo checkpoint not found: {path} "
                "(generate with scripts/train_bench_tiny.py)")
        state = ckpt.load_checkpoint(path)
        # demo uses the checkpoint's FULL embedded opts (the tiny configs
        # + its 128px load sizes), not the restore-4-fields CLI merge —
        # the subject is regenerated to match the checkpoint exactly
        opt_model = Options.from_dict(state["opt"])
        params = jax.tree.map(  # f16-stored asset -> f32 compute
            lambda x: np.asarray(x, np.float32)
            if getattr(x, "dtype", None) == np.float16 else x,
            state["params"])
        root = os.path.join(opt.results_path, "_demo_data_trained")
        if not os.path.isdir(os.path.join(root, "RENDER", "capsule")):
            generate_synthetic_dataset(
                root, subjects=("capsule",), size=opt_model.load_size,
                load_size=opt_model.load_size, seed=0)
        dataset = TrainDataset(dataclasses.replace(opt_model, dataroot=root),
                               load_mesh=False, seed=0)
    elif demo:
        from ..data.synthetic import generate_synthetic_dataset
        from ..data.datasets import TrainDataset
        import dataclasses

        root = os.path.join(opt.results_path, "_demo_data")
        if not os.path.isdir(os.path.join(root, "gen")):
            generate_synthetic_dataset(root, subjects=("sphere",), size=256,
                                       load_size=opt.load_size)
        dopt = dataclasses.replace(
            opt, dataroot=root, load_size_big=256, load_size_local=256)
        dataset = TrainDataset(dopt, load_mesh=False)
        params = None
        opt_model = opt
    else:
        path = opt.load_netMR_checkpoint_path or ckpt.latest_path(
            opt.checkpoints_path, opt.name)
        if not os.path.exists(path):
            raise SystemExit(f"checkpoint not found: {path}")
        state = ckpt.load_checkpoint(path)
        opt_model, _ = ckpt.restore_options(opt, state)
        params = state["params"]
        dataset = InferenceDataset(opt.dataroot, opt.load_size)

    model = MultiResPIFu(cfg=opt_model.netMR, cfg_global=opt_model.netG)

    if params is not None and not demo_trained and state.get("torch_import"):
        # reference .pth checkpoint: reconcile imported kernels against
        # this model's template (3->6-channel netF/netB stems widen)
        from ..utils.torch_import import reconcile_with_model
        params = reconcile_with_model(params, model)

    if params is None:  # demo: fresh init
        item = dataset[0]
        calib = jnp.asarray(item["calib"], jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(item["img"])[None],
            jnp.asarray(item["img_512"])[None]
            if item["img_512"].ndim == 3 else jnp.asarray(item["img_512"]),
            jnp.zeros((1, 1, 8, 3), jnp.float32), calib[None, None],
            calib[None], jnp.zeros((1, 1, 8, 1), jnp.float32),
        )

    # multi-chip host: shard the whole per-point inference pipeline
    # (grid query + vertex coloring) over the device mesh — same
    # auto-detection convention as run_train
    from ..parallel import make_device_mesh
    mesh = make_device_mesh() if jax.device_count() > 1 else None
    recon = Reconstructor(model, params, opt_model, mesh=mesh)
    out_dir = os.path.join(opt.results_path, opt.name, "recon")
    os.makedirs(out_dir, exist_ok=True)

    start = 0 if opt.start_id < 0 else opt.start_id
    end = min(len(dataset) if opt.end_id < 0 else opt.end_id, len(dataset))
    if opt.use_color not in (0, 1, 2):
        raise SystemExit(f"unknown use_color {opt.use_color}")

    def load(i):
        data = dict(dataset[i])
        if data["img_512"].ndim == 3:
            data["img_512"] = data["img_512"][None]
        return data

    def path_for(data):
        ext = getattr(opt, "mesh_format", "obj")
        return os.path.join(
            out_dir, f"result_{data['name']}_{opt.resolution}.{ext}")

    if opt.use_octree and end - start > 1:
        # two-slot pipeline: subject i's host marching/coloring/IO overlaps
        # subject i+1's device evaluation (see Reconstructor.gen_mesh_many).
        # Subjects are loaded lazily (generator) so host memory holds the
        # two in-flight subjects, not the whole dataset.
        paths: list[str] = []

        def iter_items():
            for i in range(start, end):
                yield load(i)

        def path_for_and_log(data):
            p = path_for(data)
            print(p)
            paths.append(p)
            return p

        results = recon.gen_mesh_many(iter_items(), path_for_and_log,
                                      use_color=opt.use_color,
                                      resolution=opt.resolution)
        for p, r in zip(paths, results):
            print(f"{p}: verts={len(r['verts'])} secs={r['secs']:.2f}")
    else:
        for i in range(start, end):
            data = load(i)
            save_path = path_for(data)
            print(save_path)
            if opt.use_color == 0:
                r = recon.gen_mesh(data, save_path, opt.resolution)
            else:
                r = recon.gen_mesh_img_color(data, save_path, opt.resolution,
                                             cleanup=opt.use_color == 2)
            print(f"  verts={len(r['verts'])} secs={r['secs']:.2f}")


if __name__ == "__main__":
    main()
