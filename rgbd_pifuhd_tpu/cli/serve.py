"""Long-lived serving entry point (beyond-reference capability).

The reference reconstructs via one-shot batch scripts (run_recon.py:1-38
loads weights, loops subjects, exits); a production deployment wants a
RESIDENT process: weights load once, the XLA executables compile once
(and survive restarts via the persistent compile cache,
utils/jax_cache), and every request pays only evaluation time.

Protocol — one request per stdin line:

    <dataroot>              reconstruct every subject in the directory
    <dataroot>::<stem>      only the subject named <stem>
    quit                    exit cleanly

Requests use the InferenceDataset conventions (``<stem>.png`` +
``<stem>_rect.txt`` + ``depth/depth_<stem>.png`` — readData.py parity).
One JSON line per produced mesh on stdout:

    {"name": ..., "mesh": "<path>", "verts": N, "secs": S}

a ``{"ready": true}`` line once warm, and per failed request a
``{"error": ..., "request": ...}`` line (the server keeps running — a
bad request must not take down the process).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _serve_loop(recon, opt, out_dir: str, requests, emit):
    """Request loop, separated from process wiring for tests."""
    from ..data.readdata import InferenceDataset

    ext = getattr(opt, "mesh_format", "obj")
    for line in requests:
        req = line.strip()
        if not req:
            continue
        if req == "quit":
            break
        root, _, stem = req.partition("::")
        try:
            dataset = InferenceDataset(root, opt.load_size)
            idxs = [i for i, (_, _, name) in enumerate(dataset.items)
                    if not stem or name == stem]
            if not idxs:
                raise FileNotFoundError(
                    f"no subject{' ' + stem if stem else 's'} under {root}")

            def load(i):
                data = dict(dataset[i])
                if data["img_512"].ndim == 3:
                    data["img_512"] = data["img_512"][None]
                return data

            def path_for(data):
                return os.path.join(
                    out_dir, f"result_{data['name']}_{opt.resolution}.{ext}")

            if len(idxs) > 1:
                # multi-subject request: two-slot pipeline (subject i's
                # host marching/coloring/IO overlaps subject i+1's device
                # evaluation — same as cli/run_recon's batch branch)
                named: list[tuple[str, str]] = []

                def path_for_and_log(data):
                    p = path_for(data)
                    named.append((data["name"], p))
                    return p

                results = recon.gen_mesh_many(
                    (load(i) for i in idxs), path_for_and_log,
                    use_color=opt.use_color, resolution=opt.resolution)
                for (name, p), r in zip(named, results):
                    emit({"name": name, "mesh": p,
                          "verts": int(len(r["verts"])),
                          "secs": round(r["secs"], 3)})
            else:
                data = load(idxs[0])
                save_path = path_for(data)
                t0 = time.time()
                if opt.use_color == 0:
                    r = recon.gen_mesh(data, save_path, opt.resolution)
                else:
                    r = recon.gen_mesh_img_color(
                        data, save_path, opt.resolution,
                        cleanup=opt.use_color == 2)
                emit({"name": data["name"], "mesh": save_path,
                      "verts": int(len(r["verts"])),
                      "secs": round(time.time() - t0, 3)})
        except Exception as e:  # noqa: BLE001 — a request must not kill
            emit({"error": f"{type(e).__name__}: {e}", "request": req})


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)

    from ..utils.options import parse_options
    opt = parse_options(argv)

    from ..utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()  # restarts skip the tunnel compiles

    import jax
    from ..models.multires import MultiResPIFu
    from ..parallel import make_device_mesh
    from ..recon.pipeline import Reconstructor
    from ..utils import checkpoint as ckpt

    path = opt.load_netMR_checkpoint_path or ckpt.latest_path(
        opt.checkpoints_path, opt.name)
    if not os.path.exists(path):
        raise SystemExit(f"checkpoint not found: {path}")
    state = ckpt.load_checkpoint(path)
    opt_model, _ = ckpt.restore_options(opt, state)

    model = MultiResPIFu(cfg=opt_model.netMR, cfg_global=opt_model.netG)
    variables = state["params"]
    if state.get("torch_import"):
        # reference .pth checkpoint: widen 3-ch netF/netB stems etc.
        from ..utils.torch_import import reconcile_with_model
        variables = reconcile_with_model(variables, model)
    # multi-chip host: shard the per-point inference pipeline (same
    # auto-detection convention as run_train / run_recon)
    mesh = make_device_mesh() if jax.device_count() > 1 else None
    recon = Reconstructor(model, variables, opt_model, mesh=mesh)
    out_dir = os.path.join(opt.results_path, opt.name, "serve")
    os.makedirs(out_dir, exist_ok=True)
    if opt.use_color not in (0, 1, 2):
        raise SystemExit(f"unknown use_color {opt.use_color}")

    def emit(obj):
        print(json.dumps(obj), flush=True)

    emit({"ready": True, "checkpoint": path, "out_dir": out_dir})
    _serve_loop(recon, opt, out_dir, sys.stdin, emit)


if __name__ == "__main__":
    main()
