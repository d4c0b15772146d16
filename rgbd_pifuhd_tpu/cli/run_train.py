"""Training CLI (reference run_train.py / pretrain_netG / altertrain).

Examples:
    python -m rgbd_pifuhd_tpu.cli.run_train --dataroot ./traindata \
        --stage fine --num_epoch 1
    python -m rgbd_pifuhd_tpu.cli.run_train --stage coarse ...
    python -m rgbd_pifuhd_tpu.cli.run_train --stage normals ...
    python -m rgbd_pifuhd_tpu.cli.run_train --stage alternating ...

Multi-host: launch one process per host with
    --coordinator_address host0:1234 --num_processes N --process_id K
(or the RGBD_COORDINATOR / RGBD_NUM_PROCESSES / RGBD_PROCESS_ID env vars);
the device mesh then spans every chip of every host and the batch's 'data'
axis shards across DCN (parallel/distributed.py).
"""

from __future__ import annotations

import sys

from ..parallel import make_device_mesh
from ..train.loop import (
    pretrain_coarse,
    pretrain_normals,
    train_alternating,
    train_fine,
)
from ..utils.options import parse_options, print_options


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    stage = "fine"
    use_crop = False
    if "--stage" in argv:
        i = argv.index("--stage")
        stage = argv[i + 1]
        del argv[i:i + 2]
    if "--use_crop" in argv:
        use_crop = True
        argv.remove("--use_crop")
    dist_kw = {}
    for flag, key, cast in (("--coordinator_address", "coordinator_address",
                             str),
                            ("--num_processes", "num_processes", int),
                            ("--process_id", "process_id", int)):
        if flag in argv:
            i = argv.index(flag)
            dist_kw[key] = cast(argv[i + 1])
            del argv[i:i + 2]

    opt = parse_options(argv)

    # must run before any device computation (touches the backend)
    from ..parallel.distributed import initialize_distributed, is_primary
    initialize_distributed(**dist_kw)
    if is_primary():
        print_options(opt)

    from ..utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()  # repeat runs skip the 20-120s compiles

    import jax
    mesh = make_device_mesh() if jax.device_count() > 1 else None

    if stage == "fine":
        train_fine(opt, mesh=mesh, use_crop=use_crop)
    elif stage == "coarse":
        pretrain_coarse(opt, mesh=mesh)
    elif stage == "normals":
        pretrain_normals(opt, mesh=mesh)
    elif stage == "alternating":
        train_alternating(opt)
    elif stage == "eval":
        from ..train.loop import evaluate_checkpoints
        results = evaluate_checkpoints(opt)
        for epoch, err in results.items():
            print(f"epoch {epoch}: Err(occ:fine) = {err:.6f}")
    else:
        raise SystemExit(f"unknown --stage {stage!r}")


if __name__ == "__main__":
    main()
