"""CLI entry points (layer L6 of SURVEY.md).

python -m rgbd_pifuhd_tpu.cli.run_train   — training (fine / coarse /
                                            normals / alternating)
python -m rgbd_pifuhd_tpu.cli.run_recon   — mesh reconstruction
python -m rgbd_pifuhd_tpu.cli.plot_error  — loss-history plots
python -m rgbd_pifuhd_tpu.cli.gen_data    — synthetic dataset generation
"""
