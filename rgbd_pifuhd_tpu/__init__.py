"""rgbd_pifuhd_tpu — TPU-native multi-level pixel-aligned implicit function
framework for RGB-D 3D human digitization.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
PyTorch reference `agnJason/RGB-D-PIFuHD` (PIFuHD extended to RGB-D input):

- pix2pixHD front/back normal-map generators
- two-level (coarse 512 / fine 1024) stacked-hourglass pixel-aligned encoders
- per-point occupancy MLPs conditioned on pixel-aligned features + depth
- fully on-device sharded 512^3 occupancy-grid evaluation (the reference's
  host-side octree, re-designed as coarse-to-fine compacted dense passes)
- marching cubes + mesh export, training/eval/recon drivers

Layout (mirrors SURVEY.md section 1 layer map, re-designed TPU-first):
    ops/       pure-function geometry, sampling, resize, loss primitives
    models/    flax modules: blocks, MLP, pix2pixHD zoo, coarse/fine PIFu
    recon/     grid evaluation, marching cubes, mesh IO, recon pipeline
    parallel/  device-mesh construction, sharded evaluators, dp training step
    data/      datasets, preprocessing, synthetic data, offline rendering
    train/     trainers (normal pretrain, coarse pretrain, fine, alternating)
    utils/     options/config system, checkpointing, logging/profiling
    cli/       run_train / run_recon entry points
    native/    C++ host kernels (marching cubes, obj IO) with Python fallback
"""

__version__ = "0.1.0"
