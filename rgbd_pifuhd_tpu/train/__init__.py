"""Training drivers (layer L5 of SURVEY.md).

trainers.py — optimizer factories and jitted train steps for:
  - fine (MultiResPIFu) training          (reference train.py:62-247)
  - coarse (CoarsePIFu) occupancy pretrain (pretrain_netG.py:231-344)
  - front/back normal-net pretrain         (pretrain_netG.py:68-229)
  - the alternating curriculum             (altertrain.py:11-38)
"""

from .trainers import (
    make_optimizer,
    make_lr_schedule,
    make_fine_train_step,
    make_coarse_train_step,
    make_normal_train_step,
    shard_train_step,
)
