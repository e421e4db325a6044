#!/bin/bash
# Train all trainable models (reference parity: /root/reference/train_all.sh).

OUT_BASE=${1:-"./train_out"}
shift || true

enable_wandb=""

# robust_mvd model (the paper recipe: batch 4, 600k iterations):
python train.py --training_type mvd --output ${OUT_BASE}/robust_mvd \
    --batch_size 4 --max_iterations 600000 \
    --model robust_mvd --inputs poses intrinsics \
    --optimizer adam --lr 1e-4 --grad_clip_max_norm 5 --scheduler flownet_scheduler \
    --loss robust_mvd_loss \
    --dataset staticthings3d.robust_mvd.mvd --dataset blendedmvs.robust_mvd.mvd \
    --augmentations_per_dataset robust_mvd_augmentations_staticthings3d \
    --augmentations_per_dataset robust_mvd_augmentations_blendedmvs \
    --batch_augmentations robust_mvd_batch_augmentations \
    --data_parallel --seed 42 ${enable_wandb}
