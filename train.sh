#!/usr/bin/env bash
# Flag-for-flag mirror of the reference recipe (RDFC-GAN/train.sh:2-12);
# `--gpus` is accepted for contract parity (device selection is JAX-managed).
# Please modify the settings as you see fit
python train.py \
    --dataset nyuv2 \
    --data_root ./datasets/nyuv2 \
    --batch_size 4 \
    --model_cfg_path ./configs/rdf_cycle_patchgan_config.yaml \
    --work_dir ./work_dir/rdfc_gan_training \
    --gpus 0 \
    --num_classes 14 \
    --label_wall 12 \
    --label_floor 5 \
    --label_ceiling 3 \
    "${@:1}"
