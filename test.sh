#!/usr/bin/env bash
# Flag-for-flag mirror of the reference recipe (RDFC-GAN/test.sh).
# Please modify the settings as you see fit
python test.py \
    --dataset nyuv2 \
    --data_root ./datasets/nyuv2 \
    --model_cfg_path ./configs/rdf_cycle_patchgan_config.yaml \
    --work_dir ./work_dir/rdfc_gan_test \
    --load_from ./work_dir/rdfc_gan_training/best.ckpt \
    --gpus 0 \
    --batch_size 1 \
    --out_height 256 \
    --out_width 256 \
    "${@:1}"
