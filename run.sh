#!/bin/sh
# FedFR training, reference run.sh configuration (40 clients, sphere64,
# CosFace, joint public-data optimization with BCE branch + contrastive).
python3 train.py --pretrained_root './pretrain' --network 'sphnet' \
  --output_dir './ckpt/FedFR' --loss 'CosFace' \
  --batch_size 64 --num_client 40 --client_sampled_ratio 1.0 --lr 0.001 \
  --total_round 20 --local_epoch 10 \
  --rec_root "${FEDFR_DATA:-./data/ms1m_split}" \
  --val_root "${FEDFR_VAL:-./data/val}" \
  --local_rec "${FEDFR_DATA:-./data/ms1m_split}/local_veri_4000" \
  --fedface --add_pretrained_data --combine_dataset --contrastive_bb \
  --return_all --BCE_local --adaptive_local_epoch
