#!/usr/bin/env bash
# Sen1Floods11 replication on TPU: Prithvi-V1-100M, bs=16, wd=0.1, cw=[1,3],
# 100 epochs. Mirrors the reference experiment
# (experiments_dir/train/flood_mapping/sen1floods_replica.sh) on the
# instageo_tpu CLI. Expects data/{train,val,test}.csv chip manifests and
# a local pretrained encoder at $PRITHVI_PRETRAINED_PATH.
set -euo pipefail
MODEL=${MODEL:-prithvi_eo_v1_100}
EXP_DIR=${EXP_DIR:-instageo_exp}
MEAN=${MEAN:-0.14245495,0.13921481,0.12434631,0.31420089,0.20743526,0.12046503}
STD=${STD:-0.04036231,0.04186983,0.05267646,0.0822221,0.06834774,0.05294205}

echo "Start Training..."
mkdir -p "$EXP_DIR"
python -m instageo_tpu.train.run --config-name=sen1floods11 \
    run_dir="$EXP_DIR" \
    root_dir='.' \
    "dataloader.mean=[${MEAN}]" \
    "dataloader.std=[${STD}]" \
    dataloader.no_data_value=0 \
    "dataloader.bands=[0,1,2,3,4,5]" \
    "train.class_weights=[1,3]" \
    model.freeze_backbone=False \
    train.weight_decay=0.1 \
    train.batch_size=16 \
    train.num_epochs=100 \
    model.model_name="$MODEL" \
    train_filepath='data/train.csv' \
    valid_filepath='data/val.csv' 2>&1 | tee "$EXP_DIR/train.log"

for split in val test; do
  echo "Evaluating ${split} split..."
  python -m instageo_tpu.train.run --config-path "$(pwd)/$EXP_DIR/.hydra" \
      --config-name=config \
      root_dir='.' \
      test_filepath="data/${split}.csv" \
      train.batch_size=64 \
      checkpoint_path="$EXP_DIR/instageo_best_checkpoint" \
      mode=eval 2>&1 | tee "$EXP_DIR/${split}.log"
done
