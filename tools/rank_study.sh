#!/bin/bash
# MAE-vs-JEPA representation-ranking study on the TEXTURE synthetic dataset
# (VERDICT r3 #2). Run on the TPU (relay up) — matched pretraining budgets,
# then frozen-feature evals with floor/ceiling baselines:
#   raw pixels + random init (floor — near chance on texture data),
#   MAE / JEPA pretrained encoders (the ranking under test).
# Results + logs land in outputs/rank_study/.
set -u
cd "$(dirname "$0")/.."
OUT=outputs/rank_study
DATA=${SSRL_RANK_DATA:-/tmp/ssrl_texture_data}
EPOCHS=${SSRL_RANK_EPOCHS:-20}
UNLAB=${SSRL_RANK_UNLABELED:-30000}
mkdir -p "$OUT"
LOG="$OUT/study.log"
CFG="$OUT/study_cfg.yaml"

if [ ! -f "$DATA/stl10_binary/unlabeled_X.bin" ]; then
  echo "=== generating texture dataset ($UNLAB unlabeled) ===" >> "$LOG"
  python -m scripts.data --synthetic --signal texture --data_dir "$DATA" \
    --synthetic_train 5000 --synthetic_test 2000 \
    --synthetic_unlabeled "$UNLAB" >> "$LOG" 2>&1
fi

cat > "$CFG" <<EOF
pretrain:
  mask_ratio_start: 0.75
  mask_ratio_end: 0.75
  mask_ramp_epochs: 5
  total_epochs: $EPOCHS
  warmup_epochs: 2
  batch_size: 2000
  base_learning_rate: 0.00015
  data_fraction: 1.0
  val_split: 0.06
jepa:
  total_epochs: $EPOCHS
  warmup_epochs: 2
  batch_size: 2000
  base_learning_rate: 0.00015
train:
  samples_per_class: 40
  total_epochs: 10
  warmup_epochs: 1
  batch_size: 1000
  learning_rate: 0.001
  freeze_encoder: true
test: {batch_size: 2000}
logging: {output_dir_base: $OUT/outputs}
EOF

export SSRL_DATA_DIR="$DATA"
echo "=== pretrain MAE ($EPOCHS ep, batch 2000) $(date -u) ===" >> "$LOG"
timeout 14400 python -m scripts.training.pretrain_mae --config "$CFG" \
  --output_dir_suffix rank_mae >> "$LOG" 2>&1
echo "=== pretrain JEPA ($EPOCHS ep, batch 2000) $(date -u) ===" >> "$LOG"
timeout 14400 python -m scripts.training.pretrain_jepa --config "$CFG" \
  --output_dir_suffix rank_jepa >> "$LOG" 2>&1

MAE_CKPT="$OUT/outputs/pretrain/rank_mae/checkpoints/best.ckpt"
JEPA_CKPT="$OUT/outputs/pretrain/rank_jepa/checkpoints/best.ckpt"

for row in "pixels:pixels" "random:random" "mae:$MAE_CKPT" "jepa:$JEPA_CKPT"; do
  name="${row%%:*}"; ckpt="${row#*:}"
  echo "=== kNN $name $(date -u) ===" >> "$LOG"
  timeout 3600 python -m scripts.evaluation.knn_eval --checkpoint "$ckpt" \
    --data_dir "$DATA" --samples_per_class 400 >> "$LOG" 2>&1
done

# weak frozen probes (10 epochs, 40 labels/class) for random/MAE/JEPA
echo "=== probe random $(date -u) ===" >> "$LOG"
timeout 7200 python -m scripts.training.train_mae --config "$CFG" \
  --output_dir_suffix rank_probe_random >> "$LOG" 2>&1
for row in "mae:$MAE_CKPT" "jepa:$JEPA_CKPT"; do
  name="${row%%:*}"; ckpt="${row#*:}"
  echo "=== probe $name $(date -u) ===" >> "$LOG"
  timeout 7200 python -m scripts.training.train_mae --config "$CFG" \
    --encoder_ckpt "$ckpt" \
    --output_dir_suffix "rank_probe_$name" >> "$LOG" 2>&1
done
echo "=== rank study done $(date -u) ===" >> "$LOG"
