#!/usr/bin/env bash
# Fetch the reference release weights (for checkpoint-parity evaluation) and
# convert them to native checkpoints. Mirrors the reference's
# download_weights.sh contract; requires network egress.
set -euo pipefail

DEST="assets/weights"
mkdir -p "$DEST"

BASE="https://github.com/giolucasd/ssrl-vit-mae-jepa/releases/download/v1.0"

echo "📥 Downloading reference release weights into $DEST ..."
wget -q --show-progress -P "$DEST" "$BASE/vit-mae.pt" || {
  echo "❌ download failed (offline environment?) — place the files in $DEST manually"; exit 1; }
wget -q --show-progress -P "$DEST" "$BASE/classifiers.zip" && \
  unzip -o "$DEST/classifiers.zip" -d "$DEST" && rm -f "$DEST/classifiers.zip" || true

echo "🔁 Converting to native checkpoints ..."
python -m scripts.weight_utils.convert_torch_checkpoint \
  "$DEST/vit-mae.pt" "$DEST/vit-mae-native.ckpt" || true

echo "✅ Done."
