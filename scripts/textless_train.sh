#!/usr/bin/env bash
# Textless S2UT training driver — mirrors the reference's
# mm_s2ut/scripts/textless/1_train.sh flow (snapshot config into the
# model dir, launch training, tail the log) on top of the framework CLI.
set -euo pipefail

CONFIG=${1:?usage: textless_train.sh CONFIG_YAML [MODEL_DIR] [extra overrides...]}
MODEL_DIR=${2:-checkpoints/$(basename "${CONFIG%.yaml}")}
shift $(( $# > 2 ? 2 : $# ))

mkdir -p "$MODEL_DIR"
cp "$CONFIG" "$MODEL_DIR/launch_config.yaml"   # config snapshot (reference 1_train.sh:86-88)

python -m mm_s2ut.cli.train \
  --config "$CONFIG" \
  --resume \
  train.save_dir="$MODEL_DIR" \
  "$@" 2>&1 | tee -a "$MODEL_DIR/train.log"
