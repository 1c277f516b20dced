#!/usr/bin/env bash
# Full eval loop over the Speech-Multi30K subsets — mirrors the
# reference's mm_s2ut/scripts/textless/2_inference_all.sh (generate →
# units → vocoder → ASR → ASR-BLEU per subset), one command.
set -euo pipefail

MODEL_DIR=${1:?usage: textless_inference_all.sh MODEL_DIR VOCODER_PT ASR_MODEL_DIR REF_ROOT [RESULTS_ROOT]}
VOCODER=${2:?vocoder checkpoint (.pt)}
ASR_MODEL=${3:?HF wav2vec2-CTC dir}
REF_ROOT=${4:?dir with {subset}.txt references}
RESULTS=${5:-"$MODEL_DIR/results"}

python -m mm_s2ut.cli.inference_all \
  --model_path "$MODEL_DIR" \
  --subsets valid test.2016 test.2017 test.coco \
  --results-root "$RESULTS" \
  --vocoder "$VOCODER" \
  --asr-model "$ASR_MODEL" \
  --reference-root "$REF_ROOT" \
  --beam 10
