#!/usr/bin/env bash
# MSRVTT-QA inference with the VideoTGB-7B (InstructBLIP-Vicuna) backbone —
# the reference's headline benchmark model
# (reference: eval/scripts/run_qa_msrvtt_vicuna.sh -> eval/utils/model.py:19).
# MESH enables sharded inference (e.g. MESH="dp=2,tp=4") for chips where the
# 7B decoder exceeds single-chip HBM.
set -euo pipefail
MODEL_PATH=${MODEL_PATH:-outputs/checkpoints}
MODEL_BASE=${MODEL_BASE:-}        # Vicuna tokenizer dir
SAMPLER_BASE=${SAMPLER_BASE:-}    # bert-base-uncased tokenizer dir
VIDEO_DIR=${VIDEO_DIR:?set VIDEO_DIR}
GT_Q=${GT_Q:?set GT_Q}
GT_A=${GT_A:?set GT_A}
OUT_DIR=${OUT_DIR:-results/msrvtt_vicuna}
CHUNKS=${CHUNKS:-1}
NFRAME=${NFRAME:-4}
MESH=${MESH:-}

for IDX in $(seq 0 $((CHUNKS-1))); do
  python -m videotgb_tpu.evalsuite.inference \
    --model_path "$MODEL_PATH" --backbone instructblip \
    ${MODEL_BASE:+--model_base "$MODEL_BASE"} \
    ${SAMPLER_BASE:+--sampler_base "$SAMPLER_BASE"} \
    ${MESH:+--mesh "$MESH"} \
    --video_dir "$VIDEO_DIR" \
    --gt_file_question "$GT_Q" --gt_file_answers "$GT_A" \
    --output_dir "$OUT_DIR" --output_name "preds_${CHUNKS}_${IDX}" \
    --nframe "$NFRAME" \
    --num_chunks "$CHUNKS" --chunk_idx "$IDX" &
done
wait
cat "$OUT_DIR"/preds_${CHUNKS}_*.json > "$OUT_DIR/merge.jsonl"
echo "merged -> $OUT_DIR/merge.jsonl"
