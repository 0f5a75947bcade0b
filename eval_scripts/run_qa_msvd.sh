#!/usr/bin/env bash
# MSVD-QA inference, sharded across hosts/processes then merged
# (reference: eval/scripts/run_qa_msvd.sh GPU loop -> JSONL merge).
set -euo pipefail
MODEL_PATH=${MODEL_PATH:-outputs/checkpoints}
VIDEO_DIR=${VIDEO_DIR:?set VIDEO_DIR}
GT_Q=${GT_Q:?set GT_Q}
GT_A=${GT_A:?set GT_A}
OUT_DIR=${OUT_DIR:-results/msvd}
CHUNKS=${CHUNKS:-1}

for IDX in $(seq 0 $((CHUNKS-1))); do
  python -m videotgb_tpu.evalsuite.inference \
    --model_path "$MODEL_PATH" --video_dir "$VIDEO_DIR" \
    --gt_file_question "$GT_Q" --gt_file_answers "$GT_A" \
    --output_dir "$OUT_DIR" --output_name "preds_${CHUNKS}_${IDX}" \
    --num_chunks "$CHUNKS" --chunk_idx "$IDX" &
done
wait
cat "$OUT_DIR"/preds_${CHUNKS}_*.json > "$OUT_DIR/merge.jsonl"
echo "merged -> $OUT_DIR/merge.jsonl"
