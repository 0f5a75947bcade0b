#!/usr/bin/env bash
# GPT-3.5 judge over the merged predictions (reference: eval/scripts/eval_qa_*.sh)
set -euo pipefail
OUT_DIR=${OUT_DIR:-results/msrvtt}
python -m videotgb_tpu.evalsuite.evaluate \
  --pred_path "$OUT_DIR/merge.jsonl" \
  --output_dir "$OUT_DIR/judged" \
  --output_json "$OUT_DIR/combined.json" \
  --num_tasks "${NUM_TASKS:-8}" --judge "${JUDGE:-openai}"
