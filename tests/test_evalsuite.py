"""End-to-end evalsuite test: synthetic videos -> inference CLI -> JSONL ->
offline judge -> stats. Runs the real CLI code paths on the tiny preset."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def qa_assets(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("qa")
    video_dir = root / "videos"
    video_dir.mkdir()
    rng = np.random.default_rng(0)
    for name in ("vid_a", "vid_b", "vid_c"):
        path = str(video_dir / f"{name}.mp4")
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                                 10.0, (64, 64))
        for _ in range(20):
            writer.write(rng.integers(0, 255, (64, 64, 3), np.uint8))
        writer.release()
    questions = [
        {"video_name": "vid_a", "question": "what happens", "question_id": "q1"},
        {"video_name": "vid_b", "question": "who is there", "question_id": "q2"},
        {"video_name": "vid_c", "question": "what color", "question_id": "q3"},
        {"video_name": "missing", "question": "skip me", "question_id": "q4"},
    ]
    answers = [
        {"answer": "a person walks"},
        {"answer": "a dog"},
        {"answer": "red"},
        {"answer": "n/a"},
    ]
    (root / "q.json").write_text(json.dumps(questions))
    (root / "a.json").write_text(json.dumps(answers))
    return root, video_dir


def test_inference_cli_writes_jsonl(qa_assets, tmp_path):
    from videotgb_tpu.evalsuite.inference import parse_args, run_inference

    root, video_dir = qa_assets
    args = parse_args([
        "--model_path", "random:tiny",
        "--video_dir", str(video_dir),
        "--gt_file_question", str(root / "q.json"),
        "--gt_file_answers", str(root / "a.json"),
        "--output_dir", str(tmp_path),
        "--output_name", "preds",
        "--batch_size", "2",
        "--flow_frames", "3",
        "--max_new_tokens", "4",
        "--do_sample", "0",
    ])
    out_path = run_inference(args)
    rows = [json.loads(l) for l in open(out_path)]
    # missing video skipped; 3 rows with the reference row schema
    assert len(rows) == 3
    assert set(rows[0]) == {"id", "question", "answer", "pred"}
    assert [r["id"] for r in rows] == ["q1", "q2", "q3"]


def test_chunk_sharding_matches_reference_split():
    from videotgb_tpu.evalsuite.inference import get_chunk, split_list

    lst = list(range(10))
    chunks = split_list(lst, 3)
    assert chunks == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]
    assert get_chunk(lst, 3, 1) == [4, 5, 6, 7]


def test_judge_offline_and_stats(tmp_path):
    from videotgb_tpu.evalsuite.evaluate import main

    pred_path = tmp_path / "preds.json"
    rows = [
        {"id": "1", "question": "q", "answer": "a red car", "pred": "a red car </s>"},
        {"id": "2", "question": "q", "answer": "a dog", "pred": "something else"},
    ]
    pred_path.write_text("\n".join(json.dumps(r) for r in rows))
    out_dir = tmp_path / "judged"
    stats = main([
        "--pred_path", str(pred_path),
        "--output_dir", str(out_dir),
        "--output_json", str(tmp_path / "combined.json"),
        "--judge", "token_recall",
        "--num_tasks", "2",
    ])
    assert stats["count"] == 2
    assert stats["yes_count"] == 1 and stats["no_count"] == 1
    assert stats["accuracy"] == 0.5
    # resumable: second run does nothing new, same stats
    stats2 = main([
        "--pred_path", str(pred_path),
        "--output_dir", str(out_dir),
        "--judge", "token_recall",
    ])
    assert stats2 == stats
