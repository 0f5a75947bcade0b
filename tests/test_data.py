"""Data layer tests: sampling rules, flow viz, transforms, tokenizer,
conversation templates, synthetic dataset + collate + loader."""

import numpy as np
import pytest

from videotgb_tpu.data.conversation import conv_templates
from videotgb_tpu.data.datasets import (
    SyntheticVideoQA,
    collate_iv,
    collate_videoinstruct,
)
from videotgb_tpu.data.flow_viz import flow_to_image, make_colorwheel, normalize_flow
from videotgb_tpu.data.loader import PrefetchLoader, device_batch
from videotgb_tpu.data.tokenizer import ByteTokenizer
from videotgb_tpu.data.transforms import clip_transform, denormalize, normalize_video
from videotgb_tpu.data.video_io import duplicate_to_length, sample_frames


# ----------------------------------------------------------------- sampling
def test_sample_frames_uniform_matches_reference_rule():
    # util.py:20-34: intervals = linspace(0, vlen, n+1); uniform takes starts
    for n, vlen in [(32, 100), (4, 9), (8, 8)]:
        intervals = np.linspace(0, vlen, n + 1).astype(int)
        expected = [intervals[i] for i in range(n)]
        assert sample_frames(n, vlen, "uniform") == expected


def test_duplicate_to_length():
    assert duplicate_to_length([1, 2], 5) == [1, 1, 1, 1, 2, 2, 2, 2]
    assert duplicate_to_length([1, 2, 3], 3) == [1, 2, 3]


# ----------------------------------------------------------------- flow viz
def test_colorwheel_is_reference_shape():
    wheel = make_colorwheel()
    assert wheel.shape == (55, 3)
    assert wheel[0].tolist() == [255, 0, 0]


def test_flow_to_image_range_and_shape(rng):
    flow = rng.standard_normal((3, 16, 16, 2)).astype(np.float32)
    img = flow_to_image(flow)
    assert img.shape == (3, 16, 16, 3) and img.dtype == np.uint8


def test_normalize_flow_max_radius_one(rng):
    flow = rng.standard_normal((4, 8, 8, 2)).astype(np.float32) * 10
    normed = normalize_flow(flow)
    rad = np.sqrt((normed ** 2).sum(-1))
    assert rad.max() == pytest.approx(1.0, abs=1e-3)


# --------------------------------------------------------------- transforms
def test_clip_transform_roundtrip(rng):
    frames = rng.integers(0, 255, (2, 64, 48, 3)).astype(np.uint8)
    out = clip_transform(frames, 32)
    assert out.shape == (2, 32, 32, 3)
    back = denormalize(normalize_video(frames))
    assert np.abs(back.astype(int) - frames.astype(int)).max() <= 1


# ----------------------------------------------------------------- video io
def test_read_video_cv2_rgb_order_and_resize(tmp_path):
    """_postprocess contract: exact RGB (flip of cv2's BGR), contiguous
    uint8, same-size resize skipped, resize == resize-of-the-flipped-frame
    (channel-independent bilinear, so cvtColor-then-resize is exact)."""
    import cv2

    from videotgb_tpu.data.video_io import read_video_cv2

    path = str(tmp_path / "clip.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                             (48, 32))
    rng = np.random.default_rng(0)
    for t in range(12):
        writer.write(rng.integers(0, 255, (32, 48, 3), np.uint8))
    writer.release()

    cap = cv2.VideoCapture(path)
    ok, first_bgr = cap.read()
    cap.release()
    assert ok

    frames, fps = read_video_cv2(path, num_frames=4)
    assert frames.dtype == np.uint8 and frames.flags["C_CONTIGUOUS"]
    assert frames.shape == (4, 32, 48, 3) and fps == 10.0
    np.testing.assert_array_equal(frames[0], first_bgr[..., ::-1])

    same, _ = read_video_cv2(path, num_frames=4, size=(32, 48))
    np.testing.assert_array_equal(same, frames)

    small, _ = read_video_cv2(path, num_frames=4, size=(16, 24))
    ref = cv2.resize(np.ascontiguousarray(first_bgr[..., ::-1]), (24, 16),
                     interpolation=cv2.INTER_LINEAR)
    assert small.shape == (4, 16, 24, 3)
    np.testing.assert_array_equal(small[0], ref)


# ---------------------------------------------------------------- tokenizer
def test_byte_tokenizer_roundtrip_and_padding():
    tok = ByteTokenizer()
    enc = tok(["hello", "hi"], padding="longest")
    assert enc.input_ids.shape == enc.attention_mask.shape
    assert tok.batch_decode(enc.input_ids) == ["hello", "hi"]
    enc2 = tok("hello", padding="max_length", max_length=12)
    assert enc2.input_ids.shape == (1, 12)
    assert enc2.input_ids[0, 5] == tok.eos_token_id


# ------------------------------------------------------------- conversation
def test_vicuna_v1_prompt_shape():
    conv = conv_templates["vicuna_v1"].copy()
    conv.append_message(conv.roles[0], "what is shown?")
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()
    assert prompt.endswith("ASSISTANT:")
    assert "USER: what is shown?" in prompt
    assert prompt.startswith("A chat between")


def test_llama2_prompt_wraps_system():
    conv = conv_templates["llama_2"].copy()
    conv.append_message(conv.roles[0], "hello")
    conv.append_message(conv.roles[1], "hi!")
    prompt = conv.get_prompt()
    assert "[INST]" in prompt and "<<SYS>>" in prompt and "hi!" in prompt


def test_image_tuple_message_inlined():
    conv = conv_templates["vicuna_v1"].copy()
    conv.append_message(conv.roles[0], ("describe <image> this", "imgdata"))
    conv.append_message(conv.roles[1], None)
    assert "<image>\ndescribe  this" in conv.get_prompt()


# ------------------------------------------------- synthetic data + collate
def test_synthetic_dataset_and_collate_shapes():
    ds = SyntheticVideoQA(length=8, num_frames=8, max_flow_len=16,
                          flow_len_range=(4, 16), image_size=32, flow_size=32)
    tok = ByteTokenizer()
    samples = [ds[i] for i in range(4)]
    batch = collate_videoinstruct(samples, tok, tok, max_flow_len=16,
                                  max_txt_len=64, answer_len=16)
    assert batch["frames"].shape == (4, 8, 32, 32, 3)
    assert batch["flow"].shape == (4, 16, 32, 32, 2)
    assert batch["flow_mask"].shape == (4, 18)
    for i in range(4):
        l = batch["video_length"][i]
        assert batch["flow_mask"][i, : l + 2].all()
        assert not batch["flow_mask"][i, l + 2 :].any()
        assert batch["starts"][i] <= batch["ends"][i] < l
    assert batch["question_ids"].shape == (4, 64)
    dev = device_batch(batch)
    assert "_text_answer" not in dev and "frames" in dev


def test_collate_is_deterministic():
    ds = SyntheticVideoQA(length=4, image_size=16, flow_size=16,
                          max_flow_len=8, flow_len_range=(4, 8))
    tok = ByteTokenizer()
    b1 = collate_videoinstruct([ds[0], ds[1]], tok, tok, max_flow_len=8)
    b2 = collate_videoinstruct([ds[0], ds[1]], tok, tok, max_flow_len=8)
    np.testing.assert_array_equal(b1["flow"], b2["flow"])
    np.testing.assert_array_equal(b1["question_ids"], b2["question_ids"])


def test_collate_iv_width_semantics():
    tok = ByteTokenizer()
    samples = [
        {"frames": np.ones((1, 16, 16, 3), np.float32), "width": 1,
         "question": "q1", "answer": "a1"},  # image row
        {"frames": np.ones((4, 16, 16, 3), np.float32) * 2, "width": 4,
         "question": "q2", "answer": "a2"},  # video row
        {"frames": None, "width": 0, "question": "q3", "answer": "a3"},  # text
    ]
    batch = collate_iv(samples, tok, nframe=4, image_size=16)
    assert batch["frames"].shape == (3, 4, 16, 16, 3)
    assert batch["widths"].tolist() == [1, 4, 0]
    np.testing.assert_array_equal(batch["frames"][0], np.ones((4, 16, 16, 3)))
    assert (batch["frames"][2] == 0).all()


def test_prefetch_loader_yields_all_batches():
    ds = SyntheticVideoQA(length=10, image_size=16, flow_size=16,
                          max_flow_len=8, flow_len_range=(4, 8))
    tok = ByteTokenizer()
    loader = PrefetchLoader(
        ds, batch_size=4,
        collate_fn=lambda s: collate_videoinstruct(s, tok, tok, max_flow_len=8),
        num_workers=2, seed=1,
    )
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    assert all(b["frames"].shape[0] == 4 for b in batches)
    # different epochs shuffle differently
    b1 = list(loader)[0]["_idxs"]
    b2 = list(loader)[0]["_idxs"]
    assert len(batches[0]["_idxs"]) == 4


def test_prefetch_loader_early_break_retires_producer():
    """Breaking mid-epoch (trainer max_steps / early stop / sweep trials)
    must retire the producer thread instead of leaving it blocked forever on
    the full prefetch queue — a long sweep process would otherwise leak a
    thread + an 8-worker pool per abandoned epoch."""
    import threading
    import time

    before = threading.active_count()
    ds = list(range(64))
    loader = PrefetchLoader(
        ds, batch_size=2, collate_fn=lambda s: {"x": np.asarray(s)},
        num_workers=2, prefetch=2, shuffle=False,
    )
    it = iter(loader)
    next(it)
    it.close()  # what an abandoning for-loop does via GC
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_prefetch_loader_propagates_producer_exception():
    """A raising __getitem__/collate must surface in the consumer — before
    the fix the producer thread died silently and the training loop hung on
    the queue forever."""

    class Boom(list):
        def __getitem__(self, i):
            if i == 3:
                raise RuntimeError("bad sample")
            return super().__getitem__(i)

    ds = Boom(range(8))
    loader = PrefetchLoader(
        ds, batch_size=2, collate_fn=lambda s: {"x": np.asarray(s)},
        num_workers=2, shuffle=False,
    )
    with pytest.raises(RuntimeError, match="bad sample"):
        list(loader)
