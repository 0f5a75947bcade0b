"""Standalone batch-inference CLI — the benchmark path for MSVD / MSRVTT /
ActivityNet-QA.

CLI-compatible port of the reference harness (reference:
eval/inference.py:31-206): same flags (--gt_file_question/--gt_file_answers
question-answer json pair, --num_chunks/--chunk_idx sharding, --nframe, ...)
and the same JSONL output rows {'id', 'question', 'answer', 'pred'}, so the
reference's eval/scripts/run_qa_*.sh drive this unchanged (swap the python
module path). The ActivityNet "v_" filename prefix quirk is preserved
(inference.py:176-180).

TPU differences: samples are decoded by a host thread pool and run through
ONE jitted batched pipeline (decode -> RAFT flow -> TGB -> select -> ViT ->
Q-Former -> LLM greedy/sampled decode) instead of per-sample python; chunked
multi-process sharding maps onto jax.process_index() for multi-host runs.
"""

from __future__ import annotations

import argparse
import json
import math
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

VIDEO_FORMATS = (".mp4", ".avi", ".mov", ".mkv")


def split_list(lst, n):
    chunk = math.ceil(len(lst) / n)
    return [lst[i : i + chunk] for i in range(0, len(lst), chunk)]


def get_chunk(lst, n, k):
    return split_list(lst, n)[k]


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True,
                   help="Orbax checkpoint dir, or 'random:<preset>' for smoke")
    p.add_argument("--preset", default="flagship",
                   help="VideoTGBConfig preset for checkpoint-dir model_path "
                        "(tiny/small/flagship)")
    p.add_argument("--backbone", default="blip2",
                   choices=["blip2", "instructblip_t5"],
                   help="T5-decoding backbone variant (instructblip_t5 = "
                        "instruction-aware Q-Former)")
    p.add_argument("--flow_size", type=int, default=None,
                   help="override cfg.tgb.flow_size (must match the "
                        "converted checkpoint)")
    p.add_argument("--cache_dir", default="", required=False)
    p.add_argument("--video_dir", required=True)
    p.add_argument("--gt_file_question", required=True)
    p.add_argument("--gt_file_answers", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--output_name", required=True)
    p.add_argument("--nframe", type=int, default=4)
    p.add_argument("--num_chunks", type=int, default=1)
    p.add_argument("--chunk_idx", type=int, default=0)
    p.add_argument("--device", type=str, default="tpu")
    p.add_argument("--model_base", type=str, default=None)
    p.add_argument("--sampler_base", type=str, default=None)
    p.add_argument("--model_max_length", type=int, default=2048)
    p.add_argument("--lora", type=int, default=0)
    # TPU-side knobs (new)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--flow_frames", type=int, default=8)
    p.add_argument("--max_new_tokens", type=int, default=128)
    p.add_argument("--do_sample", type=int, default=1)
    p.add_argument("--temperature", type=float, default=0.2)
    p.add_argument("--decode_workers", type=int, default=8)
    p.add_argument("--stop", action="append", default=[],
                   help="stop keyword(s), tokenized and matched as generated "
                        "suffixes (KeywordsStoppingCriteria, "
                        "eval/utils/builder_utils.py:320-346)")
    return p.parse_args(argv)


def find_video(video_dir: str, video_name: str) -> str | None:
    for fmt in VIDEO_FORMATS:
        name = f"v_{video_name}{fmt}" if "Activitynet" in video_dir else f"{video_name}{fmt}"
        path = os.path.join(video_dir, name)
        if os.path.exists(path):
            return path
    return None


def load_model(args):
    """Build model + params (checkpoint restore or random for smoke runs)."""
    import jax
    from flax import linen as nn

    from videotgb_tpu.models.videotgb import VideoTGB, VideoTGBConfig

    backbone = getattr(args, "backbone", "blip2")
    if args.model_path.startswith("random:"):
        preset = args.model_path.split(":", 1)[1]
        cfg = getattr(VideoTGBConfig, preset)(backbone)
    else:
        cfg = getattr(VideoTGBConfig, args.preset)(backbone)
    if getattr(args, "flow_size", None):
        import dataclasses

        cfg = dataclasses.replace(
            cfg, tgb=dataclasses.replace(cfg.tgb, flow_size=args.flow_size))
    if args.lora:
        import dataclasses

        t5 = dataclasses.replace(cfg.blip2.t5, lora_rank=8)
        cfg = dataclasses.replace(cfg, blip2=dataclasses.replace(cfg.blip2, t5=t5))
    model = VideoTGB(cfg)

    image = cfg.blip2.vit.image_size
    fs = cfg.tgb.flow_size
    key = jax.random.key(0)
    import jax.numpy as jnp

    variables = model.init(
        key, jnp.zeros((1, cfg.num_frames, image, image, 3)),
        jnp.zeros((1, args.flow_frames, fs, fs, 2)),
        jnp.ones((1, args.flow_frames + 2)), jnp.full((1,), args.flow_frames),
        jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8)),
        jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8)),
        key, method=model.init_pipeline,
    )
    params = nn.meta.unbox(variables)
    if not args.model_path.startswith("random:"):
        from videotgb_tpu.training.checkpoint import CheckpointConfig, CheckpointManager

        mgr = CheckpointManager(CheckpointConfig(directory=args.model_path))
        restored = mgr.restore(template={"params": params["params"]})
        params = {"params": restored["params"]}
    return model, params, cfg


def decode_sample(video_path: str, num_frames: int, flow_frames: int,
                  image: int, flow_size: int):
    from videotgb_tpu.data.transforms import clip_transform, resize_video
    from videotgb_tpu.data.video_io import read_video_cv2, sample_frames

    frames, _ = read_video_cv2(video_path, num_frames=num_frames,
                               size=(max(image, flow_size),) * 2)
    flow_ids = sample_frames(flow_frames + 1, num_frames)
    flow_raw = resize_video(frames[flow_ids], (flow_size, flow_size))
    return (clip_transform(resize_video(frames, (image, image)), image),
            flow_raw.astype(np.float32))


def run_inference(args) -> str:
    import jax
    import jax.numpy as jnp

    from videotgb_tpu.data.tokenizer import load_tokenizer
    from videotgb_tpu.models.videotgb import generate_blip2
    from videotgb_tpu.ops.decode import DecodeConfig

    model, params, cfg = load_model(args)
    tok = load_tokenizer(args.model_base)
    sampler_tok = load_tokenizer(args.sampler_base)
    image = cfg.blip2.vit.image_size
    fs = cfg.tgb.flow_size

    gt_questions = json.load(open(args.gt_file_question))
    gt_questions = get_chunk(gt_questions, args.num_chunks, args.chunk_idx)
    gt_answers = json.load(open(args.gt_file_answers))
    gt_answers = get_chunk(gt_answers, args.num_chunks, args.chunk_idx)

    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(args.output_dir, f"{args.output_name}.json")

    dcfg = DecodeConfig(
        max_new_tokens=args.max_new_tokens,
        eos_token_id=cfg.blip2.t5.eos_token_id,
        pad_token_id=cfg.blip2.t5.pad_token_id,
        do_sample=bool(args.do_sample),
        temperature=args.temperature,
    )
    stop_sequences = tuple(
        tuple(int(t) for t in tok.encode(word) if t != tok.eos_token_id)
        if hasattr(tok, "encode") else ()
        for word in args.stop
    )
    stop_sequences = tuple(s for s in stop_sequences if s)
    gen = jax.jit(
        lambda params, batch, key: generate_blip2(
            model, params, batch, dcfg, key, stop_sequences=stop_sequences)
    )

    @jax.jit
    def flow_of(params, flow_rgb):
        return model.apply(params, flow_rgb, method=model.flow_features)

    samples = []
    for i, q in enumerate(gt_questions):
        path = find_video(args.video_dir, q["video_name"])
        if path is None:
            continue
        samples.append({
            "id": q["question_id"], "question": q["question"],
            "answer": gt_answers[i]["answer"], "path": path,
        })

    pool = ThreadPoolExecutor(args.decode_workers)
    prefetcher = ThreadPoolExecutor(1)  # one-batch lookahead
    bsz = args.batch_size
    text_len = 64
    written = 0

    groups = []
    for start in range(0, len(samples), bsz):
        group = samples[start : start + bsz]
        pad = bsz - len(group)  # static shapes: pad the last batch
        groups.append((start, group, group + [group[-1]] * pad))

    def decode_group(padded):
        return list(pool.map(
            lambda s: decode_sample(s["path"], cfg.num_frames,
                                    args.flow_frames, image, fs), padded))

    # double-buffered host/device pipeline: batch N+1 decodes on threads
    # while batch N runs flow + generation on device (the host loop below is
    # mostly blocked on transfers/execution, which frees the core for cv2)
    next_fut = prefetcher.submit(decode_group, groups[0][2]) if groups else None
    with open(out_path, "w") as ans_file:
        for gi, (start, group, padded) in enumerate(groups):
            decoded = next_fut.result()
            if gi + 1 < len(groups):
                next_fut = prefetcher.submit(decode_group, groups[gi + 1][2])
            frames = jnp.asarray(np.stack([d[0] for d in decoded]))
            flow_rgb = jnp.asarray(np.stack([d[1] for d in decoded]))

            prompts = [f"USER: <video>\n{s['question']} ASSISTANT: "
                       for s in padded]  # inference.py:75
            q_enc = tok(prompts, padding="max_length", truncation=True,
                        max_length=text_len)
            sq_enc = sampler_tok([s["question"] for s in padded],
                                 padding="max_length", truncation=True,
                                 max_length=text_len)

            flow_in = flow_of(params, flow_rgb)

            batch = {
                "frames": frames,
                "flow": flow_in,
                "flow_mask": jnp.ones((bsz, args.flow_frames + 2)),
                "video_length": jnp.full((bsz,), args.flow_frames, jnp.int32),
                "sampler_question_ids": jnp.asarray(sq_enc["input_ids"], jnp.int32),
                "sampler_question_mask": jnp.asarray(sq_enc["attention_mask"]),
                "question_ids": jnp.asarray(q_enc["input_ids"], jnp.int32),
                "question_mask": jnp.asarray(q_enc["attention_mask"]),
                # instruction-aware Q-Former text (instructblip_t5 backbone;
                # ignored by plain blip2)
                "qformer_input_ids": jnp.asarray(sq_enc["input_ids"], jnp.int32),
                "qformer_attention_mask": jnp.asarray(sq_enc["attention_mask"]),
            }
            key = jax.random.fold_in(jax.random.key(0), start)
            tokens, _ = gen(params, batch, key)
            preds = tok.batch_decode(np.asarray(tokens), skip_special_tokens=True)

            for s, pred in zip(group, preds[: len(group)]):
                row = {"id": s["id"], "question": s["question"],
                       "answer": s["answer"], "pred": pred}
                ans_file.write(json.dumps(row) + "\n")
                written += 1
                if written % 500 == 0:  # case printouts (inference.py:184-189)
                    print("==================CASE====================")
                    print("Question: ", s["question"])
                    print("Answer: ", s["answer"])
                    print("Prediction: ", pred)
    return out_path


if __name__ == "__main__":
    run_inference(parse_args())
