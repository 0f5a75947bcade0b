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

Backbones: --backbone blip2 / instructblip_t5 (T5 decode) / instructblip
(Vicuna decoder-only, the VideoTGB-7B headline model —
eval/utils/model.py:19). --mesh dp=2,tp=4 runs mesh-sharded inference for
models that exceed one chip. Flow sampling defaults to the
reference-faithful whole-timeline ~1 fps mode (duration-bucketed static
shapes); --flow_mode=fixed restores the legacy fixed-stride sampler.
"""

from __future__ import annotations

import argparse
import contextlib
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
                   choices=["blip2", "instructblip_t5", "instructblip"],
                   help="backbone variant: blip2 / instructblip_t5 (T5 "
                        "decode, instruction-aware Q-Former) / instructblip "
                        "(Vicuna decoder-only — the VideoTGB-7B headline "
                        "model, eval/utils/model.py:19)")
    p.add_argument("--mesh", default="",
                   help="sharded inference, e.g. 'dp=2,tp=4': places params "
                        "by their logical annotations (tp shards "
                        "heads/mlp/vocab — required when Vicuna-7B exceeds "
                        "one chip's HBM) and the batch over dp")
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
    p.add_argument("--bf16_params", type=int, default=1,
                   help="bf16 param residency (default: the flagship's f32 "
                        "tree is 16.3 GB — it barely fits one v5e chip's "
                        "HBM and leaves no activation headroom). 0 keeps "
                        "f32 residency (norm scales at full precision)")
    # TPU-side knobs (new)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--flow_frames", type=int, default=8,
                   help="(legacy fixed-stride mode) flow frames sampled from "
                        "the candidate set; superseded by the timeline "
                        "sampler unless --flow_mode=fixed")
    p.add_argument("--flow_mode", default="timeline",
                   choices=["timeline", "fixed"],
                   help="timeline = reference-faithful ~1 fps whole-duration "
                        "flow decode (builder_utils.py:117-144), duration-"
                        "bucketed; fixed = legacy flow_frames uniform stride")
    p.add_argument("--flow_fps", type=float, default=2.0,
                   help="requested flow decode rate (reference "
                        "inference.py:66 fps=2; effective rate is ~1 fps — "
                        "every int(native_fps)-th frame)")
    p.add_argument("--max_flow_frames", type=int, default=64,
                   help="flow-length cap (the training-time <=64, "
                        "videoinstruct_dataset.py:241-243); longer timelines "
                        "thin uniformly")
    p.add_argument("--max_new_tokens", type=int, default=128)
    p.add_argument("--do_sample", type=int, default=1)
    p.add_argument("--temperature", type=float, default=0.2)
    p.add_argument("--decode_workers", type=int, default=8)
    p.add_argument("--stop", action="append", default=[],
                   help="stop keyword(s), tokenized and matched as generated "
                        "suffixes (KeywordsStoppingCriteria, "
                        "eval/utils/builder_utils.py:320-346)")
    return p.parse_args(argv)


def encode_stop_words(tok, words) -> list[tuple[int, ...]]:
    """Tokenize stop keywords the way KeywordsStoppingCriteria does
    (eval/utils/builder_utils.py:323-326): strip the leading BOS that
    LLaMA-style tokenizers prepend (otherwise the sequence can never match a
    generated suffix), and drop a trailing EOS (T5-style tokenizers append
    it; EOS already terminates decode on its own)."""
    out = []
    bos = getattr(tok, "bos_token_id", None)
    eos = getattr(tok, "eos_token_id", None)
    for word in words:
        if not hasattr(tok, "encode"):
            continue
        ids = [int(t) for t in tok.encode(word)]
        if len(ids) > 1 and bos is not None and ids[0] == bos:
            ids = ids[1:]
        if len(ids) > 1 and eos is not None and ids[-1] == eos:
            ids = ids[:-1]
        if ids:
            out.append(tuple(ids))
    return out


def find_video(video_dir: str, video_name: str) -> str | None:
    for fmt in VIDEO_FORMATS:
        name = f"v_{video_name}{fmt}" if "Activitynet" in video_dir else f"{video_name}{fmt}"
        path = os.path.join(video_dir, name)
        if os.path.exists(path):
            return path
    return None


def _warn_ignored_flags(args) -> None:
    """Reference-compat flags we accept but do not use get a loud warning —
    silently ignoring them would corrupt a benchmark sweep that sets them."""
    import warnings

    if getattr(args, "model_max_length", 2048) != 2048:
        warnings.warn("--model_max_length is a reference-compat stub; prompt "
                      "length is fixed by the jitted pipeline's text_len")
    if getattr(args, "cache_dir", ""):
        warnings.warn("--cache_dir is a reference-compat stub (no HF hub "
                      "download cache in this pipeline)")
    if getattr(args, "device", "tpu") not in ("tpu", ""):
        warnings.warn("--device is a reference-compat stub; JAX picks the "
                      "platform (axon TPU here)")


def bf16_residency(params):
    """Cast every f32 param leaf to bf16 LEAF-BY-LEAF, freeing each f32
    buffer as it converts. A whole-tree ``jax.tree.map`` holds the f32 and
    bf16 trees simultaneously — ~24 GB peak for the flagship, which OOMs
    the very chip this cast exists to fit. Matmul/conv weights were being
    converted to bf16 inside the jits anyway; norm scales lose f32
    residency, matching bench.py's param_dtype=bf16 serving policy (the
    reference serves bf16 too, configs/experiment/*:24)."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree.flatten(params)
    del params
    for i, x in enumerate(leaves):
        if getattr(x, "dtype", None) == jnp.float32:
            leaves[i] = x.astype(jnp.bfloat16)
            del x  # free the f32 buffer before the next leaf
    return jax.tree.unflatten(treedef, leaves)


def load_model(args, with_specs: bool = False):
    """Build model + params (checkpoint restore or random for smoke runs).

    ``with_specs=True`` additionally returns the parameter PartitionSpec tree
    (from the modules' logical axis annotations) for mesh-sharded inference.
    """
    import dataclasses

    import jax
    from flax import linen as nn

    from videotgb_tpu.models.videotgb import VideoTGB, VideoTGBConfig

    _warn_ignored_flags(args)
    backbone = getattr(args, "backbone", "blip2")
    if args.model_path.startswith("random:"):
        preset = args.model_path.split(":", 1)[1]
        cfg = getattr(VideoTGBConfig, preset)(backbone)
    else:
        cfg = getattr(VideoTGBConfig, args.preset)(backbone)
    nframe = getattr(args, "nframe", None)
    if nframe and nframe != cfg.nframe:
        # --nframe changes the selection width (reference eval/inference.py:40
        # threads it into model.generate)
        cfg = dataclasses.replace(cfg, nframe=nframe)
    if getattr(args, "flow_size", None):
        cfg = dataclasses.replace(
            cfg, tgb=dataclasses.replace(cfg.tgb, flow_size=args.flow_size))
    if (args.model_path.startswith("random:")
            and getattr(args, "bf16_params", False)):
        # create the big towers' params bf16 at init: the flagship's f32
        # tree (16.3 GB) barely fits v5e HBM and init-then-cast peaks above
        # it (observed ResourceExhausted 2026-08-19); checkpoint loads keep
        # the f32 init as the restore template and cast leaf-wise after
        from videotgb_tpu.models.videotgb import bf16_param_config

        cfg = bf16_param_config(cfg)
    if args.lora:
        if cfg.backbone == "blip2":
            t5 = dataclasses.replace(cfg.blip2.t5, lora_rank=8)
            cfg = dataclasses.replace(
                cfg, blip2=dataclasses.replace(cfg.blip2, t5=t5))
        else:
            llm = dataclasses.replace(cfg.instructblip.llm, lora_rank=8)
            cfg = dataclasses.replace(
                cfg, instructblip=dataclasses.replace(cfg.instructblip, llm=llm))
    model = VideoTGB(cfg)

    vit_cfg = cfg.blip2.vit if cfg.blip2 is not None else cfg.instructblip.vit
    image = vit_cfg.image_size
    fs = cfg.tgb.flow_size
    key = jax.random.key(0)
    import jax.numpy as jnp

    flow_frames = getattr(args, "flow_frames", 8)
    variables = model.init(
        key, jnp.zeros((1, cfg.num_frames, image, image, 3)),
        jnp.zeros((1, flow_frames, fs, fs, 2)),
        jnp.ones((1, flow_frames + 2)), jnp.full((1,), flow_frames),
        jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8)),
        jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8)),
        key, method=model.init_pipeline,
    )
    from videotgb_tpu.parallel.sharding import param_partition_spec

    specs = param_partition_spec(variables["params"]) if with_specs else None
    params = nn.meta.unbox(variables)
    if not args.model_path.startswith("random:"):
        from videotgb_tpu.training.checkpoint import CheckpointConfig, CheckpointManager

        mgr = CheckpointManager(CheckpointConfig(directory=args.model_path))
        restored = mgr.restore(template={"params": params["params"]})
        params = {"params": restored["params"]}
    if getattr(args, "bf16_params", False):
        params = bf16_residency(params)
    if with_specs:
        return model, params, cfg, specs
    return model, params, cfg


def decode_sample(video_path: str, num_frames: int, flow_frames: int,
                  image: int, flow_size: int):
    """Legacy fixed-stride mode: 32 uniform candidates, flow_frames+1 of them
    for RAFT. Equivalent to the timeline mode for short clips."""
    from videotgb_tpu.data.transforms import clip_transform, resize_video
    from videotgb_tpu.data.video_io import read_video_cv2, sample_frames

    frames, _ = read_video_cv2(video_path, num_frames=num_frames,
                               size=(max(image, flow_size),) * 2)
    flow_ids = sample_frames(flow_frames + 1, num_frames)
    flow_raw = resize_video(frames[flow_ids], (flow_size, flow_size))
    return (clip_transform(resize_video(frames, (image, image)), image),
            flow_raw.astype(np.float32))


FLOW_BUCKETS = (8, 16, 32, 64)


def flow_bucket(length: int, max_flow_frames: int) -> int:
    """Smallest static flow length >= ``length`` — bounds jit recompiles to
    one per bucket while short clips skip most of the padded TGB/RAFT work."""
    for b in FLOW_BUCKETS:
        if b >= length and b <= max_flow_frames:
            return b
    return max_flow_frames


def decode_sample_timeline(video_path: str, num_frames: int,
                           max_flow_frames: int, flow_fps: float,
                           image: int, flow_size: int):
    """Reference-faithful eval decode (builder_utils.py:117-144 get_frames):
    flow frames at ~1 fps over the whole native timeline (<=
    max_flow_frames), candidate frames = ``num_frames`` uniform picks OF THE
    FLOW FRAMES (duplicate-when-short). Long videos therefore give the TGB a
    dense whole-duration view (~60 flow tokens for a 60 s clip) instead of a
    sparse fixed stride."""
    from videotgb_tpu.data.transforms import clip_transform, resize_video
    from videotgb_tpu.data.video_io import candidate_indices, read_video_timeline

    timeline, length = read_video_timeline(
        video_path, max_frames=max_flow_frames, fps=flow_fps,
        size=(max(image, flow_size),) * 2)
    cand = candidate_indices(length, num_frames)
    frames = clip_transform(
        resize_video(timeline[cand], (image, image)), image)
    flow_raw = resize_video(timeline, (flow_size, flow_size)).astype(np.float32)
    return frames, flow_raw, length


def run_inference(args) -> str:
    import jax
    import jax.numpy as jnp

    from videotgb_tpu.data.tokenizer import load_tokenizer
    from videotgb_tpu.models.videotgb import generate_blip2, generate_instructblip
    from videotgb_tpu.ops.decode import DecodeConfig

    model, params, cfg, specs = load_model(args, with_specs=True)
    tok = load_tokenizer(args.model_base)
    sampler_tok = load_tokenizer(args.sampler_base)
    vit_cfg = cfg.blip2.vit if cfg.blip2 is not None else cfg.instructblip.vit
    image = vit_cfg.image_size
    fs = cfg.tgb.flow_size
    decoder_only = cfg.backbone == "instructblip"

    mesh = None
    if args.mesh:
        # sharded inference: params placed by logical annotations (the
        # pattern proven in tests/test_sharded_inference.py), batch over dp
        from jax.sharding import NamedSharding

        from videotgb_tpu.parallel.mesh import create_mesh, parse_mesh_spec

        mesh = create_mesh(parse_mesh_spec(args.mesh, allow_pp=False))
        dp_total = mesh.shape["dp"] * mesh.shape["fsdp"]
        if args.batch_size % dp_total:
            raise SystemExit(f"--batch_size {args.batch_size} must be "
                             f"divisible by dp*fsdp={dp_total}")
        params = {"params": jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params["params"], specs)}

    gt_questions = json.load(open(args.gt_file_question))
    gt_questions = get_chunk(gt_questions, args.num_chunks, args.chunk_idx)
    gt_answers = json.load(open(args.gt_file_answers))
    gt_answers = get_chunk(gt_answers, args.num_chunks, args.chunk_idx)

    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(args.output_dir, f"{args.output_name}.json")

    if decoder_only:
        lm_cfg = cfg.instructblip.llm
        eos_id, pad_id = lm_cfg.eos_token_id, lm_cfg.pad_token_id
    else:
        eos_id, pad_id = cfg.blip2.t5.eos_token_id, cfg.blip2.t5.pad_token_id
    dcfg = DecodeConfig(
        max_new_tokens=args.max_new_tokens,
        eos_token_id=eos_id,
        pad_token_id=pad_id,
        do_sample=bool(args.do_sample),
        temperature=args.temperature,
    )
    stop_sequences = tuple(encode_stop_words(tok, args.stop))
    gen_core = generate_instructblip if decoder_only else generate_blip2
    gen = jax.jit(
        lambda params, batch, key: gen_core(
            model, params, batch, dcfg, key, stop_sequences=stop_sequences)
    )

    @jax.jit
    def flow_of(params, flow_rgb):
        return model.apply(params, flow_rgb, method=model.flow_features)

    @jax.jit
    def flow_of_timeline(params, flow_rgb, valid):
        return model.apply(params, flow_rgb, valid,
                           method=model.flow_features_timeline)

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
    timeline = args.flow_mode == "timeline"
    written = 0

    groups = []
    for start in range(0, len(samples), bsz):
        group = samples[start : start + bsz]
        pad = bsz - len(group)  # static shapes: pad the last batch
        groups.append((start, group, group + [group[-1]] * pad))

    def decode_group(padded):
        if timeline:
            return list(pool.map(
                lambda s: decode_sample_timeline(
                    s["path"], cfg.num_frames, args.max_flow_frames,
                    args.flow_fps, image, fs), padded))
        return list(pool.map(
            lambda s: decode_sample(s["path"], cfg.num_frames,
                                    args.flow_frames, image, fs), padded))

    # double-buffered host/device pipeline: batch N+1 decodes on threads
    # while batch N runs flow + generation on device (the host loop below is
    # mostly blocked on transfers/execution, which frees the core for cv2)
    next_fut = prefetcher.submit(decode_group, groups[0][2]) if groups else None
    # mesh context so in-model constrain_batch() pins activation shardings
    # (batch over dp, prefill tokens over sp) — without it only the param
    # shardings steer GSPMD (serve.py does the same around its device calls)
    mesh_ctx = mesh if mesh is not None else contextlib.nullcontext()
    with mesh_ctx, open(out_path, "w") as ans_file:
        for gi, (start, group, padded) in enumerate(groups):
            decoded = next_fut.result()
            if gi + 1 < len(groups):
                next_fut = prefetcher.submit(decode_group, groups[gi + 1][2])
            frames = jnp.asarray(np.stack([d[0] for d in decoded]))

            if timeline:
                bucket = flow_bucket(max(d[2] for d in decoded),
                                     args.max_flow_frames)
                flow_rgb = np.zeros((bsz, bucket, fs, fs, 3), np.float32)
                valid = np.zeros((bsz, bucket), np.float32)
                flow_mask = np.zeros((bsz, bucket + 2), np.float32)
                lengths = np.zeros((bsz,), np.int32)
                for i, (_, fl, ln) in enumerate(decoded):
                    ln = min(ln, bucket)
                    flow_rgb[i, :ln] = fl[:ln]
                    # repeat-last padding: pad pairs produce ~zero flow and
                    # are masked out of normalization and attention anyway
                    flow_rgb[i, ln:] = fl[ln - 1]
                    valid[i, :ln] = 1.0
                    flow_mask[i, : ln + 2] = 1.0
                    lengths[i] = ln
                flow_in = flow_of_timeline(params, jnp.asarray(flow_rgb),
                                           jnp.asarray(valid))
                flow_mask = jnp.asarray(flow_mask)
                video_length = jnp.asarray(lengths)
            else:
                flow_rgb = jnp.asarray(np.stack([d[1] for d in decoded]))
                flow_in = flow_of(params, flow_rgb)
                flow_mask = jnp.ones((bsz, args.flow_frames + 2))
                video_length = jnp.full((bsz,), args.flow_frames, jnp.int32)

            prompts = [f"USER: <video>\n{s['question']} ASSISTANT: "
                       for s in padded]  # inference.py:75
            q_enc = tok(prompts, padding="max_length", truncation=True,
                        max_length=text_len)
            sq_enc = sampler_tok([s["question"] for s in padded],
                                 padding="max_length", truncation=True,
                                 max_length=text_len)

            batch = {
                "frames": frames,
                "flow": flow_in,
                "flow_mask": flow_mask,
                "video_length": video_length,
                "sampler_question_ids": jnp.asarray(sq_enc["input_ids"], jnp.int32),
                "sampler_question_mask": jnp.asarray(sq_enc["attention_mask"]),
                "question_ids": jnp.asarray(q_enc["input_ids"], jnp.int32),
                "question_mask": jnp.asarray(q_enc["attention_mask"]),
                # instruction-aware Q-Former text (instructblip /
                # instructblip_t5 backbones; ignored by plain blip2) — the
                # bert-vocab sampler tokenizer, like the reference processors
                "qformer_input_ids": jnp.asarray(sq_enc["input_ids"], jnp.int32),
                "qformer_attention_mask": jnp.asarray(sq_enc["attention_mask"]),
            }
            if mesh is not None:
                from videotgb_tpu.parallel.sharding import shard_batch

                batch = shard_batch(batch, mesh)
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
