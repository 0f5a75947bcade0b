"""Checkpoint conversion CLI: released torch weights -> Orbax VideoTGB tree.

The bridge for reference users (SURVEY.md section 5.4): assembles a full
VideoTGB parameter tree from the published checkpoints —

  --backbone_dir   HF BLIP2 / InstructBLIP model dir (config.json +
                   pytorch_model*.bin / *.safetensors)
  --bert_dir       bert-base-uncased dir (TGB initialization)
  --sampler_path   the reference's trained TGB sampler.pth (overrides bert)
  --raft_path      raft-sintel.pth (DataParallel prefixes handled)
  --lightning_ckpt a reference Lightning .ckpt (full model state_dict with
                   model./temporal_encoder./of_extractor. prefixes)

and writes an Orbax checkpoint loadable by the train/eval/inference entries.
Missing sources keep random init for their subtree (matching the reference's
from_pretrained + fresh-heads behaviour).

Usage:
  python -m videotgb_tpu.tools.convert_checkpoint --preset flagship \\
      --backbone blip2 --backbone_dir /ckpts/blip2-flan-t5-xl \\
      --bert_dir /ckpts/bert-base-uncased --raft_path /ckpts/raft-sintel.pth \\
      --output outputs/converted
"""

from __future__ import annotations

import argparse
import glob
import os
from typing import Mapping

import numpy as np


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a .pth/.bin/.ckpt/safetensors file (or an HF model dir) into
    numpy, stripping DataParallel 'module.' prefixes
    (raft_utils/utils.py:85-91 semantics)."""
    state: dict = {}
    if os.path.isdir(path):
        files = sorted(
            glob.glob(os.path.join(path, "*.safetensors"))
            or glob.glob(os.path.join(path, "pytorch_model*.bin"))
            or glob.glob(os.path.join(path, "*.pth"))
        )
        if not files:
            raise FileNotFoundError(f"no weight files under {path}")
        for f in files:
            state.update(load_torch_state_dict(f))
        return state
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        raw = load_file(path)
        return {k: np.asarray(v) for k, v in raw.items()}
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    out = {}
    for k, v in raw.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    return out


def _strip_prefix(sd: Mapping, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def build_params(args) -> tuple[dict, object]:
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from flax.traverse_util import flatten_dict, unflatten_dict

    from videotgb_tpu.models.videotgb import VideoTGB, VideoTGBConfig
    from videotgb_tpu.training import convert as C

    cfg = getattr(VideoTGBConfig, args.preset)(args.backbone)
    if getattr(args, "flow_size", None):
        # the released sampler.pth embeds 224^2 flow patches regardless of
        # preset (xropebert TemporalOFEmbedding hardcodes 224//16 patches)
        import dataclasses

        cfg = dataclasses.replace(
            cfg, tgb=dataclasses.replace(cfg.tgb, flow_size=args.flow_size))
    model = VideoTGB(cfg)
    key = jax.random.key(args.seed)
    image = (cfg.blip2 or cfg.instructblip).vit.image_size
    fs = cfg.tgb.flow_size
    variables = model.init(
        key, jnp.zeros((1, cfg.num_frames, image, image, 3)),
        jnp.zeros((1, 4, fs, fs, 2)), jnp.ones((1, 6)),
        jnp.full((1,), 4), jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8)),
        jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8)), key,
        method=model.init_pipeline,
    )
    params = nn.meta.unbox(variables)["params"]
    flat_updates: dict = {}

    bb = cfg.blip2 or cfg.instructblip
    if args.backbone_dir:
        sd = load_torch_state_dict(args.backbone_dir)
        flat_updates.update(C.with_subtree(
            C.convert_blip2_vision(sd, bb.vit.num_layers, "vision_model."),
            "model", "vision_model"))
        flat_updates.update(C.with_subtree(
            C.convert_blip2_qformer(
                sd, bb.qformer.num_layers,
                bb.qformer.cross_attention_frequency, "qformer.",
                instruct=(args.backbone in ("instructblip",
                                            "instructblip_t5"))),
            "model", "qformer"))
        if "query_tokens" in sd:
            flat_updates[("model", "query_tokens")] = np.asarray(sd["query_tokens"])
        if "language_projection.weight" in sd:
            flat_updates[("model", "language_projection", "kernel")] = (
                np.asarray(sd["language_projection.weight"]).T)
            flat_updates[("model", "language_projection", "bias")] = (
                np.asarray(sd["language_projection.bias"]))
        if "temporal_projection.weight" in sd:
            flat_updates[("model", "temporal_projection", "kernel")] = (
                np.asarray(sd["temporal_projection.weight"]).T)
            flat_updates[("model", "temporal_projection", "bias")] = (
                np.asarray(sd["temporal_projection.bias"]))
        if args.backbone in ("blip2", "instructblip_t5"):
            flat_updates.update(C.with_subtree(
                C.convert_t5(sd, bb.t5.num_encoder_layers,
                             bb.t5.num_decoder_layers, "language_model."),
                "model", "language_model"))
        else:
            flat_updates.update(C.with_subtree(
                C.convert_llama(sd, bb.llm.num_layers, "language_model."),
                "model", "language_model"))

    if args.sampler_path:
        sd = load_torch_state_dict(args.sampler_path)
        flat_updates.update(C.with_subtree(
            C.convert_reference_tgb(sd, cfg.tgb.num_layers,
                                    cfg.tgb.fusion_layer),
            "temporal_encoder"))
    elif args.bert_dir:
        sd = load_torch_state_dict(args.bert_dir)
        prefix = "bert." if any(k.startswith("bert.") for k in sd) else ""
        flat_updates.update(C.with_subtree(
            C.convert_bert_to_tgb(sd, cfg.tgb.num_layers, prefix),
            "temporal_encoder"))

    if args.raft_path:
        sd = load_torch_state_dict(args.raft_path)
        flat_updates.update(C.with_subtree(C.convert_raft(sd), "of_extractor"))

    if args.lightning_ckpt:
        sd = load_torch_state_dict(args.lightning_ckpt)
        for src_prefix, convert_fn, dst in (
            ("temporal_encoder.",
             lambda s: C.convert_reference_tgb(s, cfg.tgb.num_layers,
                                               cfg.tgb.fusion_layer),
             ("temporal_encoder",)),
            ("of_extractor.", C.convert_raft, ("of_extractor",)),
        ):
            sub = _strip_prefix(sd, src_prefix)
            if sub:
                flat_updates.update(C.with_subtree(convert_fn(sub), *dst))
        # backbone under "model." uses the HF names — convert the FULL
        # backbone, exactly as the --backbone_dir branch does: Lightning
        # checkpoints carry the stage-3-trained query_tokens /
        # language_projection / language_model (LoRA-merged) weights, and
        # silently dropping them would serve random heads (ADVICE r1)
        sub = _strip_prefix(sd, "model.")
        if sub:
            # reuse the HF mapping on the embedded state dict
            flat_updates.update(C.with_subtree(
                C.convert_blip2_vision(sub, bb.vit.num_layers, "vision_model."),
                "model", "vision_model"))
            flat_updates.update(C.with_subtree(
                C.convert_blip2_qformer(
                    sub, bb.qformer.num_layers,
                    bb.qformer.cross_attention_frequency, "qformer.",
                    instruct=(args.backbone in ("instructblip",
                                                "instructblip_t5"))),
                "model", "qformer"))
            if "query_tokens" in sub:
                flat_updates[("model", "query_tokens")] = np.asarray(
                    sub["query_tokens"])
            if "language_projection.weight" in sub:
                flat_updates[("model", "language_projection", "kernel")] = (
                    np.asarray(sub["language_projection.weight"]).T)
                flat_updates[("model", "language_projection", "bias")] = (
                    np.asarray(sub["language_projection.bias"]))
            if "temporal_projection.weight" in sub:
                flat_updates[("model", "temporal_projection", "kernel")] = (
                    np.asarray(sub["temporal_projection.weight"]).T)
                flat_updates[("model", "temporal_projection", "bias")] = (
                    np.asarray(sub["temporal_projection.bias"]))
            if any(k.startswith("language_model.") for k in sub):
                if args.backbone in ("blip2", "instructblip_t5"):
                    flat_updates.update(C.with_subtree(
                        C.convert_t5(sub, bb.t5.num_encoder_layers,
                                     bb.t5.num_decoder_layers,
                                     "language_model."),
                        "model", "language_model"))
                else:
                    flat_updates.update(C.with_subtree(
                        C.convert_llama(sub, bb.llm.num_layers,
                                        "language_model."),
                        "model", "language_model"))

    # NOTE: converts to the unscanned (per-layer) layout; scanned runtimes
    # restack with training.convert.stack_layers.
    merged = C.merge_into(params, flat_updates, strict=not args.lenient)
    return merged, cfg


def main(argv=None) -> str:
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="flagship")
    p.add_argument("--backbone",
                   choices=["blip2", "instructblip", "instructblip_t5"],
                   default="blip2")
    p.add_argument("--backbone_dir", default=None)
    p.add_argument("--bert_dir", default=None)
    p.add_argument("--sampler_path", default=None)
    p.add_argument("--raft_path", default=None)
    p.add_argument("--lightning_ckpt", default=None)
    p.add_argument("--output", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--flow_size", type=int, default=None,
                   help="override cfg.tgb.flow_size (released sampler.pth "
                        "is built for 224)")
    p.add_argument("--lenient", action="store_true",
                   help="ignore source entries with no destination")
    args = p.parse_args(argv)

    params, cfg = build_params(args)
    from videotgb_tpu.training.checkpoint import CheckpointConfig, CheckpointManager

    mgr = CheckpointManager(CheckpointConfig(directory=args.output))
    mgr.save(0, {"params": params})
    mgr.wait()
    print(f"converted checkpoint written to {args.output}")
    return args.output


if __name__ == "__main__":
    main()
