"""VideoTGB: the full long-video QA pipeline, end to end.

Wires RAFT -> TGB -> Gumbel span selection -> frame gather -> ViT -> Q-Former
-> LLM into one module, mirroring the reference's inference models
(reference: eval/utils/model.py LSTP :19 / LSTP_blip2 :238) and the
LightningModule forwards (src/models/LSTP_SF_blip2_module.py:123-377).
Submodule names mirror the reference attributes for checkpoint conversion:
``temporal_encoder`` (TGB), ``of_extractor`` (RAFT), ``model`` (backbone).

Generation is driven by free functions (generate_*) because the decode loop
threads KV caches through repeated ``apply`` calls; everything inside is
jit-compatible with static shapes:

  frames        (B, F=32, H, W, 3)   candidate frames (CLIP-normalized)
  flow          (B, L<=64, Hf, Wf, 2) precomputed or RAFT-online
  cand_index    (B, nframe)          fixed-size gather (ops.select)
  visual tokens (B, nframe*32, d) train / (B, 32, d) inference (mean-pooled)
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from videotgb_tpu.models.blip2 import Blip2Config, Blip2Model
from videotgb_tpu.models.instructblip import InstructBlipConfig, InstructBlipModel
from videotgb_tpu.models.raft import RAFT, RAFTConfig
from videotgb_tpu.models.tgb import TGBConfig, TGBModel
from videotgb_tpu.ops.decode import DecodeConfig, beam_search, decode
from videotgb_tpu.ops.select import gumbel_span_sample, select_frames_from_spans


@dataclasses.dataclass(frozen=True)
class VideoTGBConfig:
    backbone: str = "blip2"  # "blip2" | "instructblip"
    blip2: Blip2Config | None = Blip2Config()
    instructblip: InstructBlipConfig | None = None
    tgb: TGBConfig = TGBConfig()
    raft: RAFTConfig = RAFTConfig()
    nframe: int = 4
    num_frames: int = 32  # candidate frames
    top_k: int = 2
    gumbel_tau: float = 0.5

    @property
    def instruction_aware(self) -> bool:
        """True when the Q-Former reads instruction text (InstructBLIP-Vicuna
        or the instructblip_t5 variant) — THE single source for this
        predicate; don't re-derive it at call sites."""
        return (self.backbone == "instructblip"
                or (self.blip2 is not None and self.blip2.qformer_instruction))

    @classmethod
    def small(cls, backbone: str = "blip2") -> "VideoTGBConfig":
        """Flagship-shaped but depth/width-reduced: same tower structure,
        token counts, and selection pipeline as production, sized for
        single-chip compile checks and CPU-mesh dryruns."""
        from videotgb_tpu.models.qformer import QFormerConfig
        from videotgb_tpu.models.t5 import T5Config
        from videotgb_tpu.models.vit import ViTConfig
        from videotgb_tpu.models.tgb import TGBConfig
        from videotgb_tpu.models.llama import LlamaConfig
        from videotgb_tpu.models.raft import RAFTConfig

        vit = ViTConfig(image_size=224, patch_size=14, hidden_size=256,
                        num_layers=4, num_heads=8, intermediate_size=512)
        qf = QFormerConfig(hidden_size=256, num_layers=4, num_heads=8,
                           intermediate_size=512, num_query_tokens=32,
                           encoder_hidden_size=256)
        t5 = T5Config(d_model=256, d_kv=32, num_heads=8, d_ff=512,
                      num_encoder_layers=4, num_decoder_layers=4)
        llm = LlamaConfig(hidden_size=256, num_layers=4, num_heads=8,
                          intermediate_size=512)
        tgb = TGBConfig(hidden_size=256, num_layers=4, num_heads=8,
                        intermediate_size=512, fusion_layer=2,
                        encoder_width=256)
        instr_t5 = backbone == "instructblip_t5"
        if instr_t5:
            backbone = "blip2"
        return cls(
            backbone=backbone,
            blip2=Blip2Config(vit=vit, qformer=qf, t5=t5,
                              qformer_instruction=instr_t5)
            if backbone == "blip2" else None,
            instructblip=InstructBlipConfig(vit=vit, qformer=qf, llm=llm)
            if backbone == "instructblip" else None,
            tgb=tgb,
            raft=RAFTConfig(iters=4),
            nframe=4,
            num_frames=32,
        )

    @classmethod
    def flagship(cls, backbone: str = "blip2") -> "VideoTGBConfig":
        """Production scale: ViT-g + Q-Former + Flan-T5-xl (or Vicuna-7B) +
        TGB(BERT-base) + RAFT — the reference's released model sizes
        (README.md:159-161). backbone "instructblip_t5" =
        InstructBLIP-Flan-T5-xl: the T5 composition with the
        instruction-aware Q-Former (reference
        LSTP_SF_instructblipflant5xl_videoinstruct)."""
        if backbone == "instructblip_t5":
            return cls(backbone="blip2",
                       blip2=Blip2Config(qformer_instruction=True))
        return cls(
            backbone=backbone,
            blip2=Blip2Config() if backbone == "blip2" else None,
            instructblip=InstructBlipConfig()
            if backbone == "instructblip" else None,
        )

    @classmethod
    def tiny(cls, backbone: str = "blip2") -> "VideoTGBConfig":
        if backbone == "instructblip_t5":
            blip2, backbone = Blip2Config.tiny(qformer_instruction=True), "blip2"
        else:
            blip2 = Blip2Config.tiny() if backbone == "blip2" else None
        return cls(
            backbone=backbone,
            blip2=blip2,
            instructblip=(InstructBlipConfig.tiny()
                          if backbone == "instructblip" else None),
            tgb=TGBConfig.tiny(),
            raft=RAFTConfig.tiny(),
            nframe=2,
            num_frames=4,
        )


def bf16_param_config(cfg: VideoTGBConfig) -> VideoTGBConfig:
    """param_dtype=bf16 for the big towers (ViT/Q-Former/LM/TGB): params are
    CREATED bf16 at init — the flagship's f32 tree (16.3 GB) barely fits
    v5e HBM and an init-then-cast peaks above it. RAFT stays f32 (5.3M
    params; its instance norms are f32-sensitive). The reference serves bf16
    too (configs/experiment/*:24 precision: bf16)."""
    import dataclasses

    def rep(sub):
        return dataclasses.replace(sub, param_dtype=jnp.bfloat16)

    blip2 = cfg.blip2
    if blip2 is not None:
        blip2 = dataclasses.replace(
            blip2, vit=rep(blip2.vit), qformer=rep(blip2.qformer),
            t5=rep(blip2.t5))
    iblip = cfg.instructblip
    if iblip is not None:
        iblip = dataclasses.replace(
            iblip, vit=rep(iblip.vit), qformer=rep(iblip.qformer),
            llm=rep(iblip.llm))
    return dataclasses.replace(
        cfg, blip2=blip2, instructblip=iblip, tgb=rep(cfg.tgb))


class VideoTGB(nn.Module):
    config: VideoTGBConfig

    def setup(self) -> None:
        cfg = self.config
        self.temporal_encoder = TGBModel(cfg.tgb, name="temporal_encoder")
        self.of_extractor = RAFT(cfg.raft, name="of_extractor")
        if cfg.backbone == "blip2":
            self.model = Blip2Model(cfg.blip2, name="model")
        elif cfg.backbone == "instructblip":
            self.model = InstructBlipModel(cfg.instructblip, name="model")
        else:
            raise ValueError(cfg.backbone)

    # ------------------------------------------------------------- RAFT flow
    def compute_flow(self, flow_frames: jax.Array) -> jax.Array:
        """flow_frames (B, L, H, W, 3) in [0, 255] -> (B, L, H, W, 2).

        Pairwise flow between consecutive frames, last repeated so the count
        matches the frame count (eval/utils/model.py:294-303). Uses the
        shared-frame ``RAFT.consecutive`` path: the feature encoder runs once
        over the L unique frames instead of 2(L-1) pair images (bit-identical
        — instance norm is per-image).
        """
        flow = self.of_extractor.consecutive(flow_frames)
        return jnp.concatenate([flow, flow[:, -1:]], axis=1)

    def flow_features(self, flow_frames: jax.Array) -> jax.Array:
        """(B, L+1, H, W, 3) RGB in [0, 255] -> (B, L, H, W, 2) TGB input.

        All L real consecutive pairs, aligned of[i] = flow(i -> i+1) like the
        reference (eval/utils/model.py:294-303 — its of[i]=flow(i->i+1) with a
        duplicated last entry; with L+1 decoded frames every entry is a real
        pair), then per-clip max-radius normalization
        (videoinstruct_dataset.py:211-226).
        """
        flow = self.compute_flow(flow_frames)[:, :-1]
        rad = jnp.sqrt(jnp.sum(flow ** 2, axis=-1))
        rad_max = jnp.max(rad, axis=(1, 2, 3), keepdims=True)[..., None]
        return flow / (rad_max + 1e-5)

    def flow_features_timeline(
        self, flow_frames: jax.Array, valid: jax.Array
    ) -> jax.Array:
        """Whole-timeline eval flow: (B, L, H, W, 3) ~1 fps decoded frames
        (possibly pad-extended) -> (B, L, h, w, 2) TGB input.

        The reference's inference path has exactly L decoded flow frames, so
        it takes the L-1 consecutive pairs and repeats the last flow
        (eval/utils/model.py:294-303); ``valid`` (B, L) masks pad frames out
        of the max-radius normalization (videoinstruct_dataset.py:211-226) so
        padding never rescales the real flow.
        """
        flow = self.compute_flow(flow_frames)  # (B, L, h, w, 2), last dup
        rad = jnp.sqrt(jnp.sum(flow ** 2, axis=-1))
        rad = rad * valid[:, :, None, None].astype(rad.dtype)
        rad_max = jnp.max(rad, axis=(1, 2, 3), keepdims=True)[..., None]
        return flow / (rad_max + 1e-5)

    # ----------------------------------------------------------------- TGB
    def span_logits(
        self,
        flow: jax.Array,
        flow_mask: jax.Array,
        question_ids: jax.Array,
        question_mask: jax.Array,
        mode: str = "fusion",
        deterministic: bool = True,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        feat, logits = self.temporal_encoder(
            flow, flow_mask, question_ids, question_mask,
            mode=mode, deterministic=deterministic,
        )
        return feat, logits[..., 0], logits[..., 1]

    # ------------------------------------------------------------- selection
    def select_frames(
        self,
        start_logits: jax.Array,
        end_logits: jax.Array,
        video_length: jax.Array,
        key: jax.Array,
        inclusive_end: bool = True,
        rescale: str = "minus1",
    ) -> jax.Array:
        """``rescale``: "minus1" = BLIP2/SF rule int(i*(F-1)/(L-1)),
        "ratio" = Vicuna rule int(i/L*F) (see ops.select)."""
        cfg = self.config
        starts, ends = gumbel_span_sample(
            start_logits, end_logits, key, cfg.top_k, cfg.gumbel_tau
        )
        return select_frames_from_spans(
            starts, ends, video_length, cfg.num_frames, cfg.nframe,
            inclusive_end=inclusive_end, rescale=rescale,
        )

    # ------------------------------------------------- backbone entry points
    def encode_selected(
        self,
        frames: jax.Array,  # (B, F, H, W, 3)
        cand_index: jax.Array,  # (B, nframe)
        mean_pool: bool = False,
        qformer_input_ids: jax.Array | None = None,
        qformer_attention_mask: jax.Array | None = None,
    ) -> jax.Array:
        """Gather selected frames and run ViT + Q-Former (+projection)."""
        cfg = self.config
        b = frames.shape[0]
        sel = jnp.take_along_axis(
            frames, cand_index[:, :, None, None, None], axis=1
        )  # (B, nframe, H, W, 3)
        flat = sel.reshape(b * cfg.nframe, *frames.shape[2:])
        kwargs = {}
        if cfg.instruction_aware and qformer_input_ids is not None:
            kwargs = dict(
                qformer_input_ids=jnp.repeat(qformer_input_ids, cfg.nframe, 0),
                qformer_attention_mask=(
                    jnp.repeat(qformer_attention_mask, cfg.nframe, 0)
                    if qformer_attention_mask is not None else None),
            )
        visual = self.model.encode_frames(
            flat, mean_pool_groups=b if mean_pool else None, **kwargs
        )
        if not mean_pool:
            visual = visual.reshape(b, cfg.nframe * visual.shape[1], -1)
        return visual

    def prepare_t5_inference(
        self,
        frames: jax.Array,
        flow: jax.Array,
        flow_mask: jax.Array,
        video_length: jax.Array,
        sampler_question_ids: jax.Array,
        sampler_question_mask: jax.Array,
        question_ids: jax.Array,
        question_mask: jax.Array,
        key: jax.Array,
        qformer_input_ids: jax.Array | None = None,
        qformer_attention_mask: jax.Array | None = None,
        mean_pool: bool = True,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Full BLIP2 inference prefix: TGB -> select -> ViT/Q-Former -> T5
        encoder. Returns (enc_hidden, enc_mask, cand_index).
        ``qformer_input_ids`` serve the instruction-aware InstructBLIP-Flan-T5
        variant (cfg.blip2.qformer_instruction). ``mean_pool=True`` is the
        standalone-wrapper packing (32 pooled tokens,
        eval/utils/model.py:393-398); ``False`` is the training modules'
        eval_forward packing (nframe*32 full tokens,
        LSTP_SF_blip2_module.py:478-486)."""
        _, start_logits, end_logits = self.span_logits(
            flow, flow_mask, sampler_question_ids, sampler_question_mask, "fusion"
        )
        cand = self.select_frames(start_logits, end_logits, video_length, key,
                                  inclusive_end=False)
        visual = self.encode_selected(
            frames, cand, mean_pool=mean_pool,
            qformer_input_ids=qformer_input_ids,
            qformer_attention_mask=qformer_attention_mask)
        embeds, mask = self.model.encoder_inputs(visual, question_ids, question_mask)
        enc_hidden = self.model.language_model.encode(embeds, mask)
        return enc_hidden, mask, cand

    def init_pipeline(
        self,
        frames: jax.Array,
        flow: jax.Array,
        flow_mask: jax.Array,
        video_length: jax.Array,
        sampler_question_ids: jax.Array,
        sampler_question_mask: jax.Array,
        question_ids: jax.Array,
        question_mask: jax.Array,
        key: jax.Array,
    ) -> jax.Array:
        """Touches every submodule so ``model.init(..., method=init_pipeline)``
        creates the complete parameter tree (encoder AND decoder AND RAFT) —
        flax creates params lazily per called module."""
        if self.config.backbone == "blip2":
            # the instruction-aware variant must create the qformer's text
            # params at init (flax lazy creation)
            qf_kwargs = {}
            if self.config.blip2.qformer_instruction:
                qf_kwargs = dict(qformer_input_ids=sampler_question_ids,
                                 qformer_attention_mask=sampler_question_mask)
            enc_hidden, enc_mask, cand = self.prepare_t5_inference(
                frames, flow, flow_mask, video_length,
                sampler_question_ids, sampler_question_mask,
                question_ids, question_mask, key, **qf_kwargs,
            )
            b = enc_hidden.shape[0]
            caches = self.init_t5_caches(b, 4, enc_hidden.shape[1])
            start = jnp.zeros((b, 1), jnp.int32)
            valid = jnp.ones((b, 4), jnp.float32)
            logits, _ = self.t5_decode_step(
                start, enc_hidden, enc_mask, caches, jnp.int32(0), valid, True
            )
            # fusion mode touches TGB layers [fusion:N) only; one multi_modal
            # pass creates the early layers too so any mode can apply later
            _ = self.span_logits(
                flow[:1], flow_mask[:1], sampler_question_ids[:1],
                sampler_question_mask[:1], "multi_modal",
            )
        else:
            embeds, mask, cand = self.prepare_llama_inference(
                frames, flow, flow_mask, video_length,
                sampler_question_ids, sampler_question_mask,
                question_ids, question_mask, key,
                qformer_input_ids=question_ids,
                qformer_attention_mask=question_mask,
            )
            b, s = embeds.shape[:2]
            caches = self.init_llama_caches(b, s + 2)
            valid = jnp.concatenate(
                [mask.astype(jnp.float32), jnp.zeros((b, 2))], axis=1)
            logits, _ = self.llama_step(
                inputs_embeds=embeds, caches=caches, cache_index=jnp.int32(0),
                cache_positions_valid=valid,
            )
        # RAFT params (online-flow path); 64px so the 4-level corr pyramid
        # stays non-degenerate (stride-8 fmap 8x8 -> 1x1 at level 3)
        tiny = jnp.zeros((1, 2, 64, 64, 3))
        _ = self.compute_flow(tiny)
        # the fork's reserved flow projection (xblip2.py:1551 /
        # xinstructblip.py:1268, Linear(qformer_hidden -> lm_hidden)): dead
        # in every forward path but part of the released checkpoint — touch
        # it so the param tree has a destination for conversion
        bcfg = (self.config.blip2 if self.config.backbone == "blip2"
                else self.config.instructblip)
        _ = self.model.temporal_projection(
            jnp.zeros((1, bcfg.qformer.hidden_size)))
        return logits

    def prepare_llama_inference(
        self,
        frames: jax.Array,
        flow: jax.Array,
        flow_mask: jax.Array,
        video_length: jax.Array,
        sampler_question_ids: jax.Array,
        sampler_question_mask: jax.Array,
        prompt_ids: jax.Array,
        prompt_mask: jax.Array,
        key: jax.Array,
        qformer_input_ids: jax.Array | None = None,
        qformer_attention_mask: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Vicuna inference prefix (eval/utils/model.py:19-237): TGB in
        multi_modal mode -> exclusive-end selection -> instruction-aware
        Q-Former mean-pooled to 32 tokens -> [visual | prompt] embeddings.
        Returns (embeds (B, 32+Tq, d), mask, cand_index)."""
        _, start_logits, end_logits = self.span_logits(
            flow, flow_mask, sampler_question_ids, sampler_question_mask,
            "multi_modal",
        )
        # the Vicuna family rescales spans with int(i/L*F), NOT the BLIP2
        # int(i*(F-1)/(L-1)) rule (eval/utils/model.py:135 vs :350)
        cand = self.select_frames(start_logits, end_logits, video_length, key,
                                  inclusive_end=False, rescale="ratio")
        visual = self.encode_selected(
            frames, cand, mean_pool=True,
            qformer_input_ids=qformer_input_ids,
            qformer_attention_mask=qformer_attention_mask,
        )
        text_emb = self.model.language_model.embed(prompt_ids)
        embeds = jnp.concatenate([visual.astype(text_emb.dtype), text_emb], 1)
        vis_mask = jnp.ones(visual.shape[:2], prompt_mask.dtype)
        mask = jnp.concatenate([vis_mask, prompt_mask], axis=1)
        return embeds, mask, cand

    def llama_step(self, tokens=None, inputs_embeds=None, positions=None,
                   caches=None, cache_index=None, cache_positions_valid=None):
        logits, caches = self.model.language_model(
            input_ids=tokens, inputs_embeds=inputs_embeds, positions=positions,
            caches=caches, cache_index=cache_index,
            cache_positions_valid=cache_positions_valid,
        )
        return logits, caches

    def init_llama_caches(self, batch: int, max_len: int):
        return self.model.language_model.init_caches(batch, max_len)

    def t5_decode_step(self, tokens, enc_hidden, enc_mask, caches, index,
                       cache_positions_valid, cross_prefill: bool = False):
        logits, caches = self.model.language_model.decode(
            tokens, enc_hidden, enc_mask,
            caches=caches, cache_index=index,
            cache_positions_valid=cache_positions_valid,
            cross_prefill=cross_prefill,
        )
        return logits[:, -1], caches

    def init_t5_caches(self, batch: int, max_len: int, encoder_len: int):
        return self.model.language_model.init_caches(batch, max_len, encoder_len)


# ----------------------------------------------------------------- generate
def generate_blip2(
    model: VideoTGB,
    params: Any,
    batch: dict[str, jax.Array],
    decode_config: DecodeConfig,
    key: jax.Array,
    stop_sequences: tuple[tuple[int, ...], ...] = (),
    mean_pool: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Batched BLIP2-Flan-T5 QA generation (the BASELINE inference path,
    eval/utils/model.py:266-441). Returns (token_ids (B, T), cand_index).
    ``mean_pool=False`` reproduces the training modules' eval_forward visual
    packing instead (nframe*32 tokens, LSTP_SF_blip2_module.py:478-486).

    lax.while_loop traces the step once, so the cross-K/V prefill (which
    must happen exactly once) runs as one explicit step for token 0; the
    loop handles step 0 by replaying those cached logits via lax.cond.
    """
    cfg = model.config
    sel_key, decode_key = jax.random.split(key)
    enc_hidden, enc_mask, cand = model.apply(
        params, batch["frames"], batch["flow"], batch["flow_mask"],
        batch["video_length"], batch["sampler_question_ids"],
        batch["sampler_question_mask"], batch["question_ids"],
        batch["question_mask"], sel_key,
        qformer_input_ids=(batch.get("qformer_input_ids")
                           if cfg.instruction_aware else None),
        qformer_attention_mask=(batch.get("qformer_attention_mask")
                                if cfg.instruction_aware else None),
        mean_pool=mean_pool,
        method=model.prepare_t5_inference,
    )
    out = t5_generate_from_encoder(model, params, enc_hidden, enc_mask,
                                   decode_config, decode_key, stop_sequences)
    return out, cand


def t5_generate_from_encoder(
    model: VideoTGB,
    params: Any,
    enc_hidden: jax.Array,
    enc_mask: jax.Array,
    decode_config: DecodeConfig,
    decode_key: jax.Array,
    stop_sequences: tuple[tuple[int, ...], ...] = (),
) -> jax.Array:
    """Greedy/sample/beam T5 decode given a computed encoder state."""
    cfg = model.config
    b = enc_hidden.shape[0]
    t5cfg = cfg.blip2.t5
    beams = decode_config.num_beams
    max_new = decode_config.max_new_tokens

    if beams > 1:
        enc_hidden = jnp.repeat(enc_hidden, beams, axis=0)
        enc_mask = jnp.repeat(enc_mask, beams, axis=0)
    bk = enc_hidden.shape[0]

    def valid_mask(index):
        return jnp.broadcast_to(
            (jnp.arange(max_new)[None] <= index).astype(jnp.float32), (bk, max_new)
        )

    caches = model.apply(params, bk, max_new, enc_hidden.shape[1],
                         method=model.init_t5_caches)
    start = jnp.full((b,), t5cfg.decoder_start_token_id, jnp.int32)
    start_bk = jnp.repeat(start, beams) if beams > 1 else start

    # explicit prefill: writes token-0 self K/V and all cross K/V
    logits0, caches = model.apply(
        params, start_bk[:, None], enc_hidden, enc_mask, caches, jnp.int32(0),
        valid_mask(0), True, method=model.t5_decode_step,
    )

    def loop_step(tokens, caches, index):
        return model.apply(
            params, tokens, enc_hidden, enc_mask, caches, index,
            valid_mask(index), False, method=model.t5_decode_step,
        )

    def step_fn(tokens, caches, index):
        return jax.lax.cond(
            index == 0,
            lambda: (logits0.astype(jnp.float32), caches),
            lambda: loop_step(tokens, caches, index),
        )

    if beams > 1:
        cache_axis = 1 if cfg.blip2.t5.scan_layers else 0
        return beam_search(step_fn, caches, start, decode_config,
                           cache_batch_axis=cache_axis)
    return decode(step_fn, caches, start, decode_config, key=decode_key,
                  stop_sequences=stop_sequences)


# ------------------------------------------- two-phase (bandwidth-aware) mode
def select_phase_blip2(
    model: VideoTGB,
    params: Any,
    flow_rgb_u8: jax.Array,  # (B, L+1, Hf, Wf, 3) uint8 flow frames
    batch: dict[str, jax.Array],
    key: jax.Array,
    mode: str = "fusion",
    rescale: str = "minus1",
) -> jax.Array:
    """Phase 1 of the low-host-bandwidth serving split: RAFT + TGB + Gumbel
    selection on device from the (small) flow frames only. The host ships
    ~0.8 MB/clip here, fetches the (B, nframe) indices, then ships only the
    selected candidate frames to :func:`answer_phase_blip2` — the full
    32-frame slab never crosses the host link. ``mode`` is "fusion" for the
    T5 backbones, "multi_modal" for Vicuna (eval/utils/model.py:92-100 vs
    :306-314); ``rescale`` is "minus1" for T5, "ratio" for Vicuna
    (eval/utils/model.py:350 vs :135)."""
    flow = model.apply(params, flow_rgb_u8.astype(jnp.float32),
                       method=model.flow_features)
    _, sl, el = model.apply(
        params, flow, batch["flow_mask"], batch["sampler_question_ids"],
        batch["sampler_question_mask"], mode, method=model.span_logits)
    return model.apply(params, sl, el, batch["video_length"], key,
                       inclusive_end=False, rescale=rescale,
                       method=model.select_frames)


def answer_phase_blip2(
    model: VideoTGB,
    params: Any,
    selected_frames_u8: jax.Array,  # (B, nframe, H, W, 3) uint8 RGB
    batch: dict[str, jax.Array],
    decode_config: DecodeConfig,
    key: jax.Array,
) -> jax.Array:
    """Phase 2: CLIP normalization on device, ViT -> Q-Former (mean pooled)
    -> T5 encode + decode."""
    from videotgb_tpu.data.constants import CLIP_MEAN, CLIP_STD

    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    frames = (selected_frames_u8.astype(jnp.float32) / 255.0 - mean) / std
    b, nf = frames.shape[:2]
    qf_ids = qf_mask = None
    if model.config.instruction_aware:  # instructblip_t5 two-phase serving
        qf_ids = batch.get("qformer_input_ids")
        qf_mask = batch.get("qformer_attention_mask")
        if qf_ids is not None:
            qf_ids = jnp.repeat(qf_ids, nf, axis=0)
            qf_mask = (jnp.repeat(qf_mask, nf, axis=0)
                       if qf_mask is not None else None)
    visual = model.apply(
        params, frames.reshape(b * nf, *frames.shape[2:]), b, qf_ids, qf_mask,
        method=_encode_frames_pool_method)
    embeds, mask = model.apply(params, visual, batch["question_ids"],
                               batch["question_mask"],
                               method=_encoder_inputs_method)
    enc_hidden = model.apply(params, embeds, mask, method=_t5_encode_method)
    return t5_generate_from_encoder(model, params, enc_hidden, mask,
                                    decode_config, key)


def answer_phase_instructblip(
    model: VideoTGB,
    params: Any,
    selected_frames_u8: jax.Array,  # (B, nframe, H, W, 3) uint8 RGB
    batch: dict[str, jax.Array],
    decode_config: DecodeConfig,
    key: jax.Array,
    stop_sequences: tuple[tuple[int, ...], ...] = (),
) -> jax.Array:
    """Phase 2 for the Vicuna backbone: CLIP normalization on device,
    instruction-aware Q-Former mean-pooled to 32 tokens, [visual | prompt]
    embeddings, decoder-only generate (eval/utils/model.py:186-231)."""
    from videotgb_tpu.data.constants import CLIP_MEAN, CLIP_STD

    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    frames = (selected_frames_u8.astype(jnp.float32) / 255.0 - mean) / std
    b, nf = frames.shape[:2]
    qf_ids = batch.get("qformer_input_ids")
    qf_mask = batch.get("qformer_attention_mask")
    if qf_ids is not None:
        qf_ids = jnp.repeat(qf_ids, nf, axis=0)
        qf_mask = (jnp.repeat(qf_mask, nf, axis=0)
                   if qf_mask is not None else None)
    visual = model.apply(
        params, frames.reshape(b * nf, *frames.shape[2:]), b, qf_ids, qf_mask,
        method=_encode_frames_pool_method)
    text_emb = model.apply(params, batch["question_ids"],
                           method=_llama_embed_method)
    embeds = jnp.concatenate([visual.astype(text_emb.dtype), text_emb], 1)
    vis_mask = jnp.ones(visual.shape[:2], batch["question_mask"].dtype)
    mask = jnp.concatenate([vis_mask, batch["question_mask"]], axis=1)
    return llama_generate_from_embeds(model, params, embeds, mask,
                                      decode_config, key, stop_sequences)


def generate_iv(
    model: VideoTGB,
    params: Any,
    batch: dict[str, jax.Array],
    decode_config: DecodeConfig,
    key: jax.Array,
    stop_sequences: tuple[tuple[int, ...], ...] = (),
) -> jax.Array:
    """Stage-3 IV/IVT generation: frames arrive pre-selected and
    CLIP-normalized from collate_iv (no RAFT/TGB selection in the graph) and
    mean-pool to the 32-token visual prefix; text-only rows (widths == 0)
    mask the prefix out of attention — the generate analogue of the IV
    modules' eval path (reference LSTP_Blip2_IV_module.py:222-232 mean-pool,
    ivtinstruct width-0 text rows). Returns token_ids (B, max_new)."""
    cfg = model.config
    frames = batch["frames"]
    b, nf = frames.shape[:2]
    vis_valid = None
    if "widths" in batch:
        vis_valid = (batch["widths"] > 0).astype(jnp.float32)
    qf_ids = qf_mask = None
    if cfg.instruction_aware:
        qf_ids = batch.get("qformer_input_ids")
        qf_mask = batch.get("qformer_attention_mask")
        if qf_ids is not None:
            qf_ids = jnp.repeat(qf_ids, nf, axis=0)
            qf_mask = (jnp.repeat(qf_mask, nf, axis=0)
                       if qf_mask is not None else None)
    visual = model.apply(
        params, frames.reshape(b * nf, *frames.shape[2:]), b, qf_ids, qf_mask,
        method=_encode_frames_pool_method)
    nv = visual.shape[1]
    if cfg.backbone == "blip2":
        embeds, mask = model.apply(params, visual, batch["question_ids"],
                                   batch["question_mask"],
                                   method=_encoder_inputs_method)
        if vis_valid is not None:
            mask = jnp.concatenate(
                [mask[:, :nv] * vis_valid[:, None].astype(mask.dtype),
                 mask[:, nv:]], axis=1)
        enc_hidden = model.apply(params, embeds, mask,
                                 method=_t5_encode_method)
        return t5_generate_from_encoder(model, params, enc_hidden, mask,
                                        decode_config, key, stop_sequences)
    text_emb = model.apply(params, batch["question_ids"],
                           method=_llama_embed_method)
    embeds = jnp.concatenate([visual.astype(text_emb.dtype), text_emb], 1)
    vis_mask = jnp.ones((b, nv), batch["question_mask"].dtype)
    if vis_valid is not None:
        vis_mask = vis_mask * vis_valid[:, None].astype(vis_mask.dtype)
    mask = jnp.concatenate([vis_mask, batch["question_mask"]], axis=1)
    return llama_generate_from_embeds(model, params, embeds, mask,
                                      decode_config, key, stop_sequences)


def _llama_embed_method(mdl: VideoTGB, ids):
    return mdl.model.language_model.embed(ids)


def _encode_frames_pool_method(mdl: VideoTGB, flat, groups, qf_ids=None,
                               qf_mask=None):
    return mdl.model.encode_frames(flat, mean_pool_groups=groups,
                                   qformer_input_ids=qf_ids,
                                   qformer_attention_mask=qf_mask)


def _encoder_inputs_method(mdl: VideoTGB, visual, q_ids, q_mask):
    return mdl.model.encoder_inputs(visual, q_ids, q_mask)


def _t5_encode_method(mdl: VideoTGB, embeds, mask):
    return mdl.model.language_model.encode(embeds, mask)


def generate_instructblip(
    model: VideoTGB,
    params: Any,
    batch: dict[str, jax.Array],
    decode_config: DecodeConfig,
    key: jax.Array,
    stop_sequences: tuple[tuple[int, ...], ...] = (),
) -> tuple[jax.Array, jax.Array]:
    """Batched InstructBLIP-Vicuna QA generation (the decoder-only BASELINE
    path, eval/utils/model.py:47-237). Right-padded prompts are handled with
    per-sample cumulative positions; generated tokens append after the padded
    prompt buffer with per-sample RoPE positions continuing from each true
    length. Returns (token_ids (B, max_new), cand_index)."""
    sel_key, decode_key = jax.random.split(key)
    embeds, mask, cand = model.apply(
        params, batch["frames"], batch["flow"], batch["flow_mask"],
        batch["video_length"], batch["sampler_question_ids"],
        batch["sampler_question_mask"], batch["question_ids"],
        batch["question_mask"], sel_key,
        qformer_input_ids=batch.get("qformer_input_ids"),
        qformer_attention_mask=batch.get("qformer_attention_mask"),
        method=model.prepare_llama_inference,
    )
    out = llama_generate_from_embeds(model, params, embeds, mask,
                                     decode_config, decode_key, stop_sequences)
    return out, cand


def llama_generate_from_embeds(
    model: VideoTGB,
    params: Any,
    embeds: jax.Array,  # (B, S, d) [visual | prompt] right-padded
    mask: jax.Array,  # (B, S)
    decode_config: DecodeConfig,
    decode_key: jax.Array,
    stop_sequences: tuple[tuple[int, ...], ...] = (),
) -> jax.Array:
    """Greedy/sample/beam LLaMA decode given a packed prefix: the shared
    core of generate_instructblip and the SF per-frame pseudo-label pass."""
    b_orig = embeds.shape[0]
    beams = decode_config.num_beams
    if beams > 1:
        embeds = jnp.repeat(embeds, beams, axis=0)
        mask = jnp.repeat(mask, beams, axis=0)
    b, s = embeds.shape[:2]
    max_new = decode_config.max_new_tokens
    total = s + max_new

    mask_f = mask.astype(jnp.float32)
    lengths = jnp.sum(mask_f, axis=1).astype(jnp.int32)  # (B,)
    prompt_pos = jnp.clip(jnp.cumsum(mask_f, axis=1).astype(jnp.int32) - 1, 0)

    caches = model.apply(params, b, total, method=model.init_llama_caches)
    valid_prefill = jnp.concatenate(
        [mask_f, jnp.zeros((b, max_new), jnp.float32)], axis=1)
    logits_p, caches = model.apply(
        params, inputs_embeds=embeds, positions=prompt_pos, caches=caches,
        cache_index=jnp.int32(0), cache_positions_valid=valid_prefill,
        method=model.llama_step,
    )
    first_logits = logits_p[jnp.arange(b), lengths - 1]  # (B, V)

    def loop_step(tokens, caches, t):
        # token sampled at step t-1 is written at buffer slot s + (t-1)
        buffer_index = s + t - 1
        positions = (lengths + t - 1)[:, None]
        decode_valid = (jnp.arange(max_new)[None, :] <= (t - 1)).astype(jnp.float32)
        valid = jnp.concatenate(
            [mask_f, jnp.broadcast_to(decode_valid, (b, max_new))], axis=1)
        logits, new_caches = model.apply(
            params, tokens=tokens, positions=positions, caches=caches,
            cache_index=buffer_index, cache_positions_valid=valid,
            method=model.llama_step,
        )
        return logits[:, -1], new_caches

    def step_fn(tokens, caches, t):
        return jax.lax.cond(
            t == 0,
            lambda: (first_logits.astype(jnp.float32), caches),
            lambda: loop_step(tokens, caches, t),
        )

    if beams > 1:
        llm_cfg = model.config.instructblip.llm
        cache_axis = 1 if llm_cfg.scan_layers else 0
        # transformers >= 4.33 normalizes decoder-only beam scores by
        # generated length only (score / (cur_len + 1 - decoder_prompt_len)),
        # i.e. the same offset-1 semantics as the encoder-decoder path — the
        # old full-input_ids normalization was removed upstream
        out = beam_search(step_fn, caches, jnp.zeros((b_orig,), jnp.int32),
                          decode_config, cache_batch_axis=cache_axis,
                          penalty_length_offset=1)
    else:
        start = jnp.zeros((b,), jnp.int32)  # placeholder; cond replays t=0
        out = decode(step_fn, caches, start, decode_config, key=decode_key,
                     stop_sequences=stop_sequences)
    return out
