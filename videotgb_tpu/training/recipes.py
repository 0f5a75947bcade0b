"""Training recipes: the four LSTP training stages as pure loss functions.

One recipe per reference LightningModule family (SURVEY.md section 2.2):

  TG  — stage 2: train the TGB alone with span CE against precomputed
        pseudo-label spans (reference: src/models/LSTP_TG_blip2_module.py:244-273)
  SF  — end-to-end self-refinement: pseudo labels are distilled from the
        frozen MLLM every step (per-frame generate -> rouge_n -> monotone-stack
        span), then joint lm_loss + mrc_loss with Gumbel frame selection
        (reference: src/models/LSTP_SF_blip2_module.py:123-377,554)
  IV  — stage 3: frames pre-selected by the data layer, train Q-Former (+
        projection) with the mean-pooled 32-token visual prefix
        (reference: src/models/LSTP_Blip2_IV_module.py:222-232,560-568)
  IVT — stage 3 + LoRA adapters on the LLM, mixed image/video/text batches
        (reference: src/models/LSTP_Blip2_IVT_module.py:184-188)

The SF pseudo-label pass is phase-split (SURVEY.md section 7.3 item 1): the
jitted generation produces token ids, the host scores them with rouge_n
(a string metric), and the jitted loss step consumes the scores — mirroring
how the reference itself escaped this cost with its staged pipeline.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from videotgb_tpu.models.videotgb import VideoTGB
from videotgb_tpu.ops.span import largest_rectangle_span, rescale_index
from videotgb_tpu.training.optim import path_freeze_filter


def span_ce_loss(
    start_logits: jax.Array,  # (B, L)
    end_logits: jax.Array,
    start_targets: jax.Array,  # (B,)
    end_targets: jax.Array,
) -> jax.Array:
    """(CE(start) + CE(end)) / 2 with ignore_index == L: targets are clamped
    into [0, L] and index L (one past the end) contributes zero loss —
    the reference's CrossEntropyLoss(ignore_index=L) trick
    (LSTP_SF_blip2_module.py:241-253)."""
    l = start_logits.shape[1]

    def one(logits, targets):
        targets = jnp.clip(targets, 0, l)
        valid = targets < l
        safe = jnp.where(valid, targets, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
        return jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(jnp.sum(valid), 1)

    return 0.5 * (one(start_logits, start_targets) + one(end_logits, end_targets))


# ------------------------------------------------------------------ TG stage
@dataclasses.dataclass(frozen=True)
class TGRecipe:
    """Trains temporal_encoder only; backbone held but out of the loss path."""

    mode: str = "fusion"

    @property
    def filter_fn(self) -> Callable:
        return path_freeze_filter(train_prefixes=("temporal_encoder",))

    def loss_fn(
        self, model: VideoTGB, params: Any, batch: dict, key: jax.Array,
        deterministic: bool = False,
    ) -> tuple[jax.Array, dict]:
        """``deterministic=True`` disables dropout — validation/test must run
        in eval mode like the reference's Lightning hooks (ADVICE r1)."""
        variables = params if "params" in params else {"params": params}
        _, start_logits, end_logits = model.apply(
            variables, batch["flow"], batch["flow_mask"],
            batch["sampler_question_ids"], batch["sampler_question_mask"],
            mode=self.mode, deterministic=deterministic,
            rngs=None if deterministic else {"dropout": key},
            method=model.span_logits,
        )
        loss = span_ce_loss(start_logits, end_logits,
                            batch["starts"], batch["ends"])
        return loss, {
            "loss": loss,
            "start_logits": start_logits,
            "end_logits": end_logits,
        }


# ------------------------------------------------------------------ SF stage
@dataclasses.dataclass(frozen=True)
class SFRecipe:
    """Self-refinement: scores (B, F) from the host-side pseudo-label pass
    feed the jitted joint loss. Freezes the vision tower only
    (LSTP_SF_blip2_module.py:663-668). ``online_flow=True`` gives the
    LSTP_SF_small recipe (RAFT in the step)."""

    mode: str = "fusion"
    online_flow: bool = False

    @property
    def filter_fn(self) -> Callable:
        return path_freeze_filter(freeze_prefixes=("model/vision_model",
                                                   "of_extractor"))

    def loss_fn(
        self, model: VideoTGB, params: Any, batch: dict, key: jax.Array,
        deterministic: bool = False,
    ) -> tuple[jax.Array, dict]:
        variables = params if "params" in params else {"params": params}
        drop_key, sel_key = jax.random.split(key)
        nframe = model.config.nframe
        num_frames = model.config.num_frames

        if self.online_flow:
            # LSTP_SF_small variant: RAFT inside the step instead of
            # precomputed .npy flow (LSTP_SF_small_module.py:130-139);
            # batch["flow_frames"] (B, L+1, H, W, 3) raw RGB in [0, 255]
            flow = model.apply(variables, batch["flow_frames"],
                               method=model.flow_features)
            batch = dict(batch)
            batch["flow"] = jax.lax.stop_gradient(flow)

        # 1) pseudo span from the (host-provided) per-frame scores
        starts_f, ends_f = largest_rectangle_span(batch["scores"])  # 32-frame dom.
        flow_len = batch["video_length"]
        start_targets = rescale_index(starts_f, num_frames, flow_len)
        end_targets = rescale_index(ends_f, num_frames, flow_len)

        # 2) TGB span loss
        _, start_logits, end_logits = model.apply(
            variables, batch["flow"], batch["flow_mask"],
            batch["sampler_question_ids"], batch["sampler_question_mask"],
            mode=self.mode, deterministic=deterministic,
            rngs=None if deterministic else {"dropout": drop_key},
            method=model.span_logits,
        )
        mrc_loss = span_ce_loss(start_logits, end_logits,
                                start_targets, end_targets)

        # 3) Gumbel top-k span -> fixed-size frame gather (stop-gradient:
        #    selection trains the TGB only through mrc_loss, as in the ref)
        cand = model.apply(
            variables, jax.lax.stop_gradient(start_logits),
            jax.lax.stop_gradient(end_logits),
            flow_len, sel_key, method=model.select_frames,
        )

        # 4) backbone LM loss on the selected frames
        sel = jnp.take_along_axis(
            batch["frames"], cand[:, :, None, None, None], axis=1
        )
        lm_loss, logits = _backbone_forward(model, variables, sel, batch)
        loss = lm_loss + mrc_loss
        return loss, {
            "loss": loss, "lm_loss": lm_loss, "mrc_loss": mrc_loss,
            "start_targets": start_targets, "end_targets": end_targets,
            "cand": cand,
        }


# ----------------------------------------------------------------- E2E stage
@dataclasses.dataclass(frozen=True)
class E2ERecipe:
    """End-to-end training with TGB inference-style sampling and no
    pseudo-label loss — the LSTPModule family (reference:
    src/models/LSTP_module.py:205-213 multi_modal TGB call,
    LSTP_blip2_module.py): frames are selected by the current TGB (Gumbel,
    stop-gradient) and only the LM loss backpropagates; RAFT / ViT / LLM are
    frozen, TGB + Q-Former (+projection) train (LSTP_module.py:669-675).

    Selection semantics follow the reference modules exactly.
    ``selection="tgb"`` is the live Vicuna path (LSTP_module.py:235-246):
    Gumbel spans scored against ``video_length = num_frames + 2``, the ratio
    rescale int(i/L*F), exclusive span ends. ``selection="uniform"`` is
    LSTP_blip2_module.py:253, where the span code is commented out and the
    shipped BLIP2 e2e recipe uniformly midpoint-samples all num_frames
    candidates (the "uniform for baseline" branch)."""

    mode: str = "multi_modal"
    selection: str = "tgb"  # "tgb" (LSTP_module) | "uniform" (LSTP_blip2_module)

    @property
    def filter_fn(self) -> Callable:
        return path_freeze_filter(
            freeze_prefixes=("of_extractor", "model/vision_model",
                             "model/language_model"))

    def loss_fn(
        self, model: VideoTGB, params: Any, batch: dict, key: jax.Array,
        deterministic: bool = False,
    ) -> tuple[jax.Array, dict]:
        variables = params if "params" in params else {"params": params}
        drop_key, sel_key = jax.random.split(key)
        if self.selection == "uniform":
            # LSTP_blip2_module.py:185-253 — the TGB/flow path is commented
            # out in the reference module; frames are a uniform midpoint
            # subsample of all num_frames candidates
            b = batch["frames"].shape[0]
            f, nf = model.config.num_frames, model.config.nframe
            intv = np.linspace(0, f, nf + 1).astype(int)
            idx = [(intv[x] + intv[x + 1] - 1) // 2 for x in range(nf)]
            cand = jnp.broadcast_to(jnp.asarray(idx, jnp.int32), (b, nf))
            start_logits = end_logits = None
        else:
            _, start_logits, end_logits = model.apply(
                variables, batch["flow"], batch["flow_mask"],
                batch["sampler_question_ids"], batch["sampler_question_mask"],
                mode=self.mode, deterministic=deterministic,
                rngs=None if deterministic else {"dropout": drop_key},
                method=model.span_logits,
            )
            # LSTP_module.py:235-246: video_length = num_frames + 2, ratio
            # rescale, exclusive span ends
            vlen = jnp.full_like(batch["video_length"],
                                 model.config.num_frames + 2)
            cand = model.apply(
                variables, jax.lax.stop_gradient(start_logits),
                jax.lax.stop_gradient(end_logits),
                vlen, sel_key, inclusive_end=False, rescale="ratio",
                method=model.select_frames,
            )
        sel = jnp.take_along_axis(
            batch["frames"], cand[:, :, None, None, None], axis=1)
        lm_loss, _ = _backbone_forward(model, variables, sel, batch)
        return lm_loss, {"loss": lm_loss, "cand": cand,
                         "start_logits": start_logits,
                         "end_logits": end_logits}


def _backbone_forward(model: VideoTGB, variables, frames, batch,
                      mean_pool: bool = False):
    """Dispatch the LM loss to the right backbone: seq2seq (BLIP2-T5) or
    packed causal LM (InstructBLIP-Vicuna, LSTP_Vicuna_* modules). Mixed
    IVT batches pass ``widths`` (0 = text-only row) which gates the visual
    prefix via attention masking."""
    visual_valid = None
    if "widths" in batch:
        visual_valid = (batch["widths"] > 0).astype(jnp.float32)
    if model.config.backbone == "blip2":
        qf_ids = qf_mask = None
        if model.config.instruction_aware:  # InstructBLIP-Flan-T5
            qf_ids = batch.get("qformer_input_ids")
            qf_mask = batch.get("qformer_attention_mask")
        return model.apply(
            variables, frames, batch["question_ids"], batch["question_mask"],
            batch["answer_ids"], qf_ids, qf_mask, mean_pool, visual_valid,
            method=_blip2_loss_method)
    return model.apply(
        variables, frames, batch["instruction_ids"], batch["instruction_mask"],
        batch["labels"],
        batch.get("qformer_input_ids"), batch.get("qformer_attention_mask"),
        mean_pool, visual_valid, method=_instructblip_loss_method)


def backbone_init(model: VideoTGB, key: jax.Array, batch: dict):
    """Init variables for the IV/IVT stages: only the frozen-tower backbone
    path is in the train graph — frames arrive pre-selected, so RAFT/TGB
    never run (reference LSTP_Blip2_IV_module.py:560-568 builds and freezes
    the backbone alone). The full-pipeline ``init_pipeline`` would require
    flow inputs these batches don't carry."""
    visual_valid = None
    if "widths" in batch:
        visual_valid = (jnp.asarray(batch["widths"]) > 0).astype(jnp.float32)
    frames = jnp.asarray(batch["frames"])
    if model.config.backbone == "blip2":
        qf_ids = qf_mask = None
        if model.config.instruction_aware:
            qf_ids = batch.get("qformer_input_ids")
            qf_mask = batch.get("qformer_attention_mask")
        return model.init(key, frames, batch["question_ids"],
                          batch["question_mask"], batch["answer_ids"],
                          qf_ids, qf_mask, True, visual_valid,
                          method=_blip2_loss_method)
    return model.init(key, frames, batch["instruction_ids"],
                      batch["instruction_mask"], batch["labels"],
                      batch.get("qformer_input_ids"),
                      batch.get("qformer_attention_mask"), True, visual_valid,
                      method=_instructblip_loss_method)


def _blip2_loss_method(mdl: VideoTGB, frames, q_ids, q_mask, a_ids, qf_ids,
                       qf_mask, mean_pool, visual_valid):
    return mdl.model(frames, q_ids, q_mask, a_ids, mean_pool=mean_pool,
                     visual_valid=visual_valid, qformer_input_ids=qf_ids,
                     qformer_attention_mask=qf_mask)


def _instructblip_loss_method(mdl: VideoTGB, frames, inst_ids, inst_mask,
                              labels, qf_ids, qf_mask, mean_pool, visual_valid):
    return mdl.model(frames, inst_ids, inst_mask, labels,
                     qformer_input_ids=qf_ids, qformer_attention_mask=qf_mask,
                     mean_pool=mean_pool, visual_valid=visual_valid)


# ------------------------------------------------------------------ IV stage
@dataclasses.dataclass(frozen=True)
class IVRecipe:
    """Stage 3 fixed-sampler: Q-Former (+projection) trains; everything else
    frozen (LSTP_Blip2_IV_module.py:560-568). Frames arrive pre-selected."""

    @property
    def filter_fn(self) -> Callable:
        return path_freeze_filter(
            train_prefixes=("model/qformer", "model/language_projection",
                            "model/query_tokens"),
        )

    def loss_fn(
        self, model: VideoTGB, params: Any, batch: dict, key: jax.Array,
        deterministic: bool = False,
    ) -> tuple[jax.Array, dict]:
        # no dropout in the backbone towers; deterministic accepted for a
        # uniform recipe interface (eval passes True)
        variables = params if "params" in params else {"params": params}
        lm_loss, logits = _backbone_forward(
            model, variables, batch["frames"], batch, mean_pool=True)
        return lm_loss, {"loss": lm_loss}


# ----------------------------------------------------------------- IVT stage
@dataclasses.dataclass(frozen=True)
class IVTRecipe:
    """Stage 3 + LoRA: adapters + Q-Former train (LSTP_Blip2_IVT_module.py:
    184-188). Configure the LLM with lora_rank=8 for this recipe."""

    @property
    def filter_fn(self) -> Callable:
        return path_freeze_filter(
            train_prefixes=("model/qformer", "model/language_projection",
                            "model/query_tokens"),
            train_lora_only=True,
        )

    loss_fn = IVRecipe.loss_fn


RECIPES = {"tg": TGRecipe, "sf": SFRecipe, "e2e": E2ERecipe,
           "iv": IVRecipe, "ivt": IVTRecipe}


# -------------------------------------------- SF pseudo-label generation pass
def pseudo_label_generate(
    model: VideoTGB,
    params: Any,
    frames: jax.Array,  # (B, F, H, W, 3)
    question_ids: jax.Array,  # (B, Tq)
    question_mask: jax.Array,
    max_new_tokens: int = 32,
    qformer_input_ids: jax.Array | None = None,  # (B, Tq) instruction text
    qformer_attention_mask: jax.Array | None = None,
) -> jax.Array:
    """Per-frame greedy generation for self-refinement scoring: every one of
    the B*F frames is encoded alone and answers the question
    (LSTP_SF_blip2_module.py:151-192 / LSTP_SF_module.py:140-242 for the
    decoder-only backbones; reference uses max_length=128 — trim via
    max_new_tokens for budget). Returns token ids (B*F, max_new_tokens).
    Host then scores rouge_n(decode(ids), answer) -> scores (B, F).

    Instruction-aware backbones pass the qformer text so the scoring
    posterior matches the trained model (reference LSTP_SF_module.py:169-173
    routes the per-frame pass through the same instruction-aware qformer)."""
    from videotgb_tpu.ops.decode import DecodeConfig, decode

    cfg = model.config
    b, f = frames.shape[:2]
    bf = b * f
    flat = frames.reshape(bf, *frames.shape[2:])
    rep = lambda x: None if x is None else jnp.repeat(x, f, axis=0)
    qf_ids = rep(qformer_input_ids) if cfg.instruction_aware else None
    qf_mask = rep(qformer_attention_mask) if cfg.instruction_aware else None
    q_ids = jnp.repeat(question_ids, f, axis=0)
    q_mask = jnp.repeat(question_mask, f, axis=0)

    if cfg.backbone != "blip2":
        return _pseudo_label_generate_llama(
            model, params, flat, q_ids, q_mask, max_new_tokens,
            qf_ids, qf_mask)

    t5cfg = cfg.blip2.t5
    visual = model.apply(params, flat, qf_ids, qf_mask,
                         method=_encode_frames_method)  # (BF, 32, d)
    embeds, mask = model.apply(params, visual, q_ids, q_mask,
                               method=_encoder_inputs_method)
    enc_hidden = model.apply(params, embeds, mask, method=_t5_encode_method)

    caches = model.apply(params, bf, max_new_tokens, enc_hidden.shape[1],
                         method=model.init_t5_caches)
    start = jnp.full((bf,), t5cfg.decoder_start_token_id, jnp.int32)

    def valid(index):
        return jnp.broadcast_to(
            (jnp.arange(max_new_tokens)[None] <= index).astype(jnp.float32),
            (bf, max_new_tokens))

    logits0, caches = model.apply(
        params, start[:, None], enc_hidden, mask, caches, jnp.int32(0),
        valid(0), True, method=model.t5_decode_step)

    def loop_step(tokens, caches, index):
        return model.apply(params, tokens, enc_hidden, mask, caches, index,
                           valid(index), False, method=model.t5_decode_step)

    def step_fn(tokens, caches, index):
        return jax.lax.cond(
            index == 0,
            lambda: (logits0.astype(jnp.float32), caches),
            lambda: loop_step(tokens, caches, index),
        )

    dcfg = DecodeConfig(max_new_tokens=max_new_tokens,
                        eos_token_id=t5cfg.eos_token_id,
                        pad_token_id=t5cfg.pad_token_id)
    return decode(step_fn, caches, start, dcfg)


def _pseudo_label_generate_llama(
    model: VideoTGB,
    params: Any,
    flat: jax.Array,  # (B*F, H, W, 3)
    q_ids: jax.Array,  # (B*F, Tq) prompt, right-padded
    q_mask: jax.Array,
    max_new_tokens: int,
    qf_ids: jax.Array | None,
    qf_mask: jax.Array | None,
) -> jax.Array:
    """Decoder-only per-frame pseudo generation (reference
    LSTP_SF_module.py:561-586: each frame's 32 instruct-qformer tokens prefix
    the prompt, then language_model.generate)."""
    from videotgb_tpu.models.videotgb import llama_generate_from_embeds
    from videotgb_tpu.ops.decode import DecodeConfig

    llm_cfg = model.config.instructblip.llm
    visual = model.apply(params, flat, qf_ids, qf_mask,
                         method=_encode_frames_method)  # (BF, 32, d)
    text_embeds = model.apply(params, q_ids, method=_llama_embed_method)
    embeds = jnp.concatenate([visual.astype(text_embeds.dtype), text_embeds],
                             axis=1)
    vis_mask = jnp.ones(visual.shape[:2], q_mask.dtype)
    mask = jnp.concatenate([vis_mask, q_mask], axis=1)
    dcfg = DecodeConfig(max_new_tokens=max_new_tokens,
                        eos_token_id=llm_cfg.eos_token_id,
                        pad_token_id=llm_cfg.pad_token_id)
    return llama_generate_from_embeds(model, params, embeds, mask, dcfg,
                                      jax.random.key(0))


def _llama_embed_method(mdl: VideoTGB, ids):
    return mdl.model.language_model.embed(ids)


def _encode_frames_method(mdl: VideoTGB, flat, qf_ids=None, qf_mask=None):
    return mdl.model.encode_frames(flat, qformer_input_ids=qf_ids,
                                   qformer_attention_mask=qf_mask)


def _encoder_inputs_method(mdl: VideoTGB, visual, q_ids, q_mask):
    return mdl.model.encoder_inputs(visual, q_ids, q_mask)


def _t5_encode_method(mdl: VideoTGB, embeds, mask):
    return mdl.model.language_model.encode(embeds, mask)
