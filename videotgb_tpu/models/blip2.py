"""BLIP2-Flan-T5: ViT-g -> Q-Former -> language projection -> T5.

Composition equivalent of the reference's fork Blip2ForConditionalGeneration
(reference: src/models/components/xblip2.py:1539-1835): 32 learned
query_tokens (:1548), language_projection Linear(768 -> d_model) (:1552), and
the fork's sole delta — an extra ``temporal_projection`` Linear reserved for
injecting TGB flow features into the LLM (:1551; all reference call sites are
commented out, kept here for checkpoint-shape parity and future use).

Exposes the primitives the recipes compose (SURVEY.md section 3.6 ledger):
  encode_frames   frames (B*, H, W, 3) -> projected visual tokens (B*, 32, d)
  encoder_inputs  visual tokens + question embeds -> (embeds, mask) for T5
  loss            seq2seq CE with -100 masking on pad
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from videotgb_tpu.models.common import default_kernel_init, dense
from videotgb_tpu.models.qformer import QFormerConfig, QFormerModel
from videotgb_tpu.models.t5 import T5Config, T5Model
from videotgb_tpu.models.vit import ViTConfig, ViTModel

IGNORE_INDEX = -100


@dataclasses.dataclass(frozen=True)
class Blip2Config:
    vit: ViTConfig = ViTConfig()
    qformer: QFormerConfig = QFormerConfig()
    t5: T5Config = T5Config()
    # True = the InstructBLIP-Flan-T5 variant (reference
    # LSTP_SF_instructblipflant5xl_videoinstruct): same T5 composition but
    # the Q-Former additionally reads the tokenized question
    # (instruction-aware, xinstructblip.py:1049)
    qformer_instruction: bool = False

    @classmethod
    def tiny(cls, qformer_instruction: bool = False) -> "Blip2Config":
        vit = ViTConfig.tiny()
        return cls(vit=vit, qformer=QFormerConfig.tiny(vit.hidden_size),
                   t5=T5Config.tiny(), qformer_instruction=qformer_instruction)


class Blip2Model(nn.Module):
    config: Blip2Config

    def setup(self) -> None:
        cfg = self.config
        self.vision_model = ViTModel(cfg.vit, name="vision_model")
        self.qformer = QFormerModel(cfg.qformer, name="qformer")
        self.query_tokens = self.param(
            "query_tokens",
            nn.with_partitioning(default_kernel_init, (None, None, "embed")),
            (1, cfg.qformer.num_query_tokens, cfg.qformer.hidden_size),
            cfg.qformer.param_dtype,
        )
        self.language_projection = dense(
            cfg.t5.d_model, ("embed", None), dtype=cfg.t5.dtype,
            param_dtype=cfg.t5.param_dtype, name="language_projection",
        )
        # reference parity: reserved flow-feature projection (xblip2.py:1551)
        self.temporal_projection = dense(
            cfg.t5.d_model, ("embed", None), dtype=cfg.t5.dtype,
            param_dtype=cfg.t5.param_dtype, name="temporal_projection",
        )
        self.language_model = T5Model(cfg.t5, name="language_model")

    def encode_frames(
        self,
        pixel_values: jax.Array,
        mean_pool_groups: int | None = None,
        qformer_input_ids: jax.Array | None = None,  # (N, Tq) instruction
        qformer_attention_mask: jax.Array | None = None,
    ) -> jax.Array:
        """pixel_values (N, H, W, 3) -> visual tokens.

        mean_pool_groups=None: (N, 32, d_model) — the training path's
        per-frame tokens (LSTP_SF_blip2_module.py:316-334).
        mean_pool_groups=B: frames grouped as (B, N/B) and Q-Former outputs
        mean-pooled over each group -> (B, 32, d_model) — the inference path
        (eval/utils/model.py:394-401).
        ``qformer_input_ids`` engages the instruction-aware Q-Former path
        (the InstructBLIP-Flan-T5 variant, cfg.qformer_instruction).
        """
        image_embeds = self.vision_model(pixel_values)
        n = image_embeds.shape[0]
        query = jnp.broadcast_to(
            self.query_tokens.astype(self.config.qformer.dtype),
            (n, *self.query_tokens.shape[1:]),
        )
        query_out = self.qformer(
            query, image_embeds,
            input_ids=qformer_input_ids, attention_mask=qformer_attention_mask,
        )
        if mean_pool_groups is not None:
            b = mean_pool_groups
            query_out = query_out.reshape(b, n // b, *query_out.shape[1:]).mean(axis=1)
        return self.language_projection(query_out)

    def encoder_inputs(
        self,
        visual_tokens: jax.Array,  # (B, Tv, d_model) (reshape frames outside)
        question_ids: jax.Array,  # (B, Tq)
        question_mask: jax.Array,  # (B, Tq)
        visual_valid: jax.Array | None = None,  # (B,) 0 = text-only row
    ) -> tuple[jax.Array, jax.Array]:
        """``visual_valid`` collapses the reference's python text-only branch
        (LSTP_Vicuna_IVT_module.py:197/342) into attention masking: width-0
        rows keep the static shape but the LLM never attends their visual
        prefix (SURVEY.md section 7.3 item 3)."""
        from videotgb_tpu.parallel.sharding import constrain_batch

        text_embeds = self.language_model.embed(question_ids)
        embeds = constrain_batch(
            jnp.concatenate([visual_tokens.astype(text_embeds.dtype),
                             text_embeds], axis=1))
        vis_mask = jnp.ones(visual_tokens.shape[:2], question_mask.dtype)
        if visual_valid is not None:
            vis_mask = vis_mask * visual_valid[:, None].astype(vis_mask.dtype)
        mask = jnp.concatenate([vis_mask, question_mask], axis=1)
        return embeds, mask

    def __call__(
        self,
        pixel_values: jax.Array,  # (B, F, H, W, 3) selected frames
        question_ids: jax.Array,
        question_mask: jax.Array,
        answer_ids: jax.Array,  # (B, Ta) labels (pad = pad_token_id)
        answer_mask: jax.Array | None = None,
        mean_pool: bool = False,
        visual_valid: jax.Array | None = None,  # (B,) 0 = text-only row
        qformer_input_ids: jax.Array | None = None,  # (B, Tq) instruction
        qformer_attention_mask: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        """Training loss pass -> (scalar CE loss, logits).

        mean_pool=True gives the stage-3/IV visual prefix: Q-Former outputs
        mean-pooled across frames to 32 tokens (LSTP_Blip2_IV_module.py:222-232)
        instead of the SF path's nframe*32 tokens.
        """
        cfg = self.config
        b, f = pixel_values.shape[:2]
        qf_kwargs = {}
        if qformer_input_ids is not None:
            qf_kwargs = dict(
                qformer_input_ids=jnp.repeat(qformer_input_ids, f, axis=0),
                qformer_attention_mask=(
                    jnp.repeat(qformer_attention_mask, f, axis=0)
                    if qformer_attention_mask is not None else None))
        visual = self.encode_frames(
            pixel_values.reshape(b * f, *pixel_values.shape[2:]),
            mean_pool_groups=b if mean_pool else None,
            **qf_kwargs,
        )
        if not mean_pool:
            visual = visual.reshape(b, f * visual.shape[1], -1)
        embeds, mask = self.encoder_inputs(visual, question_ids, question_mask,
                                           visual_valid)

        # teacher forcing: shift answers right with decoder_start
        start = jnp.full((b, 1), cfg.t5.decoder_start_token_id, answer_ids.dtype)
        decoder_input_ids = jnp.concatenate([start, answer_ids[:, :-1]], axis=1)
        logits = self.language_model(embeds, mask, decoder_input_ids)

        labels = jnp.where(answer_ids == cfg.t5.pad_token_id, IGNORE_INDEX, answer_ids)
        loss = cross_entropy_ignore(logits, labels)
        return loss, logits


def cross_entropy_ignore(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE over labels != -100 (torch CrossEntropyLoss semantics)."""
    valid = labels != IGNORE_INDEX
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
