"""InstructBLIP-Vicuna: ViT-g -> instruction-aware Q-Former -> Vicuna-7B.

Composition equivalent of the reference's fork
InstructBlipForConditionalGeneration (reference:
src/models/components/xinstructblip.py:1255-1564): the Q-Former additionally
reads the tokenized question (instruction-aware, :1049), the LLM is
decoder-only Vicuna, and labels are packed LAVIS-style — loss only on the
answer suffix of the concatenated prompt (the reference's
concat_text_input_output, src/models/LSTP_module.py:677-699).

``temporal_projection`` kept for checkpoint parity (xinstructblip.py:1268).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from videotgb_tpu.models.blip2 import IGNORE_INDEX, cross_entropy_ignore
from videotgb_tpu.models.common import default_kernel_init, dense
from videotgb_tpu.models.llama import LlamaConfig, LlamaModel
from videotgb_tpu.models.qformer import QFormerConfig, QFormerModel
from videotgb_tpu.models.vit import ViTConfig, ViTModel


@dataclasses.dataclass(frozen=True)
class InstructBlipConfig:
    vit: ViTConfig = ViTConfig()
    qformer: QFormerConfig = QFormerConfig()
    llm: LlamaConfig = LlamaConfig()

    @classmethod
    def tiny(cls) -> "InstructBlipConfig":
        vit = ViTConfig.tiny()
        return cls(vit=vit, qformer=QFormerConfig.tiny(vit.hidden_size),
                   llm=LlamaConfig.tiny())


class InstructBlipModel(nn.Module):
    config: InstructBlipConfig

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
            cfg.llm.hidden_size, ("embed", None), dtype=cfg.llm.dtype,
            param_dtype=cfg.llm.param_dtype, name="language_projection",
        )
        self.temporal_projection = dense(
            cfg.llm.hidden_size, ("embed", None), dtype=cfg.llm.dtype,
            param_dtype=cfg.llm.param_dtype, name="temporal_projection",
        )
        self.language_model = LlamaModel(cfg.llm, name="language_model")

    def encode_frames(
        self,
        pixel_values: jax.Array,  # (N, H, W, 3)
        qformer_input_ids: jax.Array | None = None,  # (N, Tq) instruction
        qformer_attention_mask: jax.Array | None = None,
        mean_pool_groups: int | None = None,
    ) -> jax.Array:
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

    def __call__(
        self,
        pixel_values: jax.Array,  # (B, F, H, W, 3)
        instruction_ids: jax.Array,  # (B, T) full prompt+answer, packed
        instruction_mask: jax.Array,  # (B, T)
        labels: jax.Array,  # (B, T) -100 on prompt/pad, answer ids elsewhere
        qformer_input_ids: jax.Array | None = None,
        qformer_attention_mask: jax.Array | None = None,
        mean_pool: bool = False,
        visual_valid: jax.Array | None = None,  # (B,) 0 = text-only row
    ) -> tuple[jax.Array, jax.Array]:
        """Training loss: visual prefix + packed text, causal LM CE on the
        answer tokens (reference LSTP_module.py:197-340). mean_pool gives the
        stage-3 32-token prefix (LSTP_Vicuna_IV_module.py:213-232)."""
        b, f = pixel_values.shape[:2]
        if qformer_input_ids is not None:
            q_ids = jnp.repeat(qformer_input_ids, f, axis=0)
            q_mask = (jnp.repeat(qformer_attention_mask, f, axis=0)
                      if qformer_attention_mask is not None else None)
        else:
            q_ids = q_mask = None
        visual = self.encode_frames(
            pixel_values.reshape(b * f, *pixel_values.shape[2:]), q_ids, q_mask,
            mean_pool_groups=b if mean_pool else None,
        )
        if not mean_pool:
            visual = visual.reshape(b, f * visual.shape[1], -1)

        text_embeds = self.language_model.embed(instruction_ids)
        embeds = jnp.concatenate([visual.astype(text_embeds.dtype), text_embeds], 1)
        vis_mask = jnp.ones(visual.shape[:2], instruction_mask.dtype)
        if visual_valid is not None:
            # text-only rows (width 0) keep static shape, attention gated off
            # (LSTP_Vicuna_IVT_module.py:342-379 branch collapsed to a mask)
            vis_mask = vis_mask * visual_valid[:, None].astype(vis_mask.dtype)
        mask = jnp.concatenate([vis_mask, instruction_mask], axis=1)

        logits, _ = self.language_model(inputs_embeds=embeds, attention_mask=mask)
        # loss over the text suffix only, next-token shifted
        # (LSTP_SF_blip2_module.py:355-364)
        text_logits = logits[:, -instruction_ids.shape[1] :]
        shift_logits = text_logits[:, :-1]
        shift_labels = labels[:, 1:]
        loss = cross_entropy_ignore(shift_logits, shift_labels)
        return loss, logits


def pack_text_input_output(
    input_ids: list[list[int]],
    output_ids: list[list[int]],
    max_len: int,
    pad_id: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """LAVIS-style packing (reference LSTP_module.py:677-699): concatenate
    prompt+answer per sample; labels = -100 on the prompt part and pads.
    Host-side (ragged python lists in, padded arrays out)."""
    b = len(input_ids)
    ids = jnp.full((b, max_len), pad_id, jnp.int32)
    mask = jnp.zeros((b, max_len), jnp.int32)
    labels = jnp.full((b, max_len), IGNORE_INDEX, jnp.int32)
    ids_np = ids.tolist()
    mask_np = mask.tolist()
    labels_np = labels.tolist()
    for i, (inp, out) in enumerate(zip(input_ids, output_ids)):
        seq = (inp + out)[:max_len]
        ids_np[i][: len(seq)] = seq
        mask_np[i][: len(seq)] = [1] * len(seq)
        ans_start = min(len(inp), max_len)
        labels_np[i][ans_start : len(seq)] = seq[ans_start:]
    return (jnp.asarray(ids_np, jnp.int32), jnp.asarray(mask_np, jnp.int32),
            jnp.asarray(labels_np, jnp.int32))
