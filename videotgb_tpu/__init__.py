"""videotgb_tpu — a TPU-native (JAX/XLA/Pallas/pjit) long-video QA framework.

Re-implements the capabilities of bigai-nlco/VideoTGB (EMNLP 2024, "LSTP") as an
idiomatic TPU framework: a Temporal Grounding Bridge (RoPE-BERT over RAFT optical
flow) selects the question-relevant frame span of a long video, and only those
frames are run through a frozen ViT -> Q-Former -> LLM tower (BLIP2-Flan-T5-xl or
InstructBLIP-Vicuna-7B).

Layer map (mirrors SURVEY.md section 1 of this repo):
  videotgb_tpu.config    — composable YAML config tree (reference: configs/ + hydra)
  videotgb_tpu.utils     — logging, RNG plumbing, profiling
  videotgb_tpu.parallel  — device mesh, sharding rules, collectives (reference: Lightning DDP)
  videotgb_tpu.ops       — Pallas/XLA kernels: attention, RoPE, span, selection, correlation
  videotgb_tpu.models    — ViT, Q-Former, T5, LLaMA, TGB(RoPE-BERT), RAFT, BLIP2/InstructBLIP
  videotgb_tpu.data      — video ingest, transforms, datasets, conversation templates
  videotgb_tpu.training  — recipes (SF/TG/IV/IVT), optimizer, trainer, metrics, checkpoints
  videotgb_tpu.evalsuite — batch inference CLI + GPT-judge scorer
"""

__version__ = "0.1.0"
