"""Production serving: dynamic request batching over the two-phase pipeline.

The reference serves one request at a time through a gradio callback
(demo/demo.py); the demo app here mirrors that. This module is the
production path: concurrent requests stream into a queue, a device worker
coalesces them into fixed-shape batches (XLA programs are compiled once per
batch size), runs the bandwidth-aware two-phase pipeline — ship small uint8
flow frames, run RAFT+TGB+selection on device, fetch the (B, nframe)
indices, ship only the SELECTED frames for ViT -> Q-Former -> T5 decode —
and resolves per-request futures.

Batching policy: collect up to ``batch_size`` requests, waiting at most
``max_delay_ms`` after the first arrival (classic continuous-batching
latency/throughput knob). Short batches are padded by repeating the last
request (fixed shapes; pads are dropped before reply).

Usage (library):
    engine = ServingEngine("random:tiny", batch_size=4)
    fut = engine.submit_video("clip.mp4", "what happens?")
    print(fut.result().answer)

Usage (HTTP):
    python -m videotgb_tpu.serve --model_path ... --port 8000
    POST /v1/generate  multipart(video=..., question=...)  -> JSON
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import queue
import threading
import time
from concurrent.futures import Future
from typing import Any

import numpy as np


@dataclasses.dataclass
class Reply:
    answer: str
    selected_frames: list[int]
    latency_ms: float


@dataclasses.dataclass
class _Request:
    frames_u8: np.ndarray  # (F, H, W, 3) uint8 candidate frames
    flow_u8: np.ndarray    # (L+1, hf, wf, 3) uint8 flow frames
    question: str
    future: Future
    t_submit: float


class ServingEngine:
    """Dynamically-batched two-phase VideoTGB serving."""

    def __init__(
        self,
        model_path: str = "random:tiny",
        preset: str = "tiny",
        batch_size: int = 4,
        flow_frames: int = 4,
        max_new_tokens: int = 16,
        max_delay_ms: float = 30.0,
        text_len: int = 64,
        seed: int = 0,
        model_base: str | None = None,
        sampler_base: str | None = None,
        backbone: str = "blip2",
        bf16_params: bool = True,
        mesh: str = "",
    ):
        """``model_base``/``sampler_base``: tokenizer dirs for the LLM and
        the TGB sampler (same knobs as evalsuite/inference.py) — REQUIRED
        when serving real converted checkpoints; the byte-tokenizer fallback
        only makes sense for random-weight smoke serving.

        ``mesh`` ("dp=2,tp=4"): mesh-sharded serving for models that exceed
        one chip's HBM (Vicuna-7B — the deployment layout in PARITY.md).
        Params are placed by their logical-axis annotations, request batches
        shard over dp; same pattern as evalsuite/inference.py --mesh."""
        import jax

        from videotgb_tpu.data.tokenizer import load_tokenizer
        from videotgb_tpu.evalsuite.inference import load_model

        class _Args:
            pass

        args = _Args()
        args.model_path = model_path
        args.preset = preset
        args.backbone = backbone
        args.flow_size = None
        args.lora = 0
        args.flow_frames = flow_frames
        # bf16 param residency by default: the flagship's f32 tree (16.3 GB)
        # leaves no activation headroom on one v5e chip (load_model does the
        # leaf-wise cast; see evalsuite.inference.bf16_residency)
        args.bf16_params = bf16_params
        self._mesh = None
        if mesh:
            from jax.sharding import NamedSharding

            from videotgb_tpu.parallel.mesh import create_mesh, parse_mesh_spec

            self.model, self.params, self.cfg, specs = load_model(
                args, with_specs=True)
            m = create_mesh(parse_mesh_spec(mesh, allow_pp=False))
            dp_total = m.shape["dp"] * m.shape["fsdp"]
            if batch_size % dp_total:
                raise ValueError(f"batch_size {batch_size} must be divisible "
                                 f"by dp*fsdp={dp_total}")
            self.params = {"params": jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(m, s)),
                self.params["params"], specs)}
            self._mesh = m
        else:
            self.model, self.params, self.cfg = load_model(args)
        self.tok = load_tokenizer(model_base)
        self.sampler_tok = load_tokenizer(sampler_base)
        self.batch_size = batch_size
        self.flow_frames = flow_frames
        self.max_new_tokens = max_new_tokens
        self.max_delay_s = max_delay_ms / 1000.0
        self.text_len = text_len
        self._jax = jax
        self._key = jax.random.key(seed)
        self._queue: "queue.Queue[_Request | None]" = queue.Queue()
        # two-stage pipeline: the select worker feeds prepared batches here,
        # the answer worker drains. Depth 1 = at most one batch in flight
        # between phases — enough to overlap select(N+1) with answer(N)
        # without unbounded latency buildup.
        self._mid: "queue.Queue" = queue.Queue(maxsize=1)
        self._answer_busy = threading.Event()
        self._recent_lat: list[float] = []  # last N request latencies (ms)
        # per-phase wall timings (ms, last ≤512 batches) — the loaded-latency
        # decomposition /v1/stats reports
        self._phase_t: dict[str, list] = {
            "queue_wait": [], "assembly": [], "host_prep": [],
            "select": [], "gather": [], "answer": [], "postprocess": []}
        self._served = 0
        self._batches = 0
        self._t_start = time.perf_counter()
        self._build_phases()
        self._worker = threading.Thread(target=self._run_select, daemon=True)
        self._worker.start()
        self._answer_worker = threading.Thread(target=self._run_answer,
                                               daemon=True)
        self._answer_worker.start()

    def stats(self) -> dict:
        """Operational snapshot: served counts, queue depth, and latency
        percentiles over the last ≤512 requests (measured end-to-end from
        submit to reply, the same Reply.latency_ms bench_serve.py reports)."""
        lat = list(self._recent_lat)
        up = time.perf_counter() - self._t_start
        out = {
            "served": self._served,
            "batches": self._batches,
            "queue_depth": self._queue.qsize(),
            "batch_size": self.batch_size,
            "uptime_s": round(up, 1),
            "throughput_req_s": round(self._served / up, 3) if up > 0 else 0.0,
        }
        if lat:
            arr = np.asarray(lat)
            out.update(
                p50_ms=round(float(np.percentile(arr, 50)), 1),
                p90_ms=round(float(np.percentile(arr, 90)), 1),
                p99_ms=round(float(np.percentile(arr, 99)), 1),
            )
        # loaded-latency decomposition: where a request's wall time goes —
        # queue_wait (submit -> first pop), assembly (batch soak), host_prep
        # (tokenize+stack), select (phase-1 device incl. index fetch), gather
        # (host frame gather + upload), answer (phase-2 device incl. token
        # fetch), postprocess (detokenize + future resolution)
        out["phase_ms"] = {
            name: {"p50": round(float(np.percentile(np.asarray(ts), 50)), 1),
                   "p90": round(float(np.percentile(np.asarray(ts), 90)), 1)}
            for name, ts in self._phase_t.items() if ts}
        return out

    # ------------------------------------------------------------- pipeline
    def _build_phases(self):
        import jax

        from videotgb_tpu.models.videotgb import (
            answer_phase_blip2, answer_phase_instructblip, select_phase_blip2)
        from videotgb_tpu.ops.decode import DecodeConfig

        decoder_only = self.cfg.backbone == "instructblip"
        if decoder_only:
            lm = self.cfg.instructblip.llm
            eos_id, pad_id = lm.eos_token_id, lm.pad_token_id
            mode = "multi_modal"  # Vicuna TGB mode (eval/utils/model.py:92-100)
            rescale = "ratio"  # Vicuna span rule (eval/utils/model.py:135)
            answer_phase = answer_phase_instructblip
        else:
            eos_id = self.cfg.blip2.t5.eos_token_id
            pad_id = self.cfg.blip2.t5.pad_token_id
            mode = "fusion"
            rescale = "minus1"
            answer_phase = answer_phase_blip2
        dcfg = DecodeConfig(max_new_tokens=self.max_new_tokens,
                            eos_token_id=eos_id, pad_token_id=pad_id)
        self._select = jax.jit(
            lambda p, flow_u8, bd, k: select_phase_blip2(
                self.model, p, flow_u8, bd, k, mode=mode, rescale=rescale))
        self._answer = jax.jit(
            lambda p, sel, bd, k: answer_phase(
                self.model, p, sel, bd, dcfg, k))

    # --------------------------------------------------------------- submit
    def submit(self, frames_u8: np.ndarray, flow_u8: np.ndarray,
               question: str) -> Future:
        """frames_u8 (num_frames, H, W, 3) uint8 at the ViT size; flow_u8
        (flow_frames+1, hf, wf, 3) uint8 at the TGB flow size."""
        fut: Future = Future()
        self._queue.put(_Request(frames_u8, flow_u8, question, fut,
                                 time.perf_counter()))
        return fut

    def submit_video(self, video_path: str, question: str) -> Future:
        """Decode on the caller's thread (IO-bound), then submit."""
        from videotgb_tpu.data.transforms import resize_video
        from videotgb_tpu.data.video_io import read_video_cv2, sample_frames

        vit_cfg = (self.cfg.blip2.vit if self.cfg.blip2 is not None
                   else self.cfg.instructblip.vit)
        image = vit_cfg.image_size
        fs = self.cfg.tgb.flow_size
        raw, _ = read_video_cv2(video_path, num_frames=self.cfg.num_frames,
                                size=(max(image, fs),) * 2)
        flow_ids = sample_frames(self.flow_frames + 1, self.cfg.num_frames)
        return self.submit(
            np.ascontiguousarray(resize_video(raw, (image, image))),
            np.ascontiguousarray(resize_video(raw[flow_ids], (fs, fs))),
            question)

    # --------------------------------------------------------------- worker
    def _phase(self, name: str, ms: float):
        ts = self._phase_t[name]
        ts.append(round(ms, 2))
        if len(ts) > 512:
            del ts[: len(ts) - 512]

    def _collect(self) -> list[_Request] | None:
        """Block for the first request, then batch adaptively.

        Whatever is already queued is drained for free. Beyond that, soak
        up to max_delay_ms for more arrivals ONLY while the answer stage is
        busy — the pipe is occupied anyway, so waiting costs no latency.
        When the pipe is idle, dispatch immediately: a fixed 30 ms soak in
        that regime is pure added latency (the round-4 loaded-p50 tax)."""
        first = self._queue.get()
        if first is None:
            return None
        t_pop = time.perf_counter()
        self._phase("queue_wait", (t_pop - first.t_submit) * 1000)
        group = [first]
        while len(group) < self.batch_size:  # free: already queued
            try:
                nxt = self._queue.get_nowait()
            except queue.Empty:
                break
            if nxt is None:
                self._queue.put(None)  # propagate shutdown after this batch
                self._phase("assembly", (time.perf_counter() - t_pop) * 1000)
                return group
            group.append(nxt)
        if len(group) < self.batch_size and self._answer_busy.is_set():
            deadline = t_pop + self.max_delay_s
            while len(group) < self.batch_size:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    self._queue.put(None)
                    break
                group.append(nxt)
        self._phase("assembly", (time.perf_counter() - t_pop) * 1000)
        return group

    def _run_select(self):
        """Stage 1: collect -> tokenize -> RAFT+TGB select on device ->
        host frame gather -> hand off to the answer stage. Runs ahead of
        the answer worker so select(N+1) overlaps answer(N), and new
        arrivals are admitted while a batch is decoding."""
        import contextlib

        import jax
        import jax.numpy as jnp

        from videotgb_tpu.parallel.sharding import shard_batch

        step = 0
        while True:
            group = self._collect()
            if group is None:
                self._mid.put(None)  # propagate shutdown to the answer stage
                return
            pad = self.batch_size - len(group)
            padded = group + [group[-1]] * pad
            mesh_ctx = (self._mesh if self._mesh is not None
                        else contextlib.nullcontext())
            try:
                t0 = time.perf_counter()
                b = self.batch_size
                questions = [r.question for r in padded]
                prompts = [f"USER: <video>\n{q} ASSISTANT: " for q in questions]
                q_enc = self.tok(prompts, padding="max_length",
                                 truncation=True, max_length=self.text_len)
                sq_enc = self.sampler_tok(questions, padding="max_length",
                                          truncation=True,
                                          max_length=self.text_len)
                bd = {
                    "flow_mask": jnp.ones((b, self.flow_frames + 2)),
                    "video_length": jnp.full((b,), self.flow_frames, jnp.int32),
                    "sampler_question_ids": jnp.asarray(
                        sq_enc["input_ids"], jnp.int32),
                    "sampler_question_mask": jnp.asarray(
                        sq_enc["attention_mask"]),
                    "question_ids": jnp.asarray(q_enc["input_ids"], jnp.int32),
                    "question_mask": jnp.asarray(q_enc["attention_mask"]),
                    # instruction-aware Q-Former text (instructblip_t5)
                    "qformer_input_ids": jnp.asarray(
                        sq_enc["input_ids"], jnp.int32),
                    "qformer_attention_mask": jnp.asarray(
                        sq_enc["attention_mask"]),
                }
                flow_u8 = jnp.asarray(np.stack([r.flow_u8 for r in padded]))
                if self._mesh is not None:
                    bd = shard_batch(bd, self._mesh)
                    flow_u8 = shard_batch(flow_u8, self._mesh)
                key = jax.random.fold_in(self._key, step)
                step += 1
                t1 = time.perf_counter()
                self._phase("host_prep", (t1 - t0) * 1000)
                with mesh_ctx:
                    sel_idx = np.asarray(
                        self._select(self.params, flow_u8, bd, key))
                t2 = time.perf_counter()
                self._phase("select", (t2 - t1) * 1000)
                sel = np.stack([padded[i].frames_u8[sel_idx[i]]
                                for i in range(b)])
                sel_dev = jnp.asarray(sel)
                if self._mesh is not None:
                    sel_dev = shard_batch(sel_dev, self._mesh)
                self._phase("gather", (time.perf_counter() - t2) * 1000)
            except Exception as e:  # resolve futures even on failure
                for r in group:
                    if not r.future.done():
                        r.future.set_exception(e)
                continue
            self._answer_busy.set()
            self._mid.put((group, bd, sel_idx, sel_dev, key, mesh_ctx))

    def _run_answer(self):
        """Stage 2: LLM decode on device -> detokenize -> resolve futures."""
        while True:
            item = self._mid.get()
            if item is None:
                return
            group, bd, sel_idx, sel_dev, key, mesh_ctx = item
            try:
                t0 = time.perf_counter()
                with mesh_ctx:
                    tokens = np.asarray(
                        self._answer(self.params, sel_dev, bd, key))
                t1 = time.perf_counter()
                self._phase("answer", (t1 - t0) * 1000)
                answers = self.tok.batch_decode(tokens,
                                                skip_special_tokens=True)
                now = time.perf_counter()
                for i, r in enumerate(group):
                    lat_ms = round((now - r.t_submit) * 1000, 1)
                    r.future.set_result(Reply(
                        answer=answers[i],
                        selected_frames=[int(x) for x in sel_idx[i]],
                        latency_ms=lat_ms))
                    self._recent_lat.append(lat_ms)
                self._phase("postprocess", (now - t1) * 1000)
                self._recent_lat = self._recent_lat[-512:]
                self._served += len(group)
                self._batches += 1
            except Exception as e:
                for r in group:
                    if not r.future.done():
                        r.future.set_exception(e)
            finally:
                if self._mid.empty():
                    self._answer_busy.clear()

    def close(self):
        self._queue.put(None)
        self._worker.join(timeout=30)
        self._answer_worker.join(timeout=30)


# ------------------------------------------------------------------- HTTP
def main(argv=None):
    import base64
    import os
    import tempfile
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    p = argparse.ArgumentParser()
    p.add_argument("--model_path", default="random:small")
    p.add_argument("--preset", default="small")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--flow_frames", type=int, default=4)
    p.add_argument("--max_new_tokens", type=int, default=32)
    p.add_argument("--max_delay_ms", type=float, default=30.0)
    p.add_argument("--model_base", default=None,
                   help="LLM tokenizer dir (required for real checkpoints)")
    p.add_argument("--sampler_base", default=None,
                   help="TGB sampler tokenizer dir")
    p.add_argument("--backbone", default="blip2",
                   choices=["blip2", "instructblip_t5", "instructblip"])
    p.add_argument("--f32_params", action="store_true",
                   help="keep f32 param residency (default bf16: the "
                        "flagship's f32 weights exceed one v5e chip's HBM)")
    p.add_argument("--mesh", default="",
                   help="mesh-sharded serving, e.g. dp=2,tp=4 — the "
                        "Vicuna-7B deployment layout (weights exceed one "
                        "chip); batch_size must divide by dp*fsdp")
    args = p.parse_args(argv)

    engine = ServingEngine(
        args.model_path, preset=args.preset, batch_size=args.batch_size,
        flow_frames=args.flow_frames, max_new_tokens=args.max_new_tokens,
        max_delay_ms=args.max_delay_ms, model_base=args.model_base,
        sampler_base=args.sampler_base, backbone=args.backbone,
        bf16_params=not args.f32_params, mesh=args.mesh)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path == "/healthz":
                body, code = b'{"status": "ok"}', 200
            elif self.path == "/v1/stats":
                body, code = json.dumps(engine.stats()).encode(), 200
            else:
                body, code = b'{"error": "not found"}', 404
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            import email
            from email import policy

            length = int(self.headers["Content-Length"])
            ctype = self.headers["Content-Type"]
            body = self.rfile.read(length)
            msg = email.message_from_bytes(
                b"Content-Type: " + ctype.encode() + b"\r\n\r\n" + body,
                policy=policy.default)
            question, video_bytes = "", None
            for part in msg.iter_parts():
                name = part.get_param("name", header="content-disposition")
                if name == "video":
                    video_bytes = part.get_payload(decode=True)
                elif name == "question":
                    question = part.get_content().strip()
            if not video_bytes:
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(b'{"error": "missing video part"}')
                return
            with tempfile.NamedTemporaryFile(suffix=".mp4", delete=False) as f:
                f.write(video_bytes)
                path = f.name
            try:
                try:
                    reply = engine.submit_video(path, question).result(
                        timeout=600)
                except Exception as e:  # batch failure / timeout -> 500 JSON
                    self.send_response(500)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(json.dumps({"error": str(e)}).encode())
                    return
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps(dataclasses.asdict(reply)).encode())
            finally:
                os.unlink(path)

    server = ThreadingHTTPServer(("0.0.0.0", args.port), Handler)
    print(f"VideoTGB-TPU serving on http://localhost:{args.port}/v1/generate "
          f"(batch {args.batch_size}, max delay {args.max_delay_ms} ms)")
    server.serve_forever()


if __name__ == "__main__":
    main()
