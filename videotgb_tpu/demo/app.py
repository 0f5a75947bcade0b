"""Interactive chat demo: upload a video, ask questions, see which frames the
TGB selected and their flow visualizations.

Functional equivalent of the reference's gradio app (reference:
demo/demo.py + demo/utils/gradio_utils.py:50-139 — chat state machine,
frame/flow rendering of the selected span, generation-parameter sliders).
gradio is not in this image, so the UI is a dependency-free stdlib HTTP
server with a single-page chat frontend; the handler surface
(:class:`Chat`.generate) matches the reference's Chat class so a gradio
frontend can be dropped on top unchanged.

Run: python -m videotgb_tpu.demo.app --model_path random:small --port 7860
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import tempfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class Chat:
    """Model handler (reference demo/utils/gradio_utils.py:50-139): holds the
    loaded model + per-conversation state, returns (answer, selected frame
    indices, frame thumbnails, flow visualizations)."""

    def __init__(self, model_path: str = "random:small", nframe: int = 4,
                 flow_frames: int = 8, max_new_tokens: int = 32,
                 preset: str = "small", backbone: str = "blip2",
                 model_base: str | None = None,
                 sampler_base: str | None = None,
                 flow_size: int | None = None,
                 bf16_params: bool = True):
        import jax

        from videotgb_tpu.data.tokenizer import load_tokenizer
        from videotgb_tpu.evalsuite.inference import load_model

        class _Args:
            pass

        # the full load_model surface — real (non-random:) checkpoint dirs
        # need preset/backbone to rebuild the matching config
        # (reference demo/demo.py:127-139 Chat(model_path, ...))
        args = _Args()
        args.model_path = model_path
        args.preset = preset
        args.backbone = backbone
        args.nframe = nframe
        args.flow_size = flow_size  # must match a converted checkpoint's
        args.lora = 0
        args.flow_frames = flow_frames
        # bf16 residency by default (flagship f32 exceeds one chip's HBM)
        args.bf16_params = bf16_params
        self.model, self.params, self.cfg = load_model(args)
        self.tok = load_tokenizer(model_base)
        self.sampler_tok = load_tokenizer(sampler_base)
        self.nframe = nframe
        self.flow_frames = flow_frames
        self.max_new_tokens = max_new_tokens
        self._cache: dict[str, tuple] = {}
        self._jax = jax

    def _prep_video(self, video_path: str):
        if video_path in self._cache:
            return self._cache[video_path]
        from videotgb_tpu.data.transforms import clip_transform, resize_video
        from videotgb_tpu.data.video_io import read_video_cv2, sample_frames

        vit_cfg = (self.cfg.blip2.vit if self.cfg.blip2 is not None
                   else self.cfg.instructblip.vit)
        image = vit_cfg.image_size
        fs = self.cfg.tgb.flow_size
        raw, _ = read_video_cv2(video_path, num_frames=self.cfg.num_frames,
                                size=(max(image, fs),) * 2)
        frames = clip_transform(resize_video(raw, (image, image)), image)
        flow_ids = sample_frames(self.flow_frames + 1, self.cfg.num_frames)
        flow_rgb = resize_video(raw[flow_ids], (fs, fs)).astype(np.float32)
        self._cache[video_path] = (raw, frames, flow_rgb)
        return self._cache[video_path]

    def _model_for_nframe(self, nframe: int | None):
        """nframe only widens the selection gather, so the SAME params drive
        a config-replaced model view (reference demo slider, demo.py:205-274;
        each distinct nframe compiles its own program, cached by jit)."""
        if nframe in (None, self.cfg.nframe):
            return self.model, self.cfg
        import dataclasses

        from videotgb_tpu.models.videotgb import VideoTGB

        cfg = dataclasses.replace(self.cfg, nframe=int(nframe))
        return VideoTGB(cfg), cfg

    def generate(self, video_path: str, question: str,
                 temperature: float = 0.2, do_sample: bool = True,
                 seed: int = 0, num_beams: int = 1, top_p: float = 1.0,
                 nframe: int | None = None, max_new_tokens: int | None = None):
        """Generation-parameter knobs mirror the reference demo sliders
        (demo/demo.py:205-274: nframe / beams / top-p / temperature)."""
        import jax
        import jax.numpy as jnp

        from videotgb_tpu.data.flow_viz import flow_to_image
        from videotgb_tpu.models.videotgb import (
            generate_blip2, generate_instructblip)
        from videotgb_tpu.ops.decode import DecodeConfig

        model, _cfg = self._model_for_nframe(nframe)
        raw, frames, flow_rgb = self._prep_video(video_path)
        prompt = f"USER: <video>\n{question} ASSISTANT: "
        q = self.tok([prompt], padding="max_length", max_length=64)
        sq = self.sampler_tok([question], padding="max_length", max_length=64)

        flow = self.model.apply(self.params, jnp.asarray(flow_rgb)[None],
                                method=self.model.flow_features)

        batch = {
            "frames": jnp.asarray(frames)[None],
            "flow": flow,
            "flow_mask": jnp.ones((1, self.flow_frames + 2)),
            "video_length": jnp.full((1,), self.flow_frames, jnp.int32),
            "sampler_question_ids": jnp.asarray(sq["input_ids"], jnp.int32),
            "sampler_question_mask": jnp.asarray(sq["attention_mask"]),
            "question_ids": jnp.asarray(q["input_ids"], jnp.int32),
            "question_mask": jnp.asarray(q["attention_mask"]),
            "qformer_input_ids": jnp.asarray(sq["input_ids"], jnp.int32),
            "qformer_attention_mask": jnp.asarray(sq["attention_mask"]),
        }
        decoder_only = self.cfg.backbone == "instructblip"
        if decoder_only:
            lm = self.cfg.instructblip.llm
            eos_id, pad_id = lm.eos_token_id, lm.pad_token_id
        else:
            eos_id = self.cfg.blip2.t5.eos_token_id
            pad_id = self.cfg.blip2.t5.pad_token_id
        dcfg = DecodeConfig(
            max_new_tokens=max_new_tokens or self.max_new_tokens,
            eos_token_id=eos_id, pad_token_id=pad_id,
            do_sample=do_sample and num_beams == 1, temperature=temperature,
            num_beams=max(int(num_beams), 1), top_p=top_p,
        )
        gen = generate_instructblip if decoder_only else generate_blip2
        tokens, cand = gen(model, self.params, batch, dcfg,
                           jax.random.key(seed))
        answer = self.tok.batch_decode(np.asarray(tokens),
                                       skip_special_tokens=True)[0]
        cand_idx = np.asarray(cand[0]).tolist()

        thumbs = [raw[i] for i in cand_idx]
        flow_imgs = list(flow_to_image(np.asarray(flow[0])))
        return answer, cand_idx, thumbs, flow_imgs


def _png_b64(img: np.ndarray) -> str:
    import cv2

    ok, buf = cv2.imencode(".png", np.ascontiguousarray(img[..., ::-1]))
    return base64.b64encode(buf.tobytes()).decode()


PAGE = """<!doctype html><html><head><title>VideoTGB-TPU demo</title><style>
body{font-family:sans-serif;max-width:900px;margin:2em auto}
.msg{padding:.5em;margin:.3em;border-radius:8px}.user{background:#e3edfd}
.bot{background:#f0f0f0}img{height:96px;margin:2px;border-radius:4px}
</style></head><body>
<h2>VideoTGB-TPU — long video QA</h2>
<form id=f><input type=file id=video accept=video/*>
<input id=q size=50 placeholder="ask about the video">
<label>temp <input id=t type=number step=0.1 value=0.2 style="width:4em"></label>
<label>nframe <input id=nf type=number min=1 max=32 value=4 style="width:4em"></label>
<label>beams <input id=nb type=number min=1 max=8 value=1 style="width:4em"></label>
<label>top-p <input id=tp type=number step=0.05 min=0 max=1 value=1.0 style="width:4em"></label>
<button>Ask</button></form><div id=chat></div>
<script>
f.onsubmit=async e=>{e.preventDefault();
const fd=new FormData();fd.append('video',video.files[0]);
fd.append('question',q.value);fd.append('temperature',t.value);
fd.append('nframe',nf.value);fd.append('num_beams',nb.value);
fd.append('top_p',tp.value);
chat.innerHTML+=`<div class="msg user">${q.value}</div>`;
const r=await fetch('/generate',{method:'POST',body:fd});const d=await r.json();
let imgs=d.frames.map(b=>`<img src="data:image/png;base64,${b}">`).join('');
let flows=d.flows.map(b=>`<img src="data:image/png;base64,${b}">`).join('');
chat.innerHTML+=`<div class="msg bot"><b>${d.answer}</b><br>
selected frames ${JSON.stringify(d.cand)}<br>${imgs}<br>flow:<br>${flows}</div>`;};
</script></body></html>"""


def make_handler(chat: Chat):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(PAGE.encode())

        def do_POST(self):
            import email
            from email import policy

            length = int(self.headers["Content-Length"])
            ctype = self.headers["Content-Type"]
            body = self.rfile.read(length)
            msg = email.message_from_bytes(
                b"Content-Type: " + ctype.encode() + b"\r\n\r\n" + body,
                policy=policy.default)
            fields = {}
            video_bytes = None
            for part in msg.iter_parts():
                name = part.get_param("name", header="content-disposition")
                if name == "video":
                    video_bytes = part.get_payload(decode=True)
                else:
                    fields[name] = part.get_content().strip()
            with tempfile.NamedTemporaryFile(suffix=".mp4", delete=False) as f:
                f.write(video_bytes)
                path = f.name
            try:
                answer, cand, thumbs, flows = chat.generate(
                    path, fields.get("question", ""),
                    temperature=float(fields.get("temperature", 0.2)),
                    nframe=int(fields["nframe"]) if fields.get("nframe")
                    else None,
                    num_beams=int(fields.get("num_beams", 1)),
                    top_p=float(fields.get("top_p", 1.0)))
                payload = {
                    "answer": answer, "cand": cand,
                    "frames": [_png_b64(t) for t in thumbs],
                    "flows": [_png_b64(f_) for f_ in flows],
                }
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps(payload).encode())
            finally:
                os.unlink(path)

    return Handler


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", default="random:small")
    p.add_argument("--preset", default="small")
    p.add_argument("--backbone", default="blip2",
                   choices=["blip2", "instructblip_t5", "instructblip"])
    p.add_argument("--model_base", default=None,
                   help="LLM tokenizer dir (required for real checkpoints)")
    p.add_argument("--sampler_base", default=None,
                   help="TGB sampler tokenizer dir")
    p.add_argument("--flow_size", type=int, default=None,
                   help="override cfg.tgb.flow_size (must match the "
                        "converted checkpoint)")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--nframe", type=int, default=4)
    p.add_argument("--max_new_tokens", type=int, default=32)
    args = p.parse_args(argv)
    chat = Chat(args.model_path, nframe=args.nframe,
                max_new_tokens=args.max_new_tokens, preset=args.preset,
                backbone=args.backbone, model_base=args.model_base,
                sampler_base=args.sampler_base, flow_size=args.flow_size)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(chat))
    print(f"VideoTGB-TPU demo on http://localhost:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
