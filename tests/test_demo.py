"""Demo Chat handler test: upload-style video -> answer + selected frames +
flow visualizations (drives the reference demo's handler surface,
demo/utils/gradio_utils.py:50-139)."""

import numpy as np
import pytest


def test_chat_generate_end_to_end(tmp_path):
    import cv2

    from videotgb_tpu.demo.app import Chat
    from videotgb_tpu.evalsuite.debug import stats_from_combined  # import check

    video = str(tmp_path / "clip.mp4")
    writer = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"),
                             10.0, (64, 64))
    rng = np.random.default_rng(0)
    for _ in range(16):
        writer.write(rng.integers(0, 255, (64, 64, 3), np.uint8))
    writer.release()

    chat = Chat(model_path="random:tiny", flow_frames=3, max_new_tokens=4)
    answer, cand, thumbs, flows = chat.generate(video, "what is happening?",
                                                do_sample=False)
    assert isinstance(answer, str)
    assert len(cand) == chat.cfg.nframe
    assert all(t.shape[-1] == 3 for t in thumbs)
    assert len(flows) == 3 and flows[0].dtype == np.uint8
    # second question on the same video hits the decode cache
    answer2, *_ = chat.generate(video, "what is happening?", do_sample=False)
    assert answer2 == answer


def test_chat_generation_knobs(tmp_path):
    """The reference demo's sliders (demo/demo.py:205-274): nframe widens the
    selection, beams switch to beam search, top-p filters sampling — all on
    the SAME loaded params (nframe only changes the gather width)."""
    import cv2

    from videotgb_tpu.demo.app import Chat

    video = str(tmp_path / "clip.mp4")
    writer = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"),
                             10.0, (64, 64))
    rng = np.random.default_rng(2)
    for _ in range(12):
        writer.write(rng.integers(0, 255, (64, 64, 3), np.uint8))
    writer.release()

    chat = Chat(model_path="random:tiny", flow_frames=3, max_new_tokens=3)
    _, cand2, thumbs2, _ = chat.generate(video, "q?", do_sample=False,
                                         nframe=2)
    assert len(cand2) == 2 and len(thumbs2) == 2
    answer_beam, cand, *_ = chat.generate(video, "q?", do_sample=False,
                                          num_beams=2)
    assert isinstance(answer_beam, str)
    assert len(cand) == chat.cfg.nframe  # default nframe restored
    answer_tp, *_ = chat.generate(video, "q?", do_sample=True, top_p=0.5,
                                  temperature=0.7)
    assert isinstance(answer_tp, str)


def test_http_server_round_trip(tmp_path):
    """Drive the actual HTTP surface: multipart POST with a video -> JSON."""
    import io
    import json as jsonlib
    import threading
    import urllib.request
    import uuid
    from http.server import ThreadingHTTPServer

    import cv2

    from videotgb_tpu.demo.app import Chat, make_handler

    video = str(tmp_path / "clip.mp4")
    writer = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"),
                             10.0, (64, 64))
    rng = np.random.default_rng(1)
    for _ in range(12):
        writer.write(rng.integers(0, 255, (64, 64, 3), np.uint8))
    writer.release()

    chat = Chat(model_path="random:tiny", flow_frames=3, max_new_tokens=3)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(chat))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        # GET serves the page
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30).read().decode()
        assert "VideoTGB" in page

        boundary = uuid.uuid4().hex
        body = io.BytesIO()
        def part(name, payload, filename=None, ctype=None):
            body.write(f"--{boundary}\r\n".encode())
            disp = f'form-data; name="{name}"'
            if filename:
                disp += f'; filename="{filename}"'
            body.write(f"Content-Disposition: {disp}\r\n".encode())
            if ctype:
                body.write(f"Content-Type: {ctype}\r\n".encode())
            body.write(b"\r\n")
            body.write(payload if isinstance(payload, bytes) else payload.encode())
            body.write(b"\r\n")
        part("video", open(video, "rb").read(), "clip.mp4", "video/mp4")
        part("question", "what color?")
        part("temperature", "0.0")
        body.write(f"--{boundary}--\r\n".encode())
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body.getvalue(),
            headers={"Content-Type": f"multipart/form-data; boundary={boundary}"})
        resp = jsonlib.loads(urllib.request.urlopen(req, timeout=600).read())
        assert set(resp) == {"answer", "cand", "frames", "flows"}
        assert len(resp["cand"]) == chat.cfg.nframe
        assert resp["frames"] and resp["flows"]
    finally:
        server.shutdown()
