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
