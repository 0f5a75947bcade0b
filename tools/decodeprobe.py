"""VERDICT r3 item 8: profile the e2e host decode stage (bench decode path).

The three-stage e2e pipeline is decode-bound on this 1-core host
(BENCH_r03: 41.3 ms/clip in-pipeline). This probe breaks decode_clip_uint8
into its parts at bench shapes (32 frames @ 224² from the synthetic 30 fps
mp4) and A/Bs the candidate savings:

  current     read_video_cv2 grab-skip at max(image,flow) + 2 resizes
  readonly    cv2 open + grab/retrieve only (floor set by the codec)
  noresize    decode at native res, skip resize_video (isolates resize cost)
  direct224   decode with cv2.resize to 224 at retrieve time (fuse resize
              into the per-frame loop — saves one intermediate array pass)
  interarea   same but INTER_AREA (what resize_video uses) vs INTER_LINEAR

Host numbers move ~2.5x between sessions (CLAUDE.md); only ratios matter.

Usage: python tools/decodeprobe.py [--clips 20] [--res 256]
"""

from __future__ import annotations

import argparse
import statistics
import tempfile
import time


def timeit(fn, n, *args):
    fn(*args)  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn(*args)
        ts.append((time.perf_counter() - t0) * 1000)
    return statistics.median(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=20)
    ap.add_argument("--res", type=int, default=256, help="source video res")
    ap.add_argument("--frames", type=int, default=90, help="source frames")
    ap.add_argument("--num_frames", type=int, default=32)
    ap.add_argument("--image", type=int, default=224)
    ap.add_argument("--flow", type=int, default=224)
    args = ap.parse_args()

    import cv2
    import numpy as np

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import decode_clip_uint8, make_synthetic_video

    path = tempfile.mktemp(suffix=".mp4")
    make_synthetic_video(path, num_frames=args.frames, size=args.res)
    n = args.clips

    cur = timeit(lambda: decode_clip_uint8(
        path, args.num_frames, 5, args.image, args.flow), n)
    print(f"current              {cur:8.1f} ms/clip")

    from videotgb_tpu.data.video_io import sample_frames

    def read_indices():
        cap = cv2.VideoCapture(path)
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        wanted = sample_frames(args.num_frames, max(total, 1))
        got = {}
        pos = 0
        for t in sorted(set(wanted)):
            while pos <= t:
                if not cap.grab():
                    break
                pos += 1
            ok, f = cap.retrieve()
            if ok:
                got[t] = f
        cap.release()
        return got

    ro = timeit(lambda: read_indices(), n)
    print(f"readonly (floor)     {ro:8.1f} ms/clip")

    def direct_resize(interp):
        cap = cv2.VideoCapture(path)
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        wanted = sample_frames(args.num_frames, max(total, 1))
        out = []
        pos = 0
        for t in sorted(set(wanted)):
            while pos <= t:
                if not cap.grab():
                    break
                pos += 1
            ok, f = cap.retrieve()
            if ok:
                out.append(cv2.resize(f[:, :, ::-1], (args.image, args.image),
                                      interpolation=interp))
        return np.stack(out)

    d_lin = timeit(lambda: direct_resize(cv2.INTER_LINEAR), n)
    print(f"direct224 linear     {d_lin:8.1f} ms/clip")
    d_area = timeit(lambda: direct_resize(cv2.INTER_AREA), n)
    print(f"direct224 area       {d_area:8.1f} ms/clip")

    # how much of `current` is the resize_video passes
    from videotgb_tpu.data.video_io import read_video_cv2

    rv = timeit(lambda: read_video_cv2(
        path, num_frames=args.num_frames,
        size=(max(args.image, args.flow),) * 2), n)
    print(f"read_video_cv2 only  {rv:8.1f} ms/clip  (resize delta "
          f"{cur - rv:.1f})")


if __name__ == "__main__":
    main()
