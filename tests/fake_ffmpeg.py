#!/usr/bin/env python3
"""Test double for the ffmpeg binary.

This image ships no ffmpeg, so the framework's ffmpeg code paths
(concat demuxer join, browser re-encode, stream-copy trim, cancel
polling, stderr-tail capture) never execute in CI. This script emulates
the argument subset those call sites use, doing the media work with cv2
so outputs are real, probe-able videos:

- ``-f concat -safe 0 -i list.txt ... out.mp4`` — decode each listed
  segment in order, re-encode to one file
- ``-i in.mp4 -t T -c copy out.mp4`` — keep the first ``T`` seconds
- ``-i in.mp4 ... -c:v libx264 ... out.mp4`` — decode + re-encode

Environment hooks for failure-path tests:
- ``FAKE_FFMPEG_FAIL=1`` — print a recognizable message to stderr, exit 1
- ``FAKE_FFMPEG_SLEEP=<s>`` — sleep before doing any work (cancel tests)
"""

import os
import re
import sys
import time


def _parse(argv):
    inputs, concat_list, trim_seconds = [], None, None
    framerate, frame_limit = None, None
    out = argv[-1]
    i = 0
    while i < len(argv) - 1:
        arg = argv[i]
        if arg == "-i":
            inputs.append(argv[i + 1])
            i += 2
            continue
        if arg == "-f" and argv[i + 1] == "concat":
            concat_list = True
            i += 2
            continue
        if arg == "-t":
            trim_seconds = float(argv[i + 1])
            i += 2
            continue
        if arg == "-framerate":
            framerate = float(argv[i + 1])
            i += 2
            continue
        if arg == "-frames:v":
            frame_limit = int(argv[i + 1])
            i += 2
            continue
        i += 1
    if concat_list:
        with open(inputs[0], encoding="utf-8") as handle:
            segments = [re.match(r"file '(.*)'", line.strip()).group(1)
                        for line in handle if line.strip()]
        return segments, trim_seconds, framerate, frame_limit, out
    return inputs[:1], trim_seconds, framerate, frame_limit, out


def main():
    if os.environ.get("FAKE_FFMPEG_FAIL"):
        print("fake-ffmpeg: simulated encoder failure "
              "(Conversion failed!)", file=sys.stderr)
        return 1
    sleep = float(os.environ.get("FAKE_FFMPEG_SLEEP", "0") or 0)
    if sleep:
        time.sleep(sleep)

    import cv2

    sources, trim_seconds, framerate, limit, out = _parse(sys.argv[1:])
    writer = None
    written = 0
    for source in sources:
        # cv2 reads printf-style image sequences (frame_%06d.png) too
        capture = cv2.VideoCapture(source)
        fps = framerate or float(capture.get(cv2.CAP_PROP_FPS) or 24.0)
        if trim_seconds is not None and limit is None:
            limit = max(1, int(round(trim_seconds * fps)))
        while True:
            ok, frame = capture.read()
            if not ok:
                break
            if writer is None:
                writer = cv2.VideoWriter(
                    out, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                    (frame.shape[1], frame.shape[0]))
            writer.write(frame)
            written += 1
            if limit is not None and written >= limit:
                break
        capture.release()
        if limit is not None and written >= limit:
            break
    if writer is None:
        print("fake-ffmpeg: no frames decoded", file=sys.stderr)
        return 1
    writer.release()
    return 0


if __name__ == "__main__":
    sys.exit(main())
