"""Frame-source abstraction: video file, webcam, or image directory.

Behavioral parity with reference streaming.py:21-103 (`Stream`): path=None
-> webcam device 0, file -> cv2.VideoCapture, directory -> sorted/filtered
image list; aspect-preserving width resize.
"""
from __future__ import annotations

import os
import time

import numpy as np

from ..utils.log import get_logger

logger = get_logger(__name__)


class Stream:
    """Stream frames from file, directory or webcam."""

    def __init__(self, path=None, *, filter_func=None, sort_func=None,
                 set_width: int = 640, frame_delay: float = 1 / 24):
        self.path = path = path if path is not None else 0
        self.set_width = set_width
        self.frame_delay = frame_delay
        self.cap = None
        self.files = None
        if os.path.isdir(path if isinstance(path, str) else ""):
            self.files = sorted(os.listdir(path))
            if filter_func:
                self.files = list(filter(filter_func, self.files))
            if sort_func:
                self.files.sort(key=sort_func)
        else:
            # webcam index (0), file, or any other cv2-openable source
            # (rtsp/http URLs, mistyped paths): always construct the
            # capture so play() sees an unopened cap and logs the error
            # instead of crashing on cap=None
            import cv2
            self.cap = cv2.VideoCapture(path)
            if not self.cap.isOpened():
                logger.error(f"Error opening input video: {path}")

    def change_frame_size(self, frame: np.ndarray) -> np.ndarray:
        import cv2
        h, w, _ = frame.shape
        scale = self.set_width / w
        return cv2.resize(frame, (self.set_width, int(h * scale)))

    def play_from_video(self):
        import cv2
        try:
            while self.cap.isOpened():
                ret, frame = self.cap.read()
                if not ret:
                    logger.info("end of stream")
                    break
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                if self.set_width:
                    frame = self.change_frame_size(frame)
                yield frame
        finally:
            self.cap.release()

    def play_from_list(self):
        from PIL import Image
        for file in self.files:
            if self.frame_delay:
                time.sleep(self.frame_delay)
            frame = np.asarray(
                Image.open(os.path.join(self.path, file)).convert("RGB"))
            if self.set_width:
                frame = self.change_frame_size(frame)
            yield frame

    def play(self):
        if isinstance(self.path, str) and os.path.isdir(self.path):
            yield from self.play_from_list()
        else:
            yield from self.play_from_video()


class MultiStream:
    """Zip several Streams into per-tick frame batches for batched serving.

    The reference serves one stream per process (streaming.py feeds one
    Detector); on TPU the serve program's cost is dominated by fixed
    per-call overheads at batch 1 (BENCH_NOTES.md: lite4 b1 5.0 ms vs b8
    14.1 ms => 2.8x throughput), so >1 stream should ride one batched
    call. Yields (indices, frames): the list of source indices still
    alive this tick and their frames. Ends when every source is
    exhausted.
    """

    def __init__(self, streams):
        self.streams = list(streams)

    def play(self):
        iters = [s.play() for s in self.streams]
        alive = [True] * len(iters)
        while any(alive):
            indices, frames = [], []
            for i, it in enumerate(iters):
                if not alive[i]:
                    continue
                try:
                    frames.append(next(it))
                    indices.append(i)
                except StopIteration:
                    alive[i] = False
            if indices:
                yield indices, frames
