"""Video frame extraction for indexing.

The reference decodes the best video stream through ffmpeg with a
``scale -> thumbnail(n=interval*fps) -> select(scene>0.05 or first)``
filtergraph and feeds RGB frames to a callback (src/video_reader.rs:9-79);
each kept frame becomes a synthetic ``VideoFrame(container, n)`` document
(src/main.rs:387-427). Here the same filtergraph runs through the ffmpeg
CLI with a rawvideo pipe; gated on ffmpeg being installed.
"""

from __future__ import annotations

import shutil
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = ["ffmpeg_available", "extract_frames"]

SCENE_THRESHOLD = 0.05  # video_reader.rs select filter
DEFAULT_INTERVAL_S = 5.0


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None and shutil.which("ffprobe") is not None


def _probe(path: str) -> Optional[Tuple[int, int, float]]:
    """(width, height, fps) of the best video stream."""
    try:
        out = subprocess.run(
            [
                "ffprobe", "-v", "error", "-select_streams", "v:0",
                "-show_entries", "stream=width,height,r_frame_rate",
                "-of", "csv=p=0", path,
            ],
            capture_output=True, text=True, timeout=60, check=True,
        ).stdout.strip()
        w, h, rate = out.split(",")[:3]
        num, _, den = rate.partition("/")
        fps = float(num) / float(den or 1)
        return int(w), int(h), fps
    except Exception:  # noqa: BLE001
        return None


def extract_frames(
    path: str,
    *,
    max_dim: Optional[int] = None,
    interval_s: float = DEFAULT_INTERVAL_S,
) -> Iterator[np.ndarray]:
    """Yield scene-representative RGB frames as uint8 (H, W, 3) arrays."""
    if not ffmpeg_available():
        raise RuntimeError("ffmpeg not installed; video indexing disabled")
    probed = _probe(path)
    if probed is None:
        raise RuntimeError(f"could not probe video {path}")
    w, h, fps = probed
    if max_dim and max(w, h) > max_dim:
        scale = max_dim / max(w, h)
        w, h = int(w * scale) // 2 * 2, int(h * scale) // 2 * 2

    n_thumb = max(1, round(interval_s * fps))
    vf = (
        f"scale={w}:{h},thumbnail=n={n_thumb},"
        f"select=gt(scene\\,{SCENE_THRESHOLD})+eq(n\\,0)"
    )
    proc = subprocess.Popen(
        [
            "ffmpeg", "-v", "error", "-i", path, "-vf", vf,
            "-vsync", "vfr", "-f", "rawvideo", "-pix_fmt", "rgb24", "-",
        ],
        stdout=subprocess.PIPE,
    )
    frame_bytes = w * h * 3
    try:
        while True:
            data = proc.stdout.read(frame_bytes)
            if len(data) < frame_bytes:
                break
            yield np.frombuffer(data, np.uint8).reshape(h, w, 3)
    finally:
        proc.stdout.close()
        proc.wait()
