"""OCR via the Google Lens private API (reference: src/ocr.rs, ocr.py).

Tall images are sliced into <=1024px strips (ocr.rs:136-175 chunks at
1024, ocr.py:71-79 at 1000), each strip is uploaded as multipart
form data, and the ``AF_initDataCallback`` JSON blob in the response is
parsed for text segments with region coordinates (ocr.rs:50-133).

The network call obviously requires egress; environments without it can
plug any callable ``(png_bytes) -> [(text, (x,y,w,h))...]`` as the
``backend`` argument (used by tests).
"""

from __future__ import annotations

import io
import json
import re
import time
from typing import Callable, List, Optional, Tuple

__all__ = ["chunk_image", "scan_chunks", "ocr_image", "lens_backend"]

MAX_CHUNK_HEIGHT = 1024  # ocr.rs:136
Segment = Tuple[str, Tuple[float, float, float, float]]


def chunk_image(image) -> List:
    """Split a PIL image into vertical strips of height <= 1024px.

    Google Lens rejects very tall images; the reference scans memes (often
    tall screenshot stacks) strip by strip and merges segments.
    """
    chunks = []
    y = 0
    while y < image.height:
        h = min(MAX_CHUNK_HEIGHT, image.height - y)
        chunks.append((y, image.crop((0, y, image.width, y + h))))
        y += h
    return chunks


def scan_chunks(image, backend: Callable[[bytes], List[Segment]]) -> List[Segment]:
    """Run the backend per strip and merge with y-offset correction."""
    segments: List[Segment] = []
    for y_off, chunk in chunk_image(image):
        buf = io.BytesIO()
        chunk.save(buf, "PNG")
        for text, (x, y, w, h) in backend(buf.getvalue()):
            segments.append((text, (x, y + y_off, w, h)))
    return segments


def ocr_image(image, backend: Optional[Callable] = None) -> Tuple[str, List[Segment]]:
    """Full-image OCR -> (joined text, raw segments)."""
    backend = backend or lens_backend
    segments = scan_chunks(image, backend)
    text = "\n".join(s[0] for s in segments)
    return text, segments


_CALLBACK_RE = re.compile(r"AF_initDataCallback\((\{key: 'ds:1'.*?\})\);", re.S)


def _parse_lens_response(html: str) -> List[Segment]:
    """Extract text segments from the AF_initDataCallback payload
    (ocr.rs:50-133's parse, reimplemented against the same response
    shape)."""
    m = _CALLBACK_RE.search(html)
    if not m:
        return []
    # The blob is JS, not strict JSON: quote bare keys then parse.
    blob = re.sub(r"([{,])\s*([A-Za-z_][A-Za-z0-9_]*)\s*:", r'\1"\2":', m.group(1))
    try:
        data = json.loads(blob)
    except json.JSONDecodeError:
        return []
    segments: List[Segment] = []

    def walk(node):
        # Lens encodes each word as [text, ..., [y, x, h, w, ...]] leaves;
        # collect string+geometry pairs wherever they appear.
        if isinstance(node, list):
            if (
                len(node) >= 2
                and isinstance(node[0], str)
                and node[0]
                and isinstance(node[-1], list)
                and len(node[-1]) >= 4
                and all(isinstance(v, (int, float)) for v in node[-1][:4])
            ):
                y, x, h, w = node[-1][:4]
                segments.append((node[0], (x, y, w, h)))
            for child in node:
                walk(child)

    walk(data.get("data", data))
    return segments


def lens_backend(png_bytes: bytes, timeout: float = 30.0) -> List[Segment]:
    """POST one image strip to Google Lens and parse segments.

    Requires network egress. Uses urllib to avoid a hard aiohttp
    dependency in batch tools.
    """
    import urllib.request
    import uuid

    boundary = uuid.uuid4().hex
    body = (
        (
            f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="encoded_image"; '
            'filename="image.png"\r\nContent-Type: image/png\r\n\r\n'
        ).encode()
        + png_bytes
        + f"\r\n--{boundary}--\r\n".encode()
    )
    url = (
        "https://lens.google.com/v3/upload?stcs="
        + str(int(time.time() * 1000))
    )
    req = urllib.request.Request(
        url,
        data=body,
        headers={
            "Content-Type": f"multipart/form-data; boundary={boundary}",
            "User-Agent": "Mozilla/5.0 (X11; Linux x86_64; rv:109.0)",
        },
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return _parse_lens_response(resp.read().decode("utf-8", "replace"))
