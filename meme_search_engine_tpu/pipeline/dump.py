"""Scrape-dump files: zstd-compressed msgpack streams of ProcessedEntry.

Format parity with the reference dump files (src/common.rs:118-129
ProcessedEntry, reddit_dump.rs:252-260 writer): each entry is a msgpack
map {url, id, title, subreddit, author, timestamp, embedding (fp16 LE
bytes), metadata {mime_type, original_file_size, dimension, final_url}}
in one continuous zstd stream per output file.

Resume support mirrors reddit_dump.rs:269-301: readback of the highest-
sequence-number dump finds the newest timestamp already processed.
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Iterator, Optional, Tuple

import msgpack
import numpy as np

from ..utils.fp16 import decode_fp16_buffer, encode_fp16_buffer


@dataclasses.dataclass
class OriginalImageMetadata:
    mime_type: str
    original_file_size: int
    dimension: Tuple[int, int]
    final_url: str


@dataclasses.dataclass
class ProcessedEntry:
    url: str
    id: str
    title: str
    subreddit: str
    author: str
    timestamp: int
    embedding: np.ndarray  # (D,) f32 (fp16 on the wire)
    metadata: OriginalImageMetadata

    def to_dict(self) -> dict:
        return {
            "url": self.url,
            "id": self.id,
            "title": self.title,
            "subreddit": self.subreddit,
            "author": self.author,
            "timestamp": self.timestamp,
            "embedding": encode_fp16_buffer(self.embedding),
            "metadata": {
                "mime_type": self.metadata.mime_type,
                "original_file_size": self.metadata.original_file_size,
                "dimension": list(self.metadata.dimension),
                "final_url": self.metadata.final_url,
            },
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ProcessedEntry":
        m = d["metadata"]
        return cls(
            url=d["url"],
            id=d["id"],
            title=d["title"],
            subreddit=d["subreddit"],
            author=d["author"],
            timestamp=d["timestamp"],
            embedding=decode_fp16_buffer(d["embedding"]),
            metadata=OriginalImageMetadata(
                mime_type=m["mime_type"],
                original_file_size=m["original_file_size"],
                dimension=tuple(m["dimension"]),
                final_url=m["final_url"],
            ),
        )


class DumpWriter:
    def __init__(self, path: str, level: int = 8):
        import zstandard

        self._f = open(path, "wb")
        self._compressor = zstandard.ZstdCompressor(level=level).stream_writer(
            self._f
        )

    def write(self, entry: ProcessedEntry):
        self._compressor.write(msgpack.packb(entry.to_dict()))

    def close(self):
        self._compressor.close()
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_dump(path: str) -> Iterator[ProcessedEntry]:
    """Stream entries until EOF (dump_processor.rs:118-131 reader)."""
    import zstandard

    with open(path, "rb") as f:
        stream = zstandard.ZstdDecompressor().stream_reader(f)
        unpacker = msgpack.Unpacker(stream, raw=False)
        for obj in unpacker:
            yield ProcessedEntry.from_dict(obj)


_SEQ_RE = re.compile(r"(\d+)\.dump\.zst$")


def latest_timestamp(dump_dir: str) -> Optional[int]:
    """Max timestamp in the highest-seqnum dump (scraper resume,
    reddit_dump.rs:269-301)."""
    best_seq, best_path = -1, None
    for name in os.listdir(dump_dir):
        m = _SEQ_RE.search(name)
        if m and int(m.group(1)) > best_seq:
            best_seq, best_path = int(m.group(1)), os.path.join(dump_dir, name)
    if best_path is None:
        return None
    ts = None
    for entry in read_dump(best_path):
        ts = max(ts or 0, entry.timestamp)
    return ts
