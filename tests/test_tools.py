"""CLI tool smoke tests (small scales, no network)."""

import json
import sys

import numpy as np
import pytest


def test_ann_bench_small(capsys):
    from meme_search_engine_tpu.tools.ann_bench import main

    main(
        [
            "--n", "400", "--d", "32", "--r", "8", "--l", "24",
            "--maxc", "48", "--batch-size", "128", "--eval-queries", "32",
        ]
    )
    out = capsys.readouterr().out
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["recall@10"] > 0.7
    assert stats["qps"] > 0


def test_vec_dist_svg(tmp_path):
    from meme_search_engine_tpu.tools.vec_dist import main

    rng = np.random.default_rng(0)
    data = rng.standard_normal((500, 16)).astype(np.float16)
    p = tmp_path / "v.bin"
    data.tofile(str(p))
    out = tmp_path / "d.svg"
    main(["--vectors", str(p), "--d-emb", "16", "--output", str(out)])
    svg = out.read_text()
    assert svg.startswith("<svg") and "<rect" in svg


def test_content_hash(tmp_path, capsys):
    from meme_search_engine_tpu.tools.content_hash import main

    p = tmp_path / "f.bin"
    p.write_bytes(b"hello")
    main([str(p)])
    out1 = capsys.readouterr().out
    main([str(p)])
    out2 = capsys.readouterr().out
    assert out1 == out2 and out1.split()[0].isdigit()


def test_dump_tool_stats(tmp_path, capsys):
    from meme_search_engine_tpu.pipeline.dump import (
        DumpWriter,
        OriginalImageMetadata,
        ProcessedEntry,
    )
    from meme_search_engine_tpu.tools.dump_tool import main

    rng = np.random.default_rng(1)
    path = str(tmp_path / "000000001.dump.zst")
    with DumpWriter(path) as w:
        for i in range(5):
            w.write(
                ProcessedEntry(
                    url=f"u{i}", id=f"i{i}", title="t", subreddit="s",
                    author="a", timestamp=i,
                    embedding=rng.standard_normal(16).astype(np.float32),
                    metadata=OriginalImageMetadata("image/png", 1, (2, 2), f"f{i}"),
                )
            )
    main(["stats", "--dumps", path])
    stats = json.loads(capsys.readouterr().out.strip())
    assert stats["entries"] == 5 and stats["duplicates"] == 0

    main(
        [
            "sample", "--dumps", path, "--fraction", "1.0",
            "--output", str(tmp_path / "s.bin"),
        ]
    )
    sample = np.fromfile(str(tmp_path / "s.bin"), np.float16).reshape(-1, 16)
    assert len(sample) == 5
