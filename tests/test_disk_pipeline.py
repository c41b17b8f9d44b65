"""Large-scale pipeline end to end at miniature scale:

dumps -> dedup/shard split (2-way spill) -> per-shard Vamana build ->
adjacency merge -> OPQ pack (4096B records) -> DiskIndex beam search +
evaluate harness. Mirrors SURVEY SS3.4's multi-binary flow in-process.
"""

import os

import numpy as np
import pytest

from meme_search_engine_tpu.index.disk_index import DiskIndex
from meme_search_engine_tpu.index.kmeans import balanced_kmeans
from meme_search_engine_tpu.index.opq import train_opq
from meme_search_engine_tpu.pipeline import processor
from meme_search_engine_tpu.pipeline.build_shard import build_shard
from meme_search_engine_tpu.pipeline.dump import (
    DumpWriter,
    OriginalImageMetadata,
    ProcessedEntry,
    read_dump,
)
from meme_search_engine_tpu.pipeline.formats import (
    PackedIndexEntry,
    read_shard_output,
)

D = 64
N = 600


def _entries(rng, n):
    x = rng.standard_normal((n, D)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    for i in range(n):
        yield ProcessedEntry(
            url=f"https://example.com/{i}",
            id=f"id{i}",
            title=f"meme {i}",
            subreddit="memes",
            author="a",
            timestamp=1700000000 + i,
            embedding=x[i],
            metadata=OriginalImageMetadata(
                mime_type="image/png",
                original_file_size=1000 + i,
                dimension=(64, 48),
                final_url=f"https://cdn.example.com/{i}.png",
            ),
        )


@pytest.fixture(scope="module")
def built_index(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("disk")
    rng = np.random.default_rng(0)

    # 1. write a dump
    dump_path = str(tmp / "000000001.dump.zst")
    with DumpWriter(dump_path) as w:
        for e in _entries(rng, N):
            w.write(e)

    # 2. k-means centroids + shard split
    sample = processor.sample_embeddings([dump_path], 1.0, seed=0)
    centroids = balanced_kmeans(
        sample.astype(np.float32), 3, max_iter=60, seed=0, target_frac=0.5
    )
    shard_dir = str(tmp / "shards")
    count, manifest = processor.split_to_shards(
        [dump_path], centroids, shard_dir, deduplicate=True
    )
    assert count == N

    # 3. per-shard Vamana builds (with OOD query vectors)
    queries = rng.standard_normal((32, D)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    shard_outputs = []
    vectors = np.zeros((N, D), np.float32)
    for s in range(3):
        in_path = os.path.join(shard_dir, f"shard_{s}.msgpack")
        out_path = os.path.join(shard_dir, f"shard_{s}.graph")
        build_shard(
            in_path,
            out_path,
            query_vectors=queries,
            r=12,
            l=32,
            maxc=64,
            batch_size=128,
            seed=s,
        )
        header, adjacency = read_shard_output(out_path)
        shard_outputs.append((header, adjacency))
        # collect vectors back for packing
        from meme_search_engine_tpu.pipeline.formats import read_shard_input

        h_in, records = read_shard_input(in_path)
        for rid, vec in records:
            vectors[rid] = vec

    # 4. merge adjacency + OPQ + pack
    vertices, node_shards = processor.merge_shard_adjacency(shard_outputs, N)
    pq = train_opq(
        vectors,
        queries,
        n_chunks=8,
        n_centroids=32,
        outer_iters=1,
        adam_iters=30,
        batch_size=N,
        query_batch_size=32,
    )
    out_dir = str(tmp / "index")
    scores = rng.standard_normal((N, 3)).astype(np.float32)
    from meme_search_engine_tpu.pipeline.descriptors import compute_cdfs

    cdfs = compute_cdfs(scores, [m["timestamp"] for m in manifest])
    header = processor.pack_index(
        out_dir,
        vectors,
        vertices,
        node_shards,
        manifest,
        pq,
        centroids,
        [h.mapping[h.medioid] for h, _ in shard_outputs],
        scores=scores,
        descriptor_cdfs=cdfs,
    )
    return out_dir, vectors, manifest


def test_dump_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    path = str(tmp_path / "d.dump.zst")
    entries = list(_entries(rng, 10))
    with DumpWriter(path) as w:
        for e in entries:
            w.write(e)
    back = list(read_dump(path))
    assert len(back) == 10
    assert back[3].url == entries[3].url
    assert back[3].metadata.final_url == entries[3].metadata.final_url
    np.testing.assert_allclose(
        back[3].embedding, entries[3].embedding, rtol=1e-3, atol=1e-3
    )


def test_dedup_ring():
    rng = np.random.default_rng(2)
    ring = processor.DedupRing(capacity=100)
    entries = list(_entries(rng, 5))
    for e in entries:
        assert ring.admit(e)
    # exact duplicate embedding + url -> rejected
    assert not ring.admit(entries[0])
    assert ring.deduped == 1


def test_packed_record_roundtrip():
    rng = np.random.default_rng(3)
    e = PackedIndexEntry(
        id=7,
        vector=rng.standard_normal(D).astype(np.float32),
        vertices=[1, 2, 3],
        timestamp=12345,
        dimensions=(10, 20),
        scores=[0.5, -1.0, 2.0],
        url="https://x.test/a.png",
        shards=[0, 2],
    )
    packed = e.pack(4096)
    assert len(packed) == 4096
    back = PackedIndexEntry.unpack(packed)
    assert back.id == 7 and back.vertices == [1, 2, 3]
    assert back.url == e.url and back.shards == [0, 2]
    np.testing.assert_allclose(back.vector, e.vector, rtol=1e-2, atol=1e-3)


def test_packed_record_oversize_url_goes_dead():
    """A record whose URL pushes it past the pad size keeps its graph
    role but drops the payload URL (dump_processor.rs:510-517)."""
    rng = np.random.default_rng(4)
    e = PackedIndexEntry(
        id=9,
        vector=rng.standard_normal(D).astype(np.float32),
        vertices=list(range(64)),
        timestamp=12345,
        dimensions=(10, 20),
        scores=[0.5],
        url="https://x.test/" + "a" * 4096,
        shards=[1],
    )
    packed, dead = e.pack_ex(4096)
    assert dead and len(packed) == 4096
    back = PackedIndexEntry.unpack(packed)
    assert back.url == "" and back.vertices == list(range(64))
    # an empty-url record is not dead (nothing was dropped)
    e.url = ""
    _packed, dead = e.pack_ex(4096)
    assert not dead


def test_disk_index_opens(built_index):
    out_dir, vectors, _ = built_index
    idx = DiskIndex(out_dir)
    assert idx.header.count == N
    assert idx.pq_codes.shape == (N, 8)
    assert idx.descriptors.shape == (N, 4)
    node = idx.read_nodes([5])[0]
    np.testing.assert_allclose(node.vector, vectors[5], rtol=1e-2, atol=1e-3)


def test_disk_index_beam_search(built_index):
    out_dir, vectors, manifest = built_index
    idx = DiskIndex(out_dir)
    q = vectors[17]
    results, counters = idx.search(q, 10, beamwidth=3, search_list=200)
    assert counters.node_reads > 0 and counters.pq_comparisons > 0
    ids = [r.id for r in results]
    assert 17 in ids[:3]  # self-recall near the top
    assert results[0].url.startswith("https://")


def test_disk_index_descriptor_sliders(built_index):
    """Descriptor scales shift the frontier ordering but search still
    returns valid results (query_disk_index.rs:463-473)."""
    out_dir, vectors, _ = built_index
    idx = DiskIndex(out_dir)
    scales = np.array([1.0 / 512, 0, 0, 0], np.float32)
    results, _ = idx.search(
        vectors[3], 5, descriptor_scales=scales, search_list=100
    )
    assert len(results) == 5


def test_disk_index_evaluate(built_index):
    out_dir, vectors, _ = built_index
    idx = DiskIndex(out_dir)
    rng = np.random.default_rng(5)
    qs = vectors[rng.integers(0, N, 8)]
    stats = idx.evaluate(qs, k=10, beamwidth=3, search_list=300)
    assert stats["recall"] > 0.7, stats
    assert stats["mean_pq_comparisons"] > 0


def test_native_reader_matches_python(built_index):
    out_dir, _, _ = built_index
    from meme_search_engine_tpu.index import native_io

    path = os.path.join(out_dir, "index.bin")
    py = native_io.PythonReader(path, 4096)
    ids = [0, 5, 3, N - 1]
    expected = py.read_batch(ids)
    if native_io._load_native() is None:
        pytest.skip("native diskio unavailable")
    nat = native_io.NativeReader(path, 4096)
    got = nat.read_batch(ids)
    assert got == expected
    nat.close()
    py.close()


def test_disk_query_server(built_index, tmp_path):
    """HTTP parity for the large-scale backend (query_disk_index.rs
    serve mode)."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from meme_search_engine_tpu.serving.disk_query_server import make_app

    out_dir, vectors, _ = built_index
    idx = DiskIndex(out_dir)

    class FakeEmbedder:
        class config:
            embedding_size = D
            batch = 8
            image_size = (8, 8)

        async def embed_texts(self, texts):
            rng = np.random.default_rng(abs(hash(tuple(texts))) % 2**31)
            v = rng.standard_normal((len(texts), D)).astype(np.float32)
            return v / np.linalg.norm(v, axis=1, keepdims=True)

        async def embed_image_bytes(self, images):
            raise NotImplementedError

    telemetry_path = str(tmp_path / "telemetry.msgpack")

    async def run():
        app = make_app(
            idx, FakeEmbedder(), telemetry_path=telemetry_path, search_list=200
        )
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            resp = await client.get("/")
            init = await resp.json()
            assert init["n_total"] > 0 and init["d_emb"] == D
            assert "Meme" in init["predefined_embedding_names"]

            # raw-embedding query with a Meme descriptor slider
            q = vectors[9].tolist()
            resp = await client.post(
                "/",
                json={
                    "terms": [
                        {"embedding": q},
                        {"predefined_embedding": "Meme", "weight": 0.5},
                    ],
                    "k": 5,
                    "debug_enabled": True,
                },
            )
            body = await resp.json()
            assert len(body["matches"]) == 5
            score, url = body["matches"][0][:2]
            assert url.startswith("https://")
            assert body["matches"][0][5]["shards"] is not None

            resp = await client.post("/telemetry", json={"event": "search"})
            assert resp.status == 204
        finally:
            await client.close()

    asyncio.run(run())
    import time

    time.sleep(0.2)  # writer thread flush
    assert os.path.getsize(telemetry_path) > 0


def test_search_all_shards_improves_coverage(built_index):
    """Cross-shard rank-merge recalls at least as much as single-shard."""
    out_dir, vectors, _ = built_index
    idx = DiskIndex(out_dir)
    rng = np.random.default_rng(11)
    hits_single, hits_multi = 0, 0
    for qi in rng.integers(0, N, 12):
        q = vectors[qi]
        single, _ = idx.search(q, 10, search_list=150, dedup=False)
        multi, counters = idx.search_all_shards(q, 10, search_list=150)
        hits_single += qi in [r.id for r in single]
        hits_multi += qi in [r.id for r in multi]
        assert counters.node_reads > 0
    assert hits_multi >= hits_single
    assert hits_multi >= 10  # self-recall across shards


def test_descriptor_sliders_reorder_final_ranking(built_index):
    """Descriptor scales bias the EXACT rerank score too
    (query_disk_index.rs:168-169), so sliders reorder returned results,
    not just the PQ frontier."""
    out_dir, vectors, _ = built_index
    idx = DiskIndex(out_dir)
    q = vectors[3]
    plain, _ = idx.search(q, 50, search_list=200, dedup=False)
    # mild slider on descriptor column 0 (uint8 codes, so 0.01 adds up
    # to ~2.55): enough to reorder, small enough to keep overlap
    s0 = 0.01
    scales = np.array([s0, 0, 0, 0], np.float32)
    biased, _ = idx.search(
        q, 50, search_list=200, descriptor_scales=scales, dedup=False
    )
    by_id_plain = {r.id: r.score for r in plain}
    moved = [r for r in biased if r.id in by_id_plain]
    assert moved, "no overlap between runs"
    # every overlapping node's score includes its descriptor product
    for r in moved:
        expect = by_id_plain[r.id] + float(
            idx.descriptors[r.id, 0].astype(np.float32) * s0
        )
        assert abs(r.score - expect) < 1e-3, (r.id, r.score, expect)
    # and the bias actually reorders the ranking
    assert [r.id for r in biased] != [r.id for r in plain]


def test_search_all_shards_dedups_merged(built_index):
    """Cross-shard merge applies the cosine>0.95 dedup once on the
    merged ranking (parity with the single-shard serve path)."""
    out_dir, vectors, _ = built_index
    idx = DiskIndex(out_dir)
    q = vectors[5]
    deduped, _ = idx.search_all_shards(q, 10, search_list=150)
    raw, _ = idx.search_all_shards(q, 10, search_list=150, dedup=False)
    assert len(deduped) <= len(raw) or deduped != raw
    embs = np.stack([r.embedding for r in deduped]).astype(np.float32)
    embs /= np.maximum(np.linalg.norm(embs, axis=1, keepdims=True), 1e-30)
    sim = embs @ embs.T
    np.fill_diagonal(sim, 0)
    assert sim.max() <= 0.95 + 1e-6


def test_scale_bench_tool_end_to_end(tmp_path, monkeypatch):
    """The production-geometry scale benchmark tool runs its whole
    staged pipeline (dump -> kmeans -> spill-2 shards -> builds -> OPQ ->
    pack -> serve QPS -> oracle eval) at miniature scale and emits a
    coherent report (VERDICT r1 item 4 tooling)."""
    import json

    from meme_search_engine_tpu.tools import scale_bench

    # miniature geometry: keep the tool's own d_emb (wire format), tiny
    # graph params
    wd = str(tmp_path / "scale")
    scale_bench.main([
        "--workdir", wd, "--n", "400", "--clusters", "3",
        "--r", "8", "--l", "16", "--maxc", "32", "--build-batch", "128",
        "--serve-queries", "8", "--eval-queries", "8",
        "--search-list", "64", "--beamwidth", "2",
        "--pq-chunks", "8", "--pq-centroids", "16", "--ood-queries", "16",
    ])
    report = json.load(open(f"{wd}/report.json"))
    assert report["n"] == 400
    assert set(report["qps_vs_threads"]) == {"1", "2", "4"} or set(
        report["qps_vs_threads"]
    ) == {1, 2, 4}
    assert report["eval"]["recall_at_20"] > 0.3
    assert report["eval"]["median_rank"] <= 20
    # resumability: a second invocation reuses every artifact (graphs
    # untouched on disk) and inherits the first run's stage timings
    first_builds_s = report["stages_s"]["shard_builds"]
    graph_mtimes = {
        p: os.path.getmtime(os.path.join(wd, "shards", p))
        for p in os.listdir(os.path.join(wd, "shards"))
        if p.endswith(".graph")
    }
    assert graph_mtimes
    scale_bench.main([
        "--workdir", wd, "--n", "400", "--clusters", "3",
        "--r", "8", "--l", "16", "--maxc", "32", "--build-batch", "128",
        "--serve-queries", "8", "--eval-queries", "8",
        "--search-list", "64", "--beamwidth", "2",
        "--pq-chunks", "8", "--pq-centroids", "16", "--ood-queries", "16",
    ])
    report2 = json.load(open(f"{wd}/report.json"))
    assert report2["stages_s"]["shard_builds"] == first_builds_s
    assert "shards_built" not in report2  # nothing rebuilt
    for p, mt in graph_mtimes.items():
        assert os.path.getmtime(os.path.join(wd, "shards", p)) == mt

    # the persisted oracle powers host-only recall/QPS sweeps: at the
    # tail's own operating point the sweep must reproduce its recall
    from meme_search_engine_tpu.tools import recall_sweep

    rows = recall_sweep.main([
        "--index", os.path.join(wd, "index"),
        "--oracle", os.path.join(wd, "eval_oracle.npz"),
        "--search-lists", "64", "--beamwidth", "2", "--queries", "8",
    ])
    assert rows[0]["recall_at_20"] == report["eval"]["recall_at_20"]

    # --partial-tail with missing shard graphs: the tail re-packs from
    # the surviving graphs, reports honest coverage <1, and scores BOTH
    # raw recall (bounded by coverage) and covered-restricted recall
    # (the quality of what was built; >= raw by construction). Two of
    # three graphs must go: with 2-way spill a record is only uncovered
    # when BOTH its shards are unbuilt.
    os.remove(os.path.join(wd, "shards", "shard_1.graph"))
    os.remove(os.path.join(wd, "shards", "shard_2.graph"))
    import shutil

    shutil.rmtree(os.path.join(wd, "index"))
    scale_bench.main([
        "--workdir", wd, "--n", "400", "--clusters", "3",
        "--r", "8", "--l", "16", "--maxc", "32", "--build-batch", "128",
        "--serve-queries", "8", "--eval-queries", "8",
        "--search-list", "64", "--beamwidth", "2",
        "--pq-chunks", "8", "--pq-centroids", "16", "--ood-queries", "16",
        "--partial-tail",
    ])
    report3 = json.load(open(f"{wd}/report.json"))
    cov = report3["coverage"]
    assert cov["built_shards"] == 1 and cov["total_shards"] == 3
    assert 0 < cov["fraction"] < 1
    ev = report3["eval"]
    assert ev["recall_at_20_covered"] >= ev["recall_at_20"]
    assert ev["recall_at_20_covered"] > 0.3

    # --stage resplit: regenerate shard inputs after a frugal-disk
    # deletion, byte-exact, from vectors.f16 + the saved assignment
    inputs = {
        s: open(os.path.join(wd, "shards", f"shard_{s}.msgpack"), "rb").read()
        for s in range(3)
    }
    assert os.path.exists(os.path.join(wd, "assignment.npy"))
    for s in range(3):
        os.remove(os.path.join(wd, "shards", f"shard_{s}.msgpack"))
    scale_bench.main([
        "--workdir", wd, "--n", "400", "--clusters", "3",
        "--stage", "resplit",
    ])
    for s in range(3):
        back = open(
            os.path.join(wd, "shards", f"shard_{s}.msgpack"), "rb"
        ).read()
        assert back == inputs[s]
    report4 = json.load(open(f"{wd}/report.json"))
    assert "resplit" in report4["stages_s"]

    # a DIVERGENT replay (here: perturbed centroids; in production e.g.
    # a forgotten non-default --balance-fudge) must refuse to write
    # anything — neither shard inputs nor assignment.npy, which later
    # resumes load on trust
    from meme_search_engine_tpu.pipeline import processor as _proc

    apath = os.path.join(wd, "assignment.npy")
    os.remove(apath)
    os.remove(os.path.join(wd, "shards", "shard_0.msgpack"))
    import numpy as _np

    _prng = _np.random.default_rng(0)
    cents = _np.load(os.path.join(wd, "centroids.npy"))
    bad = cents + 0.3 * _prng.standard_normal(cents.shape).astype(cents.dtype)
    with pytest.raises(RuntimeError, match="divergent replay"):
        _proc.regenerate_shard_inputs(
            os.path.join(wd, "vectors.f16"), 400, bad,
            os.path.join(wd, "shards"), balance_fudge=0.2,
            assignment_path=apath,
        )
    assert not os.path.exists(apath)
    assert not os.path.exists(os.path.join(wd, "shards", "shard_0.msgpack"))
    # and the clean replay recovers byte-exactly after the failed one
    _proc.regenerate_shard_inputs(
        os.path.join(wd, "vectors.f16"), 400, cents,
        os.path.join(wd, "shards"), balance_fudge=0.2,
        assignment_path=apath,
    )
    assert (
        open(os.path.join(wd, "shards", "shard_0.msgpack"), "rb").read()
        == inputs[0]
    )
    assert os.path.exists(apath)


def test_scale_bench_max_build_records_resume_loop(tmp_path, monkeypatch):
    """The leak-cap resume protocol: with --max-build-records, each pass
    builds shards until the record budget is hit, exits with code 3, and
    a fresh invocation (run_build.sh's loop) picks up where it left off;
    the final pass (no shards left) runs the tail and completes. This is
    exactly how the real 1e7 run executes (~40 shards per pass around
    the tunnel-plugin RSS leak, BENCHMARKS.md); here the budget forces
    one shard per pass. Also checks the tpu_lease advertisement
    lifecycle: busy while a pass is live-ish, cleared on completion."""
    import json

    from meme_search_engine_tpu.tools import scale_bench
    from meme_search_engine_tpu.utils import tpu_lease

    monkeypatch.setattr(
        tpu_lease, "BUSY_PATH", str(tmp_path / "busy.json")
    )
    wd = str(tmp_path / "scale")
    argv = [
        "--workdir", wd, "--n", "400", "--clusters", "3",
        "--r", "8", "--l", "16", "--maxc", "32", "--build-batch", "128",
        "--serve-queries", "8", "--eval-queries", "8",
        "--search-list", "64", "--beamwidth", "2",
        "--pq-chunks", "8", "--pq-centroids", "16", "--ood-queries", "16",
        "--eval-queries-allshards", "0",
        "--max-build-records", "1",  # any built shard exceeds it
    ]
    exit3s = 0
    for _pass in range(10):
        try:
            scale_bench.main(argv)
            break  # completed (tail ran)
        except SystemExit as e:
            assert e.code == 3
            exit3s += 1
            # mid-run: the busy advertisement names this process
            busy = json.load(open(tpu_lease.BUSY_PATH))
            assert busy["pid"] == os.getpid()
            assert busy["workdir"] == wd
    else:
        pytest.fail("resume loop did not converge in 10 passes")
    # 3 clusters -> >=2 build passes (one shard each, budget 1 record,
    # plus possibly a builds-complete exit before the tail pass)
    assert exit3s >= 3
    report = json.load(open(f"{wd}/report.json"))
    assert report["eval"]["recall_at_20"] > 0.3
    # stage timings accumulated across the restarts
    assert report["stages_s"]["shard_builds"] > 0
    # completion clears the advertisement
    assert not os.path.exists(tpu_lease.BUSY_PATH)


def test_native_beam_search_matches_python(built_index):
    """The C++ disknav beam search (the GIL-free serving hot loop)
    returns identical ranked results and counters to the Python
    reference loop — with and without descriptor sliders, across
    start shards."""
    out_dir, vectors, _ = built_index
    from meme_search_engine_tpu.index import native_io

    if native_io._load_native() is None:
        pytest.skip("native diskio unavailable")
    idx_nat = DiskIndex(out_dir)
    assert idx_nat._nav is not None, "native nav should attach"
    idx_py = DiskIndex(
        out_dir,
        io_backend=native_io.PythonReader(
            os.path.join(out_dir, "index.bin"), 4096
        ),
    )
    assert idx_py._nav is None

    rng = np.random.default_rng(11)
    scale_sets = [None, np.array([1 / 512, 0, -1 / 512, 0], np.float32)]
    for qi in rng.integers(0, N, 6):
        for scales in scale_sets:
            for dedup in (False, True):
                rn, cn = idx_nat.search(
                    vectors[qi], 10, beamwidth=3, search_list=150,
                    descriptor_scales=scales, dedup=dedup,
                )
                rp, cp = idx_py.search(
                    vectors[qi], 10, beamwidth=3, search_list=150,
                    descriptor_scales=scales, dedup=dedup,
                )
                assert [r.id for r in rn] == [r.id for r in rp]
                np.testing.assert_allclose(
                    [r.score for r in rn], [r.score for r in rp],
                    rtol=1e-5, atol=1e-6,
                )
                assert cn.node_reads == cp.node_reads
                assert cn.pq_comparisons == cp.pq_comparisons
                assert all(r.url for r in rn if r.id < N)


def test_native_speculative_reads_are_result_invariant(built_index):
    """spec>0 (speculative frontier reads per hop) must change only the
    IO schedule: ranked ids/scores and pq comparisons identical to
    spec=0; node_reads may rise (speculation that the beam never
    consumed) but each visited node is read at most once, so it is
    bounded by spec extra reads per hop."""
    out_dir, vectors, _ = built_index
    from meme_search_engine_tpu.index import native_io

    if native_io._load_native() is None:
        pytest.skip("native diskio unavailable")
    idx = DiskIndex(out_dir)
    assert idx._nav is not None

    rng = np.random.default_rng(13)
    for qi in rng.integers(0, N, 5):
        r0, c0 = idx.search(
            vectors[qi], 10, beamwidth=3, search_list=150, spec=0
        )
        for spec in (1, 4, 16):
            rs_, cs = idx.search(
                vectors[qi], 10, beamwidth=3, search_list=150, spec=spec
            )
            assert [r.id for r in rs_] == [r.id for r in r0]
            np.testing.assert_allclose(
                [r.score for r in rs_], [r.score for r in r0],
                rtol=1e-6, atol=1e-7,
            )
            assert cs.pq_comparisons == c0.pq_comparisons
            assert cs.node_reads >= c0.node_reads


def test_native_speculative_reads_mmap_path(built_index, monkeypatch):
    """On the opt-in mmap reader (MSE_DISKIO_MMAP=1) speculation is
    POSIX_MADV_WILLNEED readahead — results and node_reads must both be
    identical to spec=0 (no extra reads are issued, only advice)."""
    out_dir, vectors, _ = built_index
    from meme_search_engine_tpu.index import native_io

    if native_io._load_native() is None:
        pytest.skip("native diskio unavailable")
    monkeypatch.setenv("MSE_DISKIO_MMAP", "1")
    idx = DiskIndex(out_dir)
    assert idx._nav is not None

    rng = np.random.default_rng(17)
    for qi in rng.integers(0, N, 3):
        r0, c0 = idx.search(
            vectors[qi], 10, beamwidth=3, search_list=150, spec=0
        )
        rs_, cs = idx.search(
            vectors[qi], 10, beamwidth=3, search_list=150, spec=8
        )
        assert [r.id for r in rs_] == [r.id for r in r0]
        assert cs.node_reads == c0.node_reads
        assert cs.pq_comparisons == c0.pq_comparisons


def test_resplit_regenerates_deleted_inputs_byte_exact(tmp_path):
    """--frugal-disk inverse: regenerate_shard_inputs must reproduce
    deleted shard input files byte-for-byte, from the saved assignment
    AND from a cold replay, verified against a built shard graph."""
    rng = np.random.default_rng(9)
    dump_path = str(tmp_path / "000000001.dump.zst")
    with DumpWriter(dump_path) as w:
        for e in _entries(rng, N):
            w.write(e)
    sample = processor.sample_embeddings([dump_path], 1.0, seed=0)
    centroids = balanced_kmeans(
        sample.astype(np.float32), 4, max_iter=40, seed=0, target_frac=0.5
    )
    shard_dir = str(tmp_path / "shards")
    assign_path = str(tmp_path / "assignment.npy")
    count, _manifest = processor.split_to_shards(
        [dump_path],
        centroids,
        shard_dir,
        deduplicate=True,
        save_assignment=assign_path,
    )
    assert count == N
    assignment = np.load(assign_path)
    assert assignment.shape == (N, processor.SHARD_SPILL)

    def input_bytes():
        return {
            s: open(os.path.join(shard_dir, f"shard_{s}.msgpack"), "rb").read()
            for s in range(4)
        }

    originals = input_bytes()

    # collect the flat fp16 corpus the way the scale_bench tail does
    from meme_search_engine_tpu.pipeline.formats import read_shard_input

    vectors = np.zeros((N, D), np.float16)
    for s in range(4):
        _h, records = read_shard_input(
            os.path.join(shard_dir, f"shard_{s}.msgpack")
        )
        for rid, vec in records:
            vectors[rid] = vec
    flat = str(tmp_path / "vectors.f16")
    vectors.tofile(flat)

    # build one shard graph so verification has something to check
    q = rng.standard_normal((8, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    build_shard(
        os.path.join(shard_dir, "shard_0.msgpack"),
        os.path.join(shard_dir, "shard_0.graph"),
        query_vectors=q,
        r=8,
        l=16,
        maxc=32,
        batch_size=64,
        seed=0,
    )

    # 1. regenerate two deleted inputs from the saved assignment
    for s in (1, 3):
        os.remove(os.path.join(shard_dir, f"shard_{s}.msgpack"))
    summary = processor.regenerate_shard_inputs(
        flat, N, centroids, shard_dir, assignment_path=assign_path
    )
    assert summary["regenerated"] == 2
    assert summary["verified_shards"] == 1
    assert input_bytes() == originals

    # 2. cold replay (no assignment.npy): recompute assignments from the
    # corpus; must still be byte-exact (nothing was deduplicated), and
    # must re-save the assignment for next time
    os.remove(assign_path)
    for s in (1, 2):
        os.remove(os.path.join(shard_dir, f"shard_{s}.msgpack"))
    summary = processor.regenerate_shard_inputs(
        flat, N, centroids, shard_dir, assignment_path=assign_path
    )
    assert summary["regenerated"] == 2
    assert input_bytes() == originals
    assert np.array_equal(np.load(assign_path), assignment)

    # 3. a divergent replay must refuse to write: wrong centroids give
    # shard 0 a different membership, the built graph catches it
    for s in (1, 2):
        os.remove(os.path.join(shard_dir, f"shard_{s}.msgpack"))
    os.remove(assign_path)
    with pytest.raises(RuntimeError, match="divergent"):
        processor.regenerate_shard_inputs(
            flat, N, centroids[::-1].copy(), shard_dir
        )
    # nothing half-written
    assert not os.path.exists(os.path.join(shard_dir, ".resplit_tmp"))
    # recover for hygiene
    processor.regenerate_shard_inputs(
        flat, N, centroids, shard_dir, assignment_path=None
    )
    assert input_bytes() == originals


def test_merge_shard_adjacency_matches_list_oracle():
    """The vectorised padded-array merge (processor.PaddedAdjacency —
    the list-of-lists representation cost ~25 GB at 1e7x420 shards)
    reproduces the naive per-row merge semantics exactly: mapping to
    global ids, dropping OOD query rows and out-of-mapping locals,
    per-shard degree truncation, self-edge removal, dedup against the
    node's earlier-shard edges (within-row duplicates pass through —
    the list merge snapshots its seen-set before extending), and
    shard-id collection in input order."""
    from meme_search_engine_tpu.pipeline.formats import ShardHeader

    def oracle(shard_outputs, n_total, max_degree_per_shard=None):
        vertices = [[] for _ in range(n_total)]
        node_shards = [[] for _ in range(n_total)]
        for header, adjacency in shard_outputs:
            mapping = header.mapping
            for local_id, row in enumerate(adjacency):
                if local_id >= len(mapping):
                    break
                gid = mapping[local_id]
                row_global = [
                    int(mapping[v]) for v in row if v < len(mapping)
                ]
                if max_degree_per_shard:
                    row_global = row_global[:max_degree_per_shard]
                seen = set(vertices[gid])
                vertices[gid].extend(
                    v for v in row_global if v not in seen and v != gid
                )
                node_shards[gid].append(header.id)
        return vertices, node_shards

    rng = np.random.default_rng(42)
    N = 400
    # every node in exactly 2 of 6 shards (spill-2), plus ragged rows
    # with self-edges, duplicate edges, and out-of-mapping local ids
    assign = np.stack(
        [rng.permutation(6)[:2] for _ in range(N)]
    )
    shard_outputs = []
    for s in range(6):
        mapping = np.nonzero((assign == s).any(axis=1))[0].tolist()
        rng.shuffle(mapping)
        m = len(mapping)
        adjacency = []
        for li in range(m):
            deg = int(rng.integers(0, 7))
            row = rng.integers(0, m + 3, deg)  # some >= m: invalid
            if deg >= 2 and rng.random() < 0.5:
                row[1] = row[0]  # duplicate within the row
            if deg >= 1 and rng.random() < 0.3:
                row[0] = li  # self-edge
            adjacency.append(row.astype(np.uint32))
        # two trailing OOD query rows the merge must ignore
        for _ in range(2):
            adjacency.append(rng.integers(0, m, 4).astype(np.uint32))
        offsets = np.concatenate(
            [[0], np.cumsum([4 * len(r) for r in adjacency])]
        ).tolist()
        shard_outputs.append(
            (
                ShardHeader(
                    id=s, max=m, centroid=[0.0], medioid=0,
                    offsets=offsets, mapping=mapping,
                ),
                adjacency,
            )
        )

    for maxdeg in (None, 3):
        want_v, want_s = oracle(shard_outputs, N, maxdeg)
        got_v, got_s = processor.merge_shard_adjacency(
            shard_outputs, N, maxdeg
        )
        assert len(got_v) == N and len(got_s) == N
        for i in range(N):
            assert got_v[i].tolist() == want_v[i], (maxdeg, i)
            assert got_s[i].tolist() == want_s[i], (maxdeg, i)


def test_native_pack_records_byte_parity():
    """native/pack.cpp emits byte-identical records to
    PackedIndexEntry.pack_ex across the msgpack width breakpoints
    (fixint/uint8/16/32/64, fixstr/str8/16, bin, fixarray/array16) and
    the oversize-URL dead path (dump_processor.rs:510-517)."""
    from meme_search_engine_tpu.index.native_io import native_pack_records

    rng = np.random.default_rng(0)
    n, d, pad = 300, 96, 1024
    ids0 = 120  # batch crosses the 127/128 fixint boundary
    verts = np.full((n, 70), -1, np.int32)
    vcounts = np.zeros(n, np.int32)
    shards = np.full((n, 2), -1, np.int32)
    scounts = np.zeros(n, np.int32)
    urls, ts, dims = [], [], []
    scores = rng.standard_normal((n, 3)).astype(np.float32)
    breakvals = [0, 1, 127, 128, 255, 256, 65535, 65536, 2**31 - 1]
    for i in range(n):
        nv = int(rng.integers(0, 70))
        row = rng.choice(
            breakvals + list(rng.integers(0, 10**7, 20)), nv
        )
        verts[i, :nv] = np.asarray(row, np.int64).astype(np.int32)
        vcounts[i] = nv
        ns = int(rng.integers(1, 3))
        shards[i, :ns] = rng.integers(0, 4200, ns)
        scounts[i] = ns
        ts.append(int(rng.choice(breakvals + [2**32, 2**34])))
        dims.append([int(rng.integers(0, 70000)), int(rng.integers(0, 70000))])
        urls.append("u" * int(rng.choice([0, 5, 31, 32, 255, 256, 700])))
    vecs = rng.standard_normal((n, d)).astype(np.float16)

    want, want_dead = [], []
    for i in range(n):
        e = PackedIndexEntry(
            id=ids0 + i, vector=vecs[i], vertices=verts[i, : vcounts[i]],
            timestamp=ts[i], dimensions=tuple(dims[i]),
            scores=[float(s) for s in scores[i]], url=urls[i],
            shards=shards[i, : scounts[i]],
        )
        raw, is_dead = e.pack_ex(pad)
        want.append(raw)
        want_dead.append(is_dead)

    out = native_pack_records(
        vecs, verts, vcounts, ids0, np.asarray(ts, np.int64),
        np.asarray(dims, np.int64), scores.astype(np.float64), urls,
        shards, scounts, pad,
    )
    if out is None:
        pytest.skip("native library unavailable")
    got, got_dead = out
    assert got == b"".join(want)
    assert list(got_dead) == want_dead
    assert sum(want_dead) > 0  # the fixture must exercise the dead path


def test_pack_index_native_matches_python(tmp_path, monkeypatch):
    """pack_index with the native bulk packer writes a byte-identical
    index.bin (and identical header dead count) to the per-record
    python loop."""
    rng = np.random.default_rng(7)
    n, d = 257, 64
    vectors = rng.standard_normal((n, d)).astype(np.float16)
    rows = np.full((n, 8), -1, np.int32)
    counts = rng.integers(0, 8, n).astype(np.int32)
    for i in range(n):
        rows[i, : counts[i]] = rng.integers(0, n, counts[i])
    srows = np.full((n, 2), -1, np.int32)
    scounts = np.ones(n, np.int32)
    srows[:, 0] = rng.integers(0, 3, n)
    vertices = processor.PaddedAdjacency(rows, counts)
    node_shards = processor.PaddedAdjacency(srows, scounts)
    manifest = [
        {
            "timestamp": 1700000000 + i,
            "url": ("https://x.test/" + "a" * 4096) if i == 5 else f"https://x.test/{i}",
            "dimensions": (64, 48),
        }
        for i in range(n)
    ]
    pq = train_opq(
        vectors.astype(np.float32),
        rng.standard_normal((16, d)).astype(np.float32),
        n_chunks=8, n_centroids=16, outer_iters=1, adam_iters=5,
        batch_size=n, query_batch_size=16,
    )
    cents = rng.standard_normal((3, d)).astype(np.float32)
    meds = [0, 1, 2]

    outs = {}
    for mode in ("1", "0"):
        monkeypatch.setenv("MSE_NATIVE_PACK", mode)
        out_dir = str(tmp_path / f"idx{mode}")
        hdr = processor.pack_index(
            out_dir, vectors, vertices, node_shards, manifest, pq,
            cents, meds, batch_size=100,
        )
        outs[mode] = (
            open(os.path.join(out_dir, "index.bin"), "rb").read(),
            hdr.dead_count,
        )
    from meme_search_engine_tpu.index.native_io import _load_native

    if _load_native() is None:
        pytest.skip("native library unavailable")
    assert outs["1"][0] == outs["0"][0]
    assert outs["1"][1] == outs["0"][1] == 1  # the oversize URL at i=5


def test_coverage_build_order():
    # 6 shards, records spill to 2 shards each. Shards 4/5 duplicate
    # coverage of 0/1; greedy must prefer the shards that cover the
    # most still-uncovered records per cost.
    rng = np.random.default_rng(0)
    n, C = 5000, 6
    a = np.stack([rng.integers(0, C, n), rng.integers(0, C, n)], axis=1)
    a = a.astype(np.int32)
    order = processor.coverage_build_order(a, built=[], n_clusters=C)
    # every unbuilt shard appears exactly once
    assert sorted(order) == list(range(C))
    # replaying the greedy order must dominate the sequential order in
    # cumulative coverage at every prefix (ties allowed)
    def cov(shards):
        m = np.zeros(C, bool)
        m[list(shards)] = True
        return (m[a[:, 0]] | m[a[:, 1]]).mean()
    for k in range(1, C + 1):
        assert cov(order[:k]) >= cov(range(k)) - 1e-12
    # built shards are excluded and counted as covering
    order2 = processor.coverage_build_order(a, built=[order[0]], n_clusters=C)
    assert order[0] not in order2
    assert sorted(order2 + [order[0]]) == list(range(C))
    # full-coverage property: replay reaches 1.0 once every record has
    # one of its spill shards somewhere in the order
    assert cov(order) == 1.0
