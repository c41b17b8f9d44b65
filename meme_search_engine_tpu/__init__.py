"""meme_search_engine_tpu — a TPU-native semantic image search framework.

A from-scratch rebuild of the capabilities of osmarks/meme-search-engine
(reference layout documented in SURVEY.md) designed for TPU hardware:

- Embedding core: JAX/XLA SigLIP two-tower (ViT-SO400M/14@384, d=1152)
  with bf16 MXU compute, in-graph preprocessing and L2 normalisation
  (reference: clip_server.py, misc/clip_accursed.py).
- Search core: HBM-resident fp16 corpus scanned by tiled MXU matmul +
  fused top-k (reference: FAISS flat IP index in src/main.rs:815-896);
  DiskANN/Vamana graph with OPQ asymmetric-distance scoring for the
  1e8+ scale (reference: diskann/ crate, src/query_disk_index.rs).
- Service layer: HTTP + msgpack wire contracts identical to the
  reference so clipfront2 and existing clients work unmodified
  (reference: src/common.rs:176-209, clip_server.py:151-191).

Subpackages:
  models/    SigLIP towers, score (quality) model, sparse autoencoder
  ops/       Pallas TPU kernels + XLA reference paths (MIPS top-k, ADC,
             attention)
  index/     flat index, Vamana graph build/search, quantizers, k-means
  parallel/  device mesh utilities, corpus-sharded multi-chip search
  serving/   embedding server, query servers, wire codecs, metrics
  ingest/    media pipeline: file walk, SQLite state, thumbnails, video,
             OCR
  pipeline/  large-scale batch tooling: dumps, shard split, index pack
  utils/     fp16 codecs, config, timers
"""

__version__ = "0.1.0"
