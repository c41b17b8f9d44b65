"""Profile one Vamana build round-by-round, phase by phase (dev only)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from meme_search_engine_tpu.index import vamana as V

N, D = 20_000, 1152
cfg = V.VamanaConfig()
rng = np.random.default_rng(0)
vectors = rng.standard_normal((N, D)).astype(np.float32)
vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)

n, d = vectors.shape
max_steps = 2 * cfg.l
vec_dev = jnp.asarray(vectors, jnp.bfloat16)
graph = V.random_fill(n, cfg.r, 0)
graph = np.asarray(graph, np.int32)
degrees = np.full((n,), graph.shape[1], np.int32)
med = V.medioid(vectors)
sigmas = np.random.default_rng(0).permutation(n).astype(np.int32)
bp = jnp.int32(cfg.query_breakpoint)

tot = {}
def mark(k, t0):
    tot[k] = tot.get(k, 0.0) + (time.perf_counter() - t0)
    return time.perf_counter()

t_all = time.perf_counter()
for ri, round_start in enumerate(range(0, n, cfg.batch_size)):
    batch = sigmas[round_start : round_start + cfg.batch_size]
    b = len(batch)
    pad = cfg.batch_size - b
    batch_p = np.pad(batch, (0, pad), constant_values=0)

    t0 = time.perf_counter()
    graph_dev = jnp.asarray(graph)
    graph_dev.block_until_ready()
    float(graph_dev[0, 0])  # host fetch sync
    t0 = mark("upload_graph", t0)

    queries = vec_dev[jnp.asarray(batch_p)]
    is_query_node = batch_p >= cfg.query_breakpoint
    pool_scores, pool_ids, steps = V._batched_greedy_search(
        vec_dev, graph_dev, queries, jnp.int32(med), bp,
        jnp.asarray(is_query_node),
        l=cfg.l, maxc=cfg.maxc, max_steps=max_steps,
        expand=cfg.build_expand,
    )
    nsteps = int(steps)
    t0 = mark("search", t0)

    existing = graph[batch_p]
    evalid = existing >= 0
    esafe = np.where(evalid, existing, 0)
    evecs = vec_dev[jnp.asarray(esafe)]
    escores = jnp.einsum("bd,brd->br", queries, evecs,
                         preferred_element_type=jnp.float32)
    escores = jnp.where(jnp.asarray(evalid), escores, -jnp.inf)
    eids = jnp.where(jnp.asarray(evalid), jnp.asarray(esafe), 2**31 - 1)
    pool_ids, pool_scores = V._merge_pool(pool_ids, pool_scores, eids,
                                          escores, cfg.maxc)
    saturate = jnp.asarray(np.logical_or(cfg.saturate_graph, is_query_node))
    new_neigh = V._batched_robust_prune(
        vec_dev, jnp.asarray(batch_p), pool_ids, pool_scores,
        jnp.float32(cfg.alpha), jnp.float32(cfg.query_alpha), bp, saturate,
        r=cfg.r,
    )
    new_neigh = np.asarray(new_neigh)[:b]
    t0 = mark("prune+download", t0)

    overflow_nodes = []
    for j, u in enumerate(batch):
        row = new_neigh[j]
        row = row[row >= 0]
        graph[u, : len(row)] = row
        graph[u, len(row):] = -1
        degrees[u] = len(row)
    for j, u in enumerate(batch):
        for v in new_neigh[j]:
            if v < 0:
                continue
            deg = degrees[v]
            if deg < cfg.r:
                if u not in graph[v, :deg]:
                    graph[v, deg] = u
                    degrees[v] = deg + 1
            else:
                overflow_nodes.append((v, u))
    t0 = mark("host_backedges", t0)

    if overflow_nodes:
        V._reprune_overflow(vec_dev, graph, degrees, overflow_nodes, cfg, bp)
    t0 = mark("overflow_reprune", t0)
    if ri == 2:
        print(f"round {ri}: steps={nsteps} overflow={len(overflow_nodes)}",
              {k: round(v, 2) for k, v in tot.items()}, flush=True)

print("TOTAL", round(time.perf_counter() - t_all, 1), "s")
print({k: round(v, 1) for k, v in tot.items()})
