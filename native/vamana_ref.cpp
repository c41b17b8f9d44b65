// Sequential CPU Vamana oracle — an independent re-implementation of the
// reference algorithm's semantics (diskann/src/lib.rs:183-387) used to
// validate the TPU batched-round builder's graph quality and to provide a
// measured CPU baseline (the reference Rust crate cannot be compiled here:
// no Rust toolchain in this image).
//
// Semantics matched:
//  - greedy_search: best-first beam of size L, visited list = every scored
//    node, inner-product metric (lib.rs:183-211)
//  - robust_prune: ParlayANN-style alpha-RNG, candidate pool capped at
//    maxc, best-first selection with alpha * dot(c, p*) >= dot(c, p)
//    suppression (lib.rs:227-285)
//  - build: random sigma order, search from medioid, merge existing
//    out-neighbours, prune, back-edge insertion with overflow re-prune
//    (lib.rs:287-324); sequential (per-node) updates — the reference uses
//    rayon threads with per-node locks; this host has 1 core, so the
//    sequential build IS the reference execution order modulo interleaving.
//  - medioid: argmax dot with the mean (lib.rs:54-68)
//  - random R-regular fill (lib.rs:376-387)
//
// Usage:
//   vamana_ref vectors.bin N D R L MAXC ALPHA NQUERIES K SEARCH_L [graph_out]
// vectors.bin: fp32 row-major N x D (pre-normalised or not; IP metric).
// Prints one JSON line with build time, QPS, recall@1 (self), and
// recall@K for the first NQUERIES vectors vs brute force.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

static int D;

static inline float dot(const float* a, const float* b) {
    float s0 = 0.f, s1 = 0.f, s2 = 0.f, s3 = 0.f;
    int i = 0;
    for (; i + 4 <= D; i += 4) {
        s0 += a[i] * b[i];
        s1 += a[i + 1] * b[i + 1];
        s2 += a[i + 2] * b[i + 2];
        s3 += a[i + 3] * b[i + 3];
    }
    for (; i < D; i++) s0 += a[i] * b[i];
    return s0 + s1 + s2 + s3;
}

struct Candidate {
    float score;
    uint32_t id;
    bool visited;
};

// Fixed-size best-first buffer (lib.rs:73-155 semantics: sorted by score
// desc, id asc tiebreak; next_unvisited cursor).
struct NeighbourBuffer {
    std::vector<Candidate> c;
    size_t cap;
    explicit NeighbourBuffer(size_t l) : cap(l) { c.reserve(l + 1); }
    bool contains(uint32_t id) const {
        for (auto& x : c)
            if (x.id == id) return true;
        return false;
    }
    void insert(uint32_t id, float score) {
        if (c.size() == cap && score <= c.back().score) return;
        if (contains(id)) return;
        auto pos = std::lower_bound(
            c.begin(), c.end(), score,
            [](const Candidate& a, float s) { return a.score > s; });
        c.insert(pos, {score, id, false});
        if (c.size() > cap) c.pop_back();
    }
    int next_unvisited() {
        for (size_t i = 0; i < c.size(); i++)
            if (!c[i].visited) return (int)i;
        return -1;
    }
};

struct Graph {
    std::vector<std::vector<uint32_t>> adj;
    uint32_t r;
};

static const float* VEC;
static inline const float* vec(uint32_t i) { return VEC + (size_t)i * D; }

// lib.rs:183-211
static void greedy_search(const Graph& g, uint32_t start, const float* q,
                          size_t l,
                          std::vector<std::pair<float, uint32_t>>* visited,
                          std::vector<uint8_t>& seen, size_t* cmps) {
    NeighbourBuffer buf(l);
    buf.insert(start, dot(q, vec(start)));
    seen[start] = 1;
    std::vector<uint32_t> touched = {start};
    if (visited) visited->push_back({buf.c[0].score, start});
    (*cmps)++;
    for (;;) {
        int idx = buf.next_unvisited();
        if (idx < 0) break;
        buf.c[idx].visited = true;
        uint32_t u = buf.c[idx].id;
        for (uint32_t v : g.adj[u]) {
            if (seen[v]) continue;
            seen[v] = 1;
            touched.push_back(v);
            float s = dot(q, vec(v));
            (*cmps)++;
            buf.insert(v, s);
            if (visited) visited->push_back({s, v});
        }
    }
    for (uint32_t t : touched) seen[t] = 0;
    if (!visited) {
        // query mode: return the beam contents via `seen` caller? no —
        // caller passes visited list in eval mode; serve mode reuses it.
        return;
    }
}

// lib.rs:227-285 (saturate off: reference default for base builds)
static void robust_prune(uint32_t p, std::vector<std::pair<float, uint32_t>>& pool,
                         float alpha, size_t maxc, uint32_t r,
                         std::vector<uint32_t>* out) {
    // sort by score desc, id asc; dedupe; cap at maxc
    std::sort(pool.begin(), pool.end(),
              [](const std::pair<float, uint32_t>& a, const std::pair<float, uint32_t>& b) {
                  if (a.first != b.first) return a.first > b.first;
                  return a.second < b.second;
              });
    std::vector<std::pair<float, uint32_t>> cand;
    cand.reserve(std::min(pool.size(), maxc));
    uint32_t last = UINT32_MAX;
    for (auto& pr : pool) {
        if (pr.second == p || pr.second == last) continue;
        bool dup = false;
        for (auto& c : cand)
            if (c.second == pr.second) { dup = true; break; }
        if (dup) continue;
        cand.push_back(pr);
        last = pr.second;
        if (cand.size() >= maxc) break;
    }
    std::vector<uint8_t> alive(cand.size(), 1);
    out->clear();
    for (size_t i = 0; i < cand.size() && out->size() < r; i++) {
        if (!alive[i]) continue;
        uint32_t pstar = cand[i].second;
        out->push_back(pstar);
        alive[i] = 0;
        const float* pv = vec(pstar);
        for (size_t j = i + 1; j < cand.size(); j++) {
            if (!alive[j]) continue;
            float d = dot(pv, vec(cand[j].second));
            if (alpha * d >= cand[j].first) alive[j] = 0;
        }
    }
}

int main(int argc, char** argv) {
    if (argc < 10) {
        fprintf(stderr,
                "usage: %s vectors.bin N D R L MAXC ALPHA NQ K [SEARCH_L] "
                "[graph_out]\n",
                argv[0]);
        return 1;
    }
    const char* path = argv[1];
    size_t n = strtoull(argv[2], nullptr, 10);
    D = atoi(argv[3]);
    uint32_t r = atoi(argv[4]);
    size_t l = strtoull(argv[5], nullptr, 10);
    size_t maxc = strtoull(argv[6], nullptr, 10);
    float alpha = atof(argv[7]);
    size_t nq = strtoull(argv[8], nullptr, 10);
    size_t k = strtoull(argv[9], nullptr, 10);
    size_t search_l = argc > 10 ? strtoull(argv[10], nullptr, 10) : l;

    std::vector<float> data(n * (size_t)D);
    {
        FILE* f = fopen(path, "rb");
        if (!f || fread(data.data(), 4, data.size(), f) != data.size()) {
            fprintf(stderr, "read failed\n");
            return 1;
        }
        fclose(f);
    }
    VEC = data.data();

    // medioid (lib.rs:54-68)
    std::vector<double> mean(D, 0.0);
    for (size_t i = 0; i < n; i++)
        for (int j = 0; j < D; j++) mean[j] += vec(i)[j];
    std::vector<float> meanf(D);
    for (int j = 0; j < D; j++) meanf[j] = (float)(mean[j] / n);
    uint32_t med = 0;
    float best = -1e30f;
    for (size_t i = 0; i < n; i++) {
        float s = dot(meanf.data(), vec(i));
        if (s > best) { best = s; med = (uint32_t)i; }
    }

    // random fill (lib.rs:376-387)
    Graph g;
    g.r = r;
    g.adj.resize(n);
    std::mt19937_64 rng(42);
    for (size_t i = 0; i < n; i++) {
        g.adj[i].reserve(r + 1);
        while (g.adj[i].size() < r) {
            uint32_t v = (uint32_t)(rng() % n);
            if (v == i) continue;
            bool dup = false;
            for (uint32_t x : g.adj[i])
                if (x == v) { dup = true; break; }
            if (!dup) g.adj[i].push_back(v);
        }
    }

    // build (lib.rs:287-324)
    std::vector<uint32_t> sigma(n);
    for (size_t i = 0; i < n; i++) sigma[i] = (uint32_t)i;
    std::shuffle(sigma.begin(), sigma.end(), rng);
    std::vector<uint8_t> seen(n, 0);
    size_t cmps = 0;
    std::vector<std::pair<float, uint32_t>> visited;
    std::vector<uint32_t> pruned;
    auto t0 = std::chrono::steady_clock::now();
    for (size_t si = 0; si < n; si++) {
        uint32_t u = sigma[si];
        visited.clear();
        greedy_search(g, med, vec(u), l, &visited, seen, &cmps);
        for (uint32_t v : g.adj[u])
            visited.push_back({dot(vec(u), vec(v)), v});
        robust_prune(u, visited, alpha, maxc, r, &pruned);
        g.adj[u] = pruned;
        for (uint32_t v : pruned) {
            bool has = false;
            for (uint32_t x : g.adj[v])
                if (x == u) { has = true; break; }
            if (has) continue;
            g.adj[v].push_back(u);
            if (g.adj[v].size() > r) {  // overflow re-prune (lib.rs:313-318)
                std::vector<std::pair<float, uint32_t>> pool;
                pool.reserve(g.adj[v].size());
                for (uint32_t x : g.adj[v])
                    pool.push_back({dot(vec(v), vec(x)), x});
                robust_prune(v, pool, alpha, maxc, r, &pruned);
                g.adj[v] = pruned;
            }
        }
    }
    double build_s =
        std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
            .count();

    // eval harness (diskann/src/main.rs:101-137 + recall@k vs brute force)
    size_t q_cmps = 0;
    size_t recall1 = 0;
    auto ts = std::chrono::steady_clock::now();
    std::vector<std::vector<uint32_t>> results(nq);
    for (size_t qi = 0; qi < nq; qi++) {
        visited.clear();
        greedy_search(g, med, vec(qi), search_l, &visited, seen, &q_cmps);
        std::sort(visited.begin(), visited.end(),
                  [](auto& a, auto& b) { return a.first > b.first; });
        for (size_t j = 0; j < std::min(k, visited.size()); j++)
            results[qi].push_back(visited[j].second);
        if (!results[qi].empty() && results[qi][0] == qi) recall1++;
    }
    double search_s =
        std::chrono::duration<double>(std::chrono::steady_clock::now() - ts)
            .count();

    // brute-force ground truth for recall@k
    size_t hit = 0;
    for (size_t qi = 0; qi < nq; qi++) {
        std::vector<std::pair<float, uint32_t>> all(n);
        for (size_t i = 0; i < n; i++)
            all[i] = {dot(vec(qi), vec(i)), (uint32_t)i};
        std::partial_sort(all.begin(), all.begin() + k, all.end(),
                          [](auto& a, auto& b) {
                              if (a.first != b.first) return a.first > b.first;
                              return a.second < b.second;
                          });
        for (size_t j = 0; j < k; j++)
            for (uint32_t rid : results[qi])
                if (rid == all[j].second) { hit++; break; }
    }

    double deg = 0;
    for (size_t i = 0; i < n; i++) deg += g.adj[i].size();
    printf(
        "{\"build_s\": %.2f, \"build_cmps_per_node\": %.0f, \"qps\": %.1f, "
        "\"recall_at_1\": %.4f, \"recall_at_k\": %.4f, \"k\": %zu, "
        "\"mean_degree\": %.1f, \"threads\": 1}\n",
        build_s, (double)cmps / n, nq / search_s, (double)recall1 / nq,
        (double)hit / (nq * k), k, deg / n);

    if (argc > 11) {
        FILE* f = fopen(argv[11], "wb");
        std::vector<int32_t> row(r, -1);
        for (size_t i = 0; i < n; i++) {
            std::fill(row.begin(), row.end(), -1);
            for (size_t j = 0; j < g.adj[i].size() && j < r; j++)
                row[j] = (int32_t)g.adj[i][j];
            fwrite(row.data(), 4, r, f);
        }
        fclose(f);
    }
    return 0;
}
