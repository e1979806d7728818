// HNSW (Hierarchical Navigable Small World) approximate-NN index.
//
// Native CPU counterpart of the reference's faiss.IndexHNSWFlat option
// (eval/utils/get_index_faiss.py:88-96: M=16, efConstruction=80, CPU-only).
// Graph search is pointer-chasing — there is no TPU-native equivalent, so
// like the reference this index is host-side; it exists for API parity and
// for serving deployments that want sub-millisecond single-query latency
// without a device round-trip.
//
// Implementation: Malkov & Yashunin 2016 (arXiv:1603.09320). Inner-product
// "distance" (fingerprints are L2-normalized): we maximize q·x, stored
// internally as negated scores so the algorithm stays min-heap shaped.
//
// C ABI:
//   hnsw_create(d, M, ef_construction, seed) -> handle
//   hnsw_add(handle, data, n)                   (bulk insert)
//   hnsw_search(handle, queries, nq, k, ef_search, out_ids, out_scores)
//   hnsw_size(handle) -> n
//   hnsw_free(handle)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <random>
#include <vector>

namespace {

struct Hnsw {
  int d;
  int M;            // max links per node per layer (2M at layer 0)
  int ef_c;         // efConstruction
  double level_mult;
  std::mt19937_64 rng;

  std::vector<float> data;                       // n * d
  std::vector<int> levels;                       // per node
  // links[l][node] = neighbor ids (flat per layer, capped)
  std::vector<std::vector<std::vector<int>>> links;
  int entry = -1;
  int max_level = -1;

  int n() const { return static_cast<int>(levels.size()); }

  float ip(const float* a, const float* b) const {
    float s = 0.f;
    for (int i = 0; i < d; ++i) s += a[i] * b[i];
    return s;
  }
  float dist(const float* q, int id) const {  // smaller = better
    return -ip(q, data.data() + static_cast<int64_t>(id) * d);
  }
};

using PQ = std::priority_queue<std::pair<float, int>>;  // max-heap on dist

// Greedy beam search at one layer. Returns up to ef closest (dist, id),
// as a max-heap so the worst is on top.
PQ search_layer(const Hnsw& h, const float* q, int enter, int ef, int layer,
                std::vector<uint8_t>& visited, std::vector<int>& touched) {
  PQ best;                                             // worst on top
  std::priority_queue<std::pair<float, int>,
                      std::vector<std::pair<float, int>>,
                      std::greater<>> cand;            // closest on top
  float d0 = h.dist(q, enter);
  best.emplace(d0, enter);
  cand.emplace(d0, enter);
  visited[enter] = 1;
  touched.push_back(enter);

  while (!cand.empty()) {
    auto [dc, c] = cand.top();
    if (dc > best.top().first && static_cast<int>(best.size()) >= ef) break;
    cand.pop();
    for (int nb : h.links[layer][c]) {
      if (visited[nb]) continue;
      visited[nb] = 1;
      touched.push_back(nb);
      float dn = h.dist(q, nb);
      if (static_cast<int>(best.size()) < ef || dn < best.top().first) {
        best.emplace(dn, nb);
        cand.emplace(dn, nb);
        if (static_cast<int>(best.size()) > ef) best.pop();
      }
    }
  }
  return best;
}

// Simple neighbor selection: keep the M closest (used for query results).
std::vector<int> select_neighbors(PQ best, int m) {
  std::vector<std::pair<float, int>> all;
  while (!best.empty()) {
    all.push_back(best.top());
    best.pop();
  }
  std::sort(all.begin(), all.end());
  std::vector<int> out;
  for (int i = 0; i < static_cast<int>(all.size()) && i < m; ++i)
    out.push_back(all[i].second);
  return out;
}

// Heuristic neighbor selection (Malkov & Yashunin Alg. 4) for GRAPH edges:
// scan candidates closest-first and keep c only if it is closer to the
// query point than to every already-kept neighbor — this prunes edges that
// merely re-cover one dense direction and keeps edges that bridge distinct
// regions, which is what gives HNSW its navigability (plain keep-M-closest
// built graphs that measured recall@20 0.69 @ 500k; the heuristic is the
// known fix). keep_pruned (Alg. 4's keepPrunedConnections) fills remaining
// slots with the closest pruned candidates so the NEW node keeps full
// degree; back-link shrinks pass false (as hnswlib/faiss do) so pruned
// lists settle below capacity instead of re-shrinking on every insert.
std::vector<int> select_neighbors_heuristic(const Hnsw& h, const float* q,
                                            PQ best, int m,
                                            bool keep_pruned) {
  std::vector<std::pair<float, int>> all;
  while (!best.empty()) {
    all.push_back(best.top());
    best.pop();
  }
  std::sort(all.begin(), all.end());  // closest first
  std::vector<int> out;
  std::vector<int> pruned;
  for (const auto& [dc, c] : all) {
    if (static_cast<int>(out.size()) >= m) break;
    const float* cv = h.data.data() + static_cast<int64_t>(c) * h.d;
    bool diverse = true;
    for (int s : out) {
      if (h.dist(cv, s) < dc) {  // c is closer to a kept neighbor than to q
        diverse = false;
        break;
      }
    }
    if (diverse) {
      out.push_back(c);
    } else if (keep_pruned) {
      pruned.push_back(c);
    }
  }
  if (keep_pruned) {
    for (int c : pruned) {
      if (static_cast<int>(out.size()) >= m) break;
      out.push_back(c);
    }
  }
  return out;
}

void insert(Hnsw& h, int id, std::vector<uint8_t>& visited,
            std::vector<int>& touched) {
  std::uniform_real_distribution<double> u(0.0, 1.0);
  int level = static_cast<int>(-std::log(std::max(u(h.rng), 1e-12)) *
                               h.level_mult);
  h.levels[id] = level;
  for (int l = 0; l <= level; ++l) h.links[l][id] = {};

  const float* q = h.data.data() + static_cast<int64_t>(id) * h.d;
  if (h.entry < 0) {
    h.entry = id;
    h.max_level = level;
    return;
  }

  int cur = h.entry;
  // greedy descend through layers above `level`
  for (int l = h.max_level; l > level; --l) {
    bool moved = true;
    while (moved) {
      moved = false;
      for (int nb : h.links[l][cur]) {
        if (h.dist(q, nb) < h.dist(q, cur)) {
          cur = nb;
          moved = true;
        }
      }
    }
  }
  // insert with beam search from min(level, max_level) down to 0
  for (int l = std::min(level, h.max_level); l >= 0; --l) {
    for (int t : touched) visited[t] = 0;
    touched.clear();
    PQ best = search_layer(h, q, cur, h.ef_c, l, visited, touched);
    int m = (l == 0) ? 2 * h.M : h.M;
    auto nbs = select_neighbors_heuristic(h, q, std::move(best), m,
                                          /*keep_pruned=*/true);
    h.links[l][id] = nbs;
    if (!nbs.empty()) cur = nbs[0];
    for (int nb : nbs) {
      auto& back = h.links[l][nb];
      back.push_back(id);
      // Amortized shrink: let lists overshoot to 1.5*m before pruning back
      // to m. On distributions where the diversity heuristic rarely fires
      // (e.g. near-IID vectors, where candidates are mutually orthogonal)
      // a shrink-at-m policy re-runs the O(m^2)-dot heuristic on EVERY
      // back-link — ~30k dots/insert, 10x the beam cost. The slack cuts
      // shrink frequency ~m/2-fold; searches just scan the slightly longer
      // lists (bounded degree 1.5*m), which only helps recall.
      if (static_cast<int>(back.size()) > m + m / 2) {
        // shrink with the diversity heuristic, no refill (see above)
        const float* nbv = h.data.data() + static_cast<int64_t>(nb) * h.d;
        PQ cand;
        for (int x : back) cand.emplace(h.dist(nbv, x), x);
        back = select_neighbors_heuristic(h, nbv, std::move(cand), m,
                                          /*keep_pruned=*/false);
      }
    }
  }
  if (level > h.max_level) {
    h.max_level = level;
    h.entry = id;
  }
}

}  // namespace

extern "C" {

void* hnsw_create(int d, int M, int ef_construction, uint64_t seed) {
  auto* h = new Hnsw();
  h->d = d;
  h->M = M;
  h->ef_c = ef_construction;
  h->level_mult = 1.0 / std::log(std::max(2, M));
  h->rng.seed(seed);
  h->links.resize(64);  // max levels; geometric makes >40 impossible
  return h;
}

void hnsw_add(void* handle, const float* data, int n) {
  auto* h = static_cast<Hnsw*>(handle);
  int start = h->n();
  int total = start + n;
  h->data.resize(static_cast<int64_t>(total) * h->d);
  memcpy(h->data.data() + static_cast<int64_t>(start) * h->d, data,
         sizeof(float) * static_cast<int64_t>(n) * h->d);
  h->levels.resize(total, 0);
  for (auto& layer : h->links) layer.resize(total);
  std::vector<uint8_t> visited(total, 0);
  std::vector<int> touched;
  touched.reserve(4096);
  for (int id = start; id < total; ++id) {
    for (int t : touched) visited[t] = 0;
    touched.clear();
    insert(*h, id, visited, touched);
  }
}

int hnsw_size(void* handle) { return static_cast<Hnsw*>(handle)->n(); }

void hnsw_search(void* handle, const float* queries, int nq, int k,
                 int ef_search, int64_t* out_ids, float* out_scores) {
  auto* h = static_cast<Hnsw*>(handle);
  if (h->entry < 0) {  // empty index: report misses, don't crash
    for (int64_t i = 0; i < static_cast<int64_t>(nq) * k; ++i) {
      out_ids[i] = -1;
      out_scores[i] = -1e30f;
    }
    return;
  }
  std::vector<uint8_t> visited(h->n(), 0);
  std::vector<int> touched;
  touched.reserve(4096);
  for (int qi = 0; qi < nq; ++qi) {
    const float* q = queries + static_cast<int64_t>(qi) * h->d;
    int cur = h->entry;
    for (int l = h->max_level; l > 0; --l) {
      bool moved = true;
      while (moved) {
        moved = false;
        for (int nb : h->links[l][cur]) {
          if (h->dist(q, nb) < h->dist(q, cur)) {
            cur = nb;
            moved = true;
          }
        }
      }
    }
    for (int t : touched) visited[t] = 0;
    touched.clear();
    PQ best = search_layer(*h, q, cur, std::max(ef_search, k), 0, visited,
                           touched);
    auto nbs = select_neighbors(std::move(best), k);
    for (int i = 0; i < k; ++i) {
      if (i < static_cast<int>(nbs.size())) {
        out_ids[qi * k + i] = nbs[i];
        out_scores[qi * k + i] =
            h->ip(q, h->data.data() + static_cast<int64_t>(nbs[i]) * h->d);
      } else {
        out_ids[qi * k + i] = -1;
        out_scores[qi * k + i] = -1e30f;
      }
    }
  }
}

void hnsw_free(void* handle) { delete static_cast<Hnsw*>(handle); }

}  // extern "C"
