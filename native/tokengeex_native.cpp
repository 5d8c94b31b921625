// tokengeex_tpu native host runtime.
//
// C++ implementation of the host-side hot paths with semantics identical
// to the Python oracle (tokengeex_tpu/models/oracle.py), which in turn
// mirrors the reference Rust implementation:
//   - Viterbi encode: reference src/model.rs:59-129 (strict-greater
//     relaxation, ascending start pos then ascending token length).
//   - Lattice forward-backward marginals: reference src/lattice.rs:245-312
//     (pairwise log_sum_exp in node order, 50-nat cutoff).
//   - nbest(2) alternatives for pruning: reference src/prune.rs:179-203.
//   - Pair counting for BPE merge: reference src/merge.rs:53-76.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).
// Threading: std::thread pool over sample chunks, mirroring the
// reference's rayon par_chunks parallelism (reference: src/task.rs:134-137).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <queue>
#include <string>
#include <thread>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Double-array-ish byte trie (flat nodes, 256-way sparse children maps).
// ---------------------------------------------------------------------------

struct TrieNode {
  int32_t token_id = -1;   // -1: no token ends here
  int32_t token_len = 0;
  // Sorted (byte, child) pairs; small vocabularies have tiny fanout.
  std::vector<std::pair<uint8_t, int32_t>> children;

  int32_t find(uint8_t b) const {
    // Linear scan is faster than binary search for the typical fanout.
    for (const auto& kv : children)
      if (kv.first == b) return kv.second;
    return -1;
  }
};

struct Model {
  std::vector<TrieNode> nodes;
  std::vector<double> scores;
  std::vector<std::vector<uint8_t>> tokens;
  int max_token_len = 1;
  // Direct-indexed children of the root: every trie walk starts here,
  // so the root's O(children) scan is the hottest lookup by far.
  int32_t root_children[256];

  int32_t step(int32_t node, uint8_t b) const {
    if (node == 0) return root_children[b];
    return nodes[node].find(b);
  }

  void build(const uint8_t* data, const int64_t* offsets,
             const double* score_arr, int64_t vocab_size) {
    nodes.clear();
    nodes.emplace_back();  // root
    scores.assign(score_arr, score_arr + vocab_size);
    tokens.resize(vocab_size);
    max_token_len = 1;
    for (int i = 0; i < 256; ++i) root_children[i] = -1;
    for (int64_t id = 0; id < vocab_size; ++id) {
      const uint8_t* begin = data + offsets[id];
      int len = static_cast<int>(offsets[id + 1] - offsets[id]);
      tokens[id].assign(begin, begin + len);
      max_token_len = std::max(max_token_len, len);
      int32_t cur = 0;
      for (int i = 0; i < len; ++i) {
        int32_t next = nodes[cur].find(begin[i]);
        if (next < 0) {
          next = static_cast<int32_t>(nodes.size());
          nodes[cur].children.emplace_back(begin[i], next);
          nodes.emplace_back();
        }
        cur = next;
      }
      // Later ids overwrite (reference: src/model.rs:20-23).
      nodes[cur].token_id = static_cast<int32_t>(id);
      nodes[cur].token_len = len;
    }
    for (const auto& kv : nodes[0].children) root_children[kv.first] = kv.second;
  }
};

// Deterministic per-sample RNG for EM dropout (splitmix64). The
// reference uses thread_rng (non-reproducible); here the stream depends
// only on (seed, sample index), not thread partitioning.
inline uint64_t splitmix64(uint64_t& s) {
  uint64_t z = (s += 0x9E3779B97F4A7C15ull);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
  return z ^ (z >> 31);
}

inline double rng_f64(uint64_t& s) {
  return static_cast<double>(splitmix64(s) >> 11) * 0x1.0p-53;
}

double log_sum_exp(double x, double y, bool init_mode) {
  // reference: src/lattice.rs:321-333
  if (init_mode) return y;
  double vmin = x, vmax = y;
  if (x > y) { vmin = y; vmax = x; }
  constexpr double kMinusLogEpsilon = 50.0;
  if (vmax > vmin + kMinusLogEpsilon) return vmax;
  return vmax + std::log(std::exp(vmin - vmax) + 1.0);
}

// ---------------------------------------------------------------------------
// Viterbi encode (reference: src/model.rs:59-129)
// ---------------------------------------------------------------------------

// Returns number of ids, or -1 on NoPath. Appends ids to out.
int64_t viterbi_encode(const Model& m, const uint8_t* input, int64_t n,
                       std::vector<int32_t>& out) {
  struct Cell {
    int32_t id;
    double score;
    int64_t start;  // -1: unreachable
  };
  thread_local std::vector<Cell> dp;
  dp.assign(n + 1, Cell{0, 0.0, -1});
  dp[0].start = 0;

  for (int64_t pos = 0; pos < n; ++pos) {
    if (dp[pos].start < 0) continue;
    double base = dp[pos].score;
    int32_t cur = 0;
    int64_t limit = std::min<int64_t>(n - pos, m.max_token_len);
    for (int64_t i = 0; i < limit; ++i) {
      cur = m.step(cur, input[pos + i]);
      if (cur < 0) break;
      int32_t tid = m.nodes[cur].token_id;
      if (tid < 0) continue;
      int64_t end = pos + i + 1;
      double score = base + m.scores[tid];
      if (dp[end].start < 0 || score > dp[end].score) {
        dp[end] = Cell{tid, score, pos};
      }
    }
  }

  int64_t pos = n;
  size_t first = out.size();
  while (pos > 0) {
    if (dp[pos].start < 0) return -1;
    out.push_back(dp[pos].id);
    pos = dp[pos].start;
  }
  std::reverse(out.begin() + first, out.end());
  return static_cast<int64_t>(out.size() - first);
}

// ---------------------------------------------------------------------------
// Lattice marginals (reference: src/lattice.rs:245-312)
//
// Node-order faithful: nodes are created in (pos asc, len asc) order like
// Model::populate_nodes (reference: src/model.rs:34-55); begin/end node
// lists hold indices in insertion order; BOS=0 in end_nodes[0], EOS=1 in
// begin_nodes[n]. The pairwise log_sum_exp accumulation order therefore
// matches the reference bit-for-bit.
// ---------------------------------------------------------------------------

struct Lattice {
  struct Node {
    int64_t pos;
    int32_t id;
    int32_t len;
    double score;
  };
  std::vector<Node> nodes;
  std::vector<std::vector<int32_t>> begin_nodes, end_nodes;
  int64_t n = 0;

  // dropout skips len>1 candidates with probability `dropout`
  // (reference: src/model.rs:48-51); rng may be null when dropout == 0.
  void from(const Model& m, const uint8_t* input, int64_t len,
            double dropout = 0.0, uint64_t* rng = nullptr) {
    n = len;
    nodes.clear();
    begin_nodes.assign(n + 1, {});
    end_nodes.assign(n + 1, {});
    nodes.push_back(Node{0, -2, 0, 0.0});        // BOS
    nodes.push_back(Node{n, -1, 0, 0.0});        // EOS
    end_nodes[0].push_back(0);
    begin_nodes[n].push_back(1);
    for (int64_t pos = 0; pos < n; ++pos) {
      int32_t cur = 0;
      int64_t limit = std::min<int64_t>(n - pos, m.max_token_len);
      for (int64_t i = 0; i < limit; ++i) {
        cur = m.step(cur, input[pos + i]);
        if (cur < 0) break;
        int32_t tid = m.nodes[cur].token_id;
        if (tid < 0) continue;
        if (i > 0 && dropout > 0.0 && rng && rng_f64(*rng) < dropout)
          continue;
        int32_t idx = static_cast<int32_t>(nodes.size());
        begin_nodes[pos].push_back(idx);
        end_nodes[pos + i + 1].push_back(idx);
        nodes.push_back(Node{pos, tid, static_cast<int32_t>(i + 1),
                             m.scores[tid]});
      }
    }
  }

  // Returns z; accumulates into expected[vocab_size].
  double populate_marginal(double* expected) const {
    size_t num = nodes.size();
    std::vector<double> alpha(num, 0.0), beta(num, 0.0);
    for (int64_t pos = 0; pos <= n; ++pos) {
      for (int32_t rid : begin_nodes[pos]) {
        bool first = true;
        double a = alpha[rid];
        for (int32_t lid : end_nodes[pos]) {
          a = log_sum_exp(a, nodes[lid].score + alpha[lid], first);
          first = false;
        }
        alpha[rid] = a;
      }
    }
    for (int64_t pos = n; pos >= 0; --pos) {
      for (int32_t lid : end_nodes[pos]) {
        bool first = true;
        double b = beta[lid];
        for (int32_t rid : begin_nodes[pos]) {
          b = log_sum_exp(b, nodes[rid].score + beta[rid], first);
          first = false;
        }
        beta[lid] = b;
      }
    }
    double z = alpha[1];
    for (int64_t pos = 0; pos < n; ++pos) {
      for (int32_t idx : begin_nodes[pos]) {
        const Node& node = nodes[idx];
        double total = alpha[idx] + node.score + beta[idx] - z;
        expected[node.id] += std::exp(total);
      }
    }
    return z;
  }

  // Viterbi over the lattice (reference: src/lattice.rs:112-150).
  // Fills prev/backtrack arrays; returns best path EXCLUDING sentinels.
  bool viterbi(std::vector<int32_t>& path,
               std::vector<double>& backtrack_score,
               std::vector<int32_t>& prev) const {
    size_t num = nodes.size();
    backtrack_score.assign(num, 0.0);
    prev.assign(num, -1);
    for (int64_t pos = 0; pos <= n; ++pos) {
      for (int32_t rid : begin_nodes[pos]) {
        prev[rid] = -1;
        double best_score = 0.0;
        int32_t best_node = -1;
        for (int32_t lid : end_nodes[pos]) {
          double score = backtrack_score[lid] + nodes[rid].score;
          if (best_node < 0 || score > best_score) {
            best_node = lid;
            best_score = score;
          }
        }
        if (best_node < 0) return false;
        prev[rid] = best_node;
        backtrack_score[rid] = best_score;
      }
    }
    path.clear();
    int32_t idx = begin_nodes[n][0];
    while (prev[idx] >= 0) {
      if (nodes[idx].id >= 0) path.push_back(idx);
      idx = prev[idx];
    }
    std::reverse(path.begin(), path.end());
    return true;
  }

  // nbest via A* agenda (reference: src/lattice.rs:152-238). Returns up
  // to nbest paths of node indices (sentinels excluded).
  std::vector<std::vector<int32_t>> run_nbest(int nbest) {
    std::vector<std::vector<int32_t>> out;
    if (nbest == 0) return out;
    std::vector<int32_t> path;
    std::vector<double> bscore;
    std::vector<int32_t> prev;
    if (nbest == 1) {
      if (viterbi(path, bscore, prev)) out.push_back(path);
      return out;
    }
    if (!viterbi(path, bscore, prev)) return out;

    struct Hyp {
      int32_t node_idx;
      int32_t parent;  // index into pool, -1 none
      double fx, gx;
    };
    std::vector<Hyp> pool;
    auto cmp = [&pool](int32_t a, int32_t b) {
      return pool[a].fx < pool[b].fx;  // max-heap on fx
    };
    std::priority_queue<int32_t, std::vector<int32_t>, decltype(cmp)> agenda(cmp);

    double score = nodes[1].score;
    pool.push_back(Hyp{1, -1, score, score});
    agenda.push(0);

    while (!agenda.empty()) {
      int32_t top = agenda.top();
      agenda.pop();
      int32_t node_idx = pool[top].node_idx;
      if (node_idx == 0) {  // BOS
        std::vector<int32_t> hyp;
        int32_t next = pool[top].parent;
        while (next >= 0 && pool[next].parent >= 0) {
          hyp.push_back(pool[next].node_idx);
          next = pool[next].parent;
        }
        out.push_back(hyp);
        if (static_cast<int>(out.size()) == nbest) return out;
      } else {
        int64_t pos = nodes[node_idx].pos;
        for (int32_t lnode : end_nodes[pos]) {
          double top_gx = pool[top].gx;
          double fx = bscore[lnode] + top_gx;
          double gx = nodes[lnode].score + top_gx;
          pool.push_back(Hyp{lnode, top, fx, gx});
          agenda.push(static_cast<int32_t>(pool.size() - 1));
        }
        if (agenda.size() > 100000) {
          int keep = std::min(512, nbest * 10);
          std::vector<int32_t> kept;
          for (int i = 0; i < keep && !agenda.empty(); ++i) {
            kept.push_back(agenda.top());
            agenda.pop();
          }
          while (!agenda.empty()) agenda.pop();
          for (int32_t k : kept) agenda.push(k);
        }
      }
    }
    return out;
  }
};

// ---------------------------------------------------------------------------
// Parallel runner
// ---------------------------------------------------------------------------

void parallel_for(int64_t n, int num_threads, const std::function<void(int64_t, int64_t, int)>& fn) {
  if (num_threads <= 1 || n <= 1) {
    fn(0, n, 0);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + num_threads - 1) / num_threads;
  int t = 0;
  for (int64_t begin = 0; begin < n; begin += chunk, ++t) {
    int64_t end = std::min(n, begin + chunk);
    threads.emplace_back([=, &fn] { fn(begin, end, t); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

// ===========================================================================
// C ABI
// ===========================================================================

extern "C" {

Model* tg_model_new(const uint8_t* token_data, const int64_t* token_offsets,
                    const double* scores, int64_t vocab_size) {
  Model* m = new Model();
  m->build(token_data, token_offsets, scores, vocab_size);
  return m;
}

void tg_model_free(Model* m) { delete m; }

// Encode a batch of samples. Inputs are concatenated bytes + offsets
// (n_samples+1). Outputs: out_ids buffer (caller-allocated, capacity
// cap_ids), out_offsets (n_samples+1). Returns total ids written, or
// -(sample_index+1) on NoPath, or -1000000000 - needed if capacity
// insufficient.
int64_t tg_encode_batch(Model* m, const uint8_t* data, const int64_t* offsets,
                        int64_t n_samples, int32_t* out_ids, int64_t cap_ids,
                        int64_t* out_offsets, int num_threads) {
  std::vector<std::vector<int32_t>> results(n_samples);
  std::atomic<int64_t> fail(-1);
  parallel_for(n_samples, num_threads, [&](int64_t b, int64_t e, int) {
    std::vector<int32_t> buf;
    for (int64_t i = b; i < e; ++i) {
      buf.clear();
      int64_t r = viterbi_encode(*m, data + offsets[i],
                                 offsets[i + 1] - offsets[i], buf);
      if (r < 0) {
        int64_t expect = -1;
        fail.compare_exchange_strong(expect, i);
        return;
      }
      results[i] = buf;
    }
  });
  if (fail.load() >= 0) return -(fail.load() + 1);
  int64_t total = 0;
  for (auto& r : results) total += static_cast<int64_t>(r.size());
  if (total > cap_ids) return -1000000000 - total;
  int64_t off = 0;
  for (int64_t i = 0; i < n_samples; ++i) {
    out_offsets[i] = off;
    std::memcpy(out_ids + off, results[i].data(),
                results[i].size() * sizeof(int32_t));
    off += static_cast<int64_t>(results[i].size());
  }
  out_offsets[n_samples] = off;
  return total;
}

// E-step over a batch: accumulates expected counts (vocab_size doubles)
// and writes per-sample z sums. Samples are chopped into max_snippet
// byte snippets (reference: src/prune.rs:75-83). dropout skips len>1
// lattice candidates with the given probability, deterministically per
// (seed, sample). Returns 0, or -(sample+1) if a snippet normalizer is
// not finite.
int64_t tg_estep_batch(Model* m, const uint8_t* data, const int64_t* offsets,
                       int64_t n_samples, int64_t max_snippet,
                       double dropout, uint64_t seed,
                       double* expected, double* z_out, int num_threads) {
  int64_t vocab_size = static_cast<int64_t>(m->scores.size());
  std::vector<std::vector<double>> partials(
      std::max(1, num_threads), std::vector<double>(vocab_size, 0.0));
  std::atomic<int64_t> fail(-1);
  parallel_for(n_samples, num_threads, [&](int64_t b, int64_t e, int tix) {
    Lattice lat;
    std::vector<double>& part = partials[tix];
    for (int64_t i = b; i < e; ++i) {
      double zsum = 0.0;
      int64_t len = offsets[i + 1] - offsets[i];
      uint64_t rng = seed ^ (0xD1B54A32D192ED03ull * (uint64_t)(i + 1));
      splitmix64(rng);  // decorrelate nearby sample streams
      for (int64_t off = 0; off < len; off += max_snippet) {
        int64_t slen = std::min(max_snippet, len - off);
        lat.from(*m, data + offsets[i] + off, slen, dropout, &rng);
        double z = lat.populate_marginal(part.data());
        if (!std::isfinite(z)) {
          int64_t expect = -1;
          fail.compare_exchange_strong(expect, i);
          return;
        }
        zsum += z;
      }
      if (z_out) z_out[i] = zsum;
    }
  });
  if (fail.load() >= 0) return -(fail.load() + 1);
  for (auto& part : partials)
    for (int64_t v = 0; v < vocab_size; ++v) expected[v] += part[v];
  return 0;
}

// nbest(2) alternatives per token (reference: src/prune.rs:179-203).
// For each token id: always_keep[id] (uint8), alternatives written as
// alt_ids (flat) + alt_offsets (vocab_size+1).
int64_t tg_prune_alternatives(Model* m, uint8_t* always_keep,
                              int32_t* alt_ids, int64_t cap_alt,
                              int64_t* alt_offsets, int num_threads) {
  int64_t vocab_size = static_cast<int64_t>(m->scores.size());
  std::vector<std::vector<int32_t>> alts(vocab_size);
  std::vector<uint8_t> keep(vocab_size, 1);
  parallel_for(vocab_size, num_threads, [&](int64_t b, int64_t e, int) {
    Lattice lat;
    for (int64_t id = b; id < e; ++id) {
      const auto& token = m->tokens[id];
      lat.from(*m, token.data(), static_cast<int64_t>(token.size()));
      auto nbests = lat.run_nbest(2);
      if (nbests.size() > 1 && nbests[0].size() > 1) keep[id] = 0;
      if (nbests.size() > 1 && nbests[0].size() == 1) {
        for (int32_t idx : nbests[1]) alts[id].push_back(lat.nodes[idx].id);
      }
    }
  });
  int64_t total = 0;
  for (auto& a : alts) total += static_cast<int64_t>(a.size());
  if (total > cap_alt) return -1000000000 - total;
  int64_t off = 0;
  for (int64_t id = 0; id < vocab_size; ++id) {
    always_keep[id] = keep[id];
    alt_offsets[id] = off;
    std::memcpy(alt_ids + off, alts[id].data(), alts[id].size() * sizeof(int32_t));
    off += static_cast<int64_t>(alts[id].size());
  }
  alt_offsets[vocab_size] = off;
  return total;
}

// Token frequency counting via Viterbi encodes
// (reference: src/prune.rs:211-242). freqs: vocab_size int64.
// Returns 0 or -(sample+1) on NoPath.
int64_t tg_count_frequencies(Model* m, const uint8_t* data,
                             const int64_t* offsets, int64_t n_samples,
                             int64_t* freqs, int num_threads) {
  int64_t vocab_size = static_cast<int64_t>(m->scores.size());
  std::vector<std::vector<int64_t>> partials(
      std::max(1, num_threads), std::vector<int64_t>(vocab_size, 0));
  std::atomic<int64_t> fail(-1);
  parallel_for(n_samples, num_threads, [&](int64_t b, int64_t e, int tix) {
    std::vector<int32_t> buf;
    auto& part = partials[tix];
    for (int64_t i = b; i < e; ++i) {
      buf.clear();
      int64_t r = viterbi_encode(*m, data + offsets[i],
                                 offsets[i + 1] - offsets[i], buf);
      if (r < 0) {
        int64_t expect = -1;
        fail.compare_exchange_strong(expect, i);
        return;
      }
      for (int32_t id : buf) part[id] += 1;
    }
  });
  if (fail.load() >= 0) return -(fail.load() + 1);
  for (auto& part : partials)
    for (int64_t v = 0; v < vocab_size; ++v) freqs[v] += part[v];
  return 0;
}

// Adjacent pair counting over Viterbi encodes
// (reference: src/merge.rs:53-76). Emits up to cap pairs sorted by
// frequency desc into (pair_a, pair_b, pair_n). Returns count written,
// or -(sample+1) on NoPath.
int64_t tg_count_pairs(Model* m, const uint8_t* data, const int64_t* offsets,
                       int64_t n_samples, int32_t* pair_a, int32_t* pair_b,
                       int64_t* pair_n, int64_t cap, int num_threads) {
  struct PairHash {
    size_t operator()(uint64_t v) const { return std::hash<uint64_t>()(v); }
  };
  int nt = std::max(1, num_threads);
  std::vector<std::unordered_map<uint64_t, int64_t>> partials(nt);
  std::atomic<int64_t> fail(-1);
  parallel_for(n_samples, num_threads, [&](int64_t b, int64_t e, int tix) {
    std::vector<int32_t> buf;
    auto& part = partials[tix];
    for (int64_t i = b; i < e; ++i) {
      buf.clear();
      int64_t r = viterbi_encode(*m, data + offsets[i],
                                 offsets[i + 1] - offsets[i], buf);
      if (r < 0) {
        int64_t expect = -1;
        fail.compare_exchange_strong(expect, i);
        return;
      }
      for (size_t k = 1; k < buf.size(); ++k) {
        uint64_t key = (static_cast<uint64_t>(static_cast<uint32_t>(buf[k - 1]))
                        << 32) |
                       static_cast<uint32_t>(buf[k]);
        part[key] += 1;
      }
    }
  });
  if (fail.load() >= 0) return -(fail.load() + 1);
  std::unordered_map<uint64_t, int64_t> merged;
  for (auto& part : partials)
    for (auto& kv : part) merged[kv.first] += kv.second;
  std::vector<std::pair<uint64_t, int64_t>> pairs(merged.begin(), merged.end());
  std::sort(pairs.begin(), pairs.end(),
            [](const auto& a, const auto& b) { return a.second > b.second; });
  int64_t count = std::min<int64_t>(cap, static_cast<int64_t>(pairs.size()));
  for (int64_t i = 0; i < count; ++i) {
    pair_a[i] = static_cast<int32_t>(pairs[i].first >> 32);
    pair_b[i] = static_cast<int32_t>(pairs[i].first & 0xFFFFFFFFu);
    pair_n[i] = pairs[i].second;
  }
  return count;
}

// ---------------------------------------------------------------------------
// Fast byte-string counting structures for the generate feed.
//
// std::unordered_map<std::string, ...> spends most of the feed in node
// allocations and string copies (millions of 2-16 byte keys). These are
// open-addressing tables keyed by a 64-bit byte hash with exact compare
// against an append-only arena — one allocation-free probe per lookup.
// ---------------------------------------------------------------------------

inline uint64_t hash_bytes(const uint8_t* p, uint32_t len) {
  // FNV-1a with a 64-bit avalanche finish.
  uint64_t h = 0xCBF29CE484222325ull;
  for (uint32_t i = 0; i < len; ++i) h = (h ^ p[i]) * 0x100000001B3ull;
  h ^= h >> 33;
  h *= 0xFF51AFD7ED558CCDull;
  h ^= h >> 33;
  return h;
}

struct CountMap {
  struct Entry {
    uint64_t hash = 0;
    uint64_t off = 0;  // 64-bit: reference-scale feeds exceed 4 GB arenas
    uint32_t len = 0;  // 0 = empty slot
    int64_t count = 0;
  };
  std::vector<Entry> slots;
  std::vector<uint8_t> arena;
  size_t used = 0;

  CountMap() { slots.resize(1 << 16); }

  void grow() {
    std::vector<Entry> old;
    old.swap(slots);
    slots.resize(old.size() * 2);
    for (const auto& e : old) {
      if (!e.len) continue;
      size_t mask = slots.size() - 1;
      size_t i = e.hash & mask;
      while (slots[i].len) i = (i + 1) & mask;
      slots[i] = e;
    }
  }

  void add(const uint8_t* p, uint32_t len, int64_t n) {
    if (used * 10 >= slots.size() * 7) grow();
    uint64_t h = hash_bytes(p, len);
    size_t mask = slots.size() - 1;
    size_t i = h & mask;
    while (slots[i].len) {
      if (slots[i].hash == h && slots[i].len == len &&
          std::memcmp(arena.data() + slots[i].off, p, len) == 0) {
        slots[i].count += n;
        return;
      }
      i = (i + 1) & mask;
    }
    uint64_t off = arena.size();
    arena.insert(arena.end(), p, p + len);
    slots[i] = Entry{h, off, len, n};
    ++used;
  }

  // Steal the biggest partial map instead of re-inserting it.
  void swap_from_largest(std::vector<CountMap>& parts) {
    size_t best = parts.size(), best_used = 0;
    for (size_t i = 0; i < parts.size(); ++i)
      if (parts[i].used >= best_used) {
        best_used = parts[i].used;
        best = i;
      }
    if (best < parts.size()) {
      slots.swap(parts[best].slots);
      arena.swap(parts[best].arena);
      used = parts[best].used;
      parts[best].slots.clear();
      parts[best].arena.clear();
      parts[best].used = 0;
    }
  }
};

// Per-sample dedup set: epoch-stamped open addressing over (ptr, len)
// candidates pointing into the live sample buffer (exact compare, no
// copies, O(1) clear by bumping the epoch).
struct DedupSet {
  struct Entry {
    uint64_t hash;
    const uint8_t* ptr;
    uint32_t len;
    uint32_t epoch;
  };
  std::vector<Entry> slots;
  uint32_t epoch = 0;
  size_t live = 0;

  DedupSet() { slots.assign(1 << 12, Entry{0, nullptr, 0, 0}); }

  void clear() {
    ++epoch;
    live = 0;
  }

  void rehash_grow() {
    std::vector<Entry> old;
    old.swap(slots);
    slots.assign(old.size() * 2, Entry{0, nullptr, 0, 0});
    for (const auto& e : old) {
      if (e.epoch != epoch || !e.ptr) continue;
      size_t mask = slots.size() - 1;
      size_t i = e.hash & mask;
      while (slots[i].epoch == epoch && slots[i].ptr) i = (i + 1) & mask;
      slots[i] = e;
    }
  }

  // Returns true if newly inserted.
  bool insert(const uint8_t* p, uint32_t len) {
    if (live * 10 >= slots.size() * 7) rehash_grow();
    uint64_t h = hash_bytes(p, len);
    size_t mask = slots.size() - 1;
    size_t i = h & mask;
    while (slots[i].epoch == epoch && slots[i].ptr) {
      if (slots[i].hash == h && slots[i].len == len &&
          std::memcmp(slots[i].ptr, p, len) == 0)
        return false;
      i = (i + 1) & mask;
    }
    slots[i] = Entry{h, p, len, epoch};
    ++live;
    return true;
  }
};

int64_t serialize_counts(const CountMap& merged, uint8_t* out_buf,
                         int64_t cap) {
  int64_t needed = 0;
  for (const auto& e : merged.slots)
    if (e.len) needed += 12 + static_cast<int64_t>(e.len);
  if (needed > cap) return -1000000000 - needed;
  int64_t off = 0;
  for (const auto& e : merged.slots) {
    if (!e.len) continue;
    int32_t len = static_cast<int32_t>(e.len);
    std::memcpy(out_buf + off, &e.count, 8);
    std::memcpy(out_buf + off + 8, &len, 4);
    std::memcpy(out_buf + off + 12, merged.arena.data() + e.off, e.len);
    off += 12 + e.len;
  }
  return off;
}

// Substring candidate counting for vocabulary generation
// (reference: src/generate.rs:54-139). For every sample, every
// char-boundary-aligned substring of <= max_token_length bytes whose
// DFA run ends in an accept state is inserted with probability
// insert_probability into a per-sample set (document frequency), then
// merged into a global count map.
//
// dfa_next: (num_states, 256) int32, dfa_accept: (num_states,) uint8.
// Pass num_states == 0 to allow everything.
//
// Results are serialized into out_buf as repeated records:
//   [count: int64][len: int32][bytes...]
// Returns the number of bytes written, or -1000000000 - needed if the
// buffer is too small (call again with a bigger buffer).
extern "C" int64_t tg_substring_count(
    const uint8_t* data, const int64_t* offsets, int64_t n_samples,
    const int32_t* dfa_next, const uint8_t* dfa_accept, int32_t num_states,
    int32_t start_state, int64_t max_token_length, double insert_probability,
    uint64_t seed, uint8_t* out_buf, int64_t cap, int num_threads) {
  int nt = std::max(1, num_threads);
  std::vector<CountMap> partials(nt);

  parallel_for(n_samples, num_threads, [&](int64_t b, int64_t e, int tix) {
    auto& freq = partials[tix];
    // splitmix64 per thread
    uint64_t rng = seed + 0x9E3779B97F4A7C15ULL * (tix + 1);
    auto next_rand = [&rng]() -> double {
      rng += 0x9E3779B97F4A7C15ULL;
      uint64_t z = rng;
      z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
      z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
      z = z ^ (z >> 31);
      return (z >> 11) * (1.0 / 9007199254740992.0);
    };
    DedupSet sample_tokens;
    for (int64_t i = b; i < e; ++i) {
      const uint8_t* s = data + offsets[i];
      int64_t n = offsets[i + 1] - offsets[i];
      sample_tokens.clear();
      for (int64_t p = 0; p < n; ++p) {
        if ((s[p] & 0xC0) == 0x80) continue;  // not a char start
        int32_t state = start_state;
        int64_t limit = std::min(n - p, max_token_length);
        for (int64_t l = 1; l <= limit; ++l) {
          if (num_states > 0) {
            state = dfa_next[state * 256 + s[p + l - 1]];
            if (state == 0) break;  // dead state: no longer match possible
          }
          // End must be a char boundary.
          if (p + l < n && (s[p + l] & 0xC0) == 0x80) continue;
          bool ok = num_states == 0 || dfa_accept[state];
          if (ok && next_rand() < insert_probability &&
              sample_tokens.insert(s + p, static_cast<uint32_t>(l))) {
            freq.add(s + p, static_cast<uint32_t>(l), 1);
          }
        }
      }
    }
  });

  CountMap merged;
  merged.swap_from_largest(partials);
  for (auto& part : partials) {
    for (const auto& e : part.slots)
      if (e.len) merged.add(part.arena.data() + e.off, e.len, e.count);
    part.slots.clear();
    part.arena.clear();
  }
  return serialize_counts(merged, out_buf, cap);
}

// Decode a batch of id sequences to concatenated token bytes
// (reference: src/tokenizer.rs:178-187 decode_batch = rayon map of
// Model::decode, src/model.rs:146-160). Inputs: flat ids + offsets
// (n_seqs+1). Outputs: out_bytes (capacity cap), out_offsets
// (n_seqs+1). Returns total bytes written, -(seq_index+1) on an
// out-of-range id, or -1000000000 - needed when cap is too small.
extern "C" int64_t tg_decode_batch(Model* m, const int32_t* ids,
                                   const int64_t* offsets, int64_t n_seqs,
                                   uint8_t* out_bytes, int64_t cap,
                                   int64_t* out_offsets, int num_threads) {
  int64_t vocab = static_cast<int64_t>(m->tokens.size());
  std::vector<int64_t> sizes(n_seqs, 0);
  std::atomic<int64_t> fail(-1);
  parallel_for(n_seqs, num_threads, [&](int64_t b, int64_t e, int) {
    for (int64_t i = b; i < e; ++i) {
      int64_t total = 0;
      for (int64_t k = offsets[i]; k < offsets[i + 1]; ++k) {
        int32_t tid = ids[k];
        if (tid < 0 || tid >= vocab) {
          int64_t expect = -1;
          fail.compare_exchange_strong(expect, i);
          return;
        }
        total += static_cast<int64_t>(m->tokens[tid].size());
      }
      sizes[i] = total;
    }
  });
  if (fail.load() >= 0) return -(fail.load() + 1);
  out_offsets[0] = 0;
  for (int64_t i = 0; i < n_seqs; ++i)
    out_offsets[i + 1] = out_offsets[i] + sizes[i];
  if (out_offsets[n_seqs] > cap) return -1000000000 - out_offsets[n_seqs];
  parallel_for(n_seqs, num_threads, [&](int64_t b, int64_t e, int) {
    for (int64_t i = b; i < e; ++i) {
      uint8_t* dst = out_bytes + out_offsets[i];
      for (int64_t k = offsets[i]; k < offsets[i + 1]; ++k) {
        const auto& t = m->tokens[ids[k]];
        std::memcpy(dst, t.data(), t.size());
        dst += t.size();
      }
    }
  });
  return out_offsets[n_seqs];
}

// Idiom mining (reference: src/mine.rs:21-48): non-overlapping
// leftmost matches of the mine regex across all samples, counted by
// matched string. The pattern arrives as the anchored byte-DFA
// (core/redfa.py tables; dead state 0); the scan takes the LONGEST
// accepting run from each start (leftmost-longest — the regex crate's
// find_iter is leftmost-FIRST, identical for the overlap-free PATTERNS
// alternations; PARITY.md notes the edge). Empty matches are skipped.
// Output format matches tg_substring_count.
extern "C" int64_t tg_mine(
    const uint8_t* data, const int64_t* offsets, int64_t n_samples,
    const int32_t* dfa_next, const uint8_t* dfa_accept, int32_t num_states,
    int32_t start_state, uint8_t* out_buf, int64_t cap, int num_threads) {
  int nt = std::max(1, num_threads);
  std::vector<CountMap> partials(nt);

  parallel_for(n_samples, num_threads, [&](int64_t b, int64_t e, int tix) {
    auto& freq = partials[tix];
    for (int64_t i = b; i < e; ++i) {
      const uint8_t* s = data + offsets[i];
      int64_t n = offsets[i + 1] - offsets[i];
      int64_t p = 0;
      while (p < n) {
        int32_t state = start_state;
        int64_t best_end = -1;
        for (int64_t q = p; q < n; ++q) {
          state = dfa_next[state * 256 + s[q]];
          if (state == 0) break;  // dead: no extension can match
          if (dfa_accept[state]) best_end = q + 1;
        }
        if (best_end > p) {
          freq.add(s + p, static_cast<uint32_t>(best_end - p), 1);
          p = best_end;
        } else {
          ++p;
        }
      }
    }
  });

  CountMap merged;
  merged.swap_from_largest(partials);
  for (auto& part : partials) {
    for (const auto& e : part.slots)
      if (e.len) merged.add(part.arena.data() + e.off, e.len, e.count);
    part.slots.clear();
    part.arena.clear();
  }
  return serialize_counts(merged, out_buf, cap);
}

// Extraction + document-frequency counting for a DEVICE-computed
// candidate mask (ops/dfa_device.py): the TPU evaluates allow-DFA,
// char-boundary, sample-extent, and insert-probability conditions as a
// dense bit-packed mask over packed rows; this drains the sparse
// survivors without materializing Python string objects.
//
// rows:     (B, W) packed corpus bytes (samples may be split across
//           rows with an L-1-byte lookahead copy; see utils/packing
//           pack_feed — token bytes are contiguous within a row).
// maskbits: (B, L, W/8) little-endian bits; bit p of byte p/8 set =>
//           substring rows[b][p : p+l+1] is a passing candidate.
// spans:    n_spans records (row, start, body, sid): candidate starts
//           live in [start, start+body) of `row`; sid = original
//           sample id. Spans of one sample need not be contiguous;
//           counting is deduplicated per sid via a sid-partitioned
//           parallel pass (spans MUST be grouped by sid).
// Output format matches tg_substring_count.
extern "C" int64_t tg_mask_count(
    const uint8_t* rows, int64_t B, int64_t W,
    const uint8_t* maskbits, int64_t L,
    const int64_t* span_row, const int64_t* span_start,
    const int64_t* span_body, const int64_t* span_sid, int64_t n_spans,
    uint8_t* out_buf, int64_t cap, int num_threads) {
  int nt = std::max(1, num_threads);
  std::vector<CountMap> partials(nt);

  // Sample boundaries in the (sid-grouped) span list.
  std::vector<int64_t> sample_begin;
  for (int64_t i = 0; i < n_spans; ++i)
    if (i == 0 || span_sid[i] != span_sid[i - 1]) sample_begin.push_back(i);
  sample_begin.push_back(n_spans);
  int64_t n_groups = static_cast<int64_t>(sample_begin.size()) - 1;
  const int64_t wbytes = W / 8;

  parallel_for(n_groups, num_threads, [&](int64_t gb, int64_t ge, int tix) {
    auto& freq = partials[tix];
    DedupSet sample_tokens;
    for (int64_t g = gb; g < ge; ++g) {
      sample_tokens.clear();
      for (int64_t si = sample_begin[g]; si < sample_begin[g + 1]; ++si) {
        const int64_t r = span_row[si];
        const int64_t p0 = span_start[si];
        const int64_t p1 = p0 + span_body[si];
        const uint8_t* row = rows + r * W;
        for (int64_t l = 0; l < L; ++l) {
          const uint8_t* mrow = maskbits + (r * L + l) * wbytes;
          for (int64_t p = p0; p < p1; ++p) {
            if (mrow[p >> 3] & (1u << (p & 7))) {
              if (sample_tokens.insert(row + p,
                                       static_cast<uint32_t>(l + 1)))
                freq.add(row + p, static_cast<uint32_t>(l + 1), 1);
            }
          }
        }
      }
    }
  });

  CountMap merged;
  merged.swap_from_largest(partials);
  for (auto& part : partials) {
    for (const auto& e : part.slots)
      if (e.len) merged.add(part.arena.data() + e.off, e.len, e.count);
    part.slots.clear();
    part.arena.clear();
  }
  return serialize_counts(merged, out_buf, cap);
}

// Resolve device Viterbi backpointers to token ids on native threads.
// The Python per-token loop (ops/lattice_jax.py backtrack: int(),
// tobytes(), dict lookup per token) costs ~1-2us/token and bounds the
// frequency/merge/encode passes once the device side is fused
// (reference backtrack: src/model.rs:112-127).
//
// rows:    (B, W) packed corpus bytes
// best_l:  (B, W) int8 chosen token length at dp index p-1
// spans:   n records (row, start, end, ok); ok == 0 marks a span whose
//          dp end is not finite (NoPath) -> out_lens[k] = -1
// out_ids: flat int32 ids; span k's ids start at the span's BYTE
//          offset (prefix sum of end-start), in forward order
// out_lens: per-span id count; -1 NoPath; -2 inconsistent backpointer
//          or a token the trie does not contain
// Caller sizes out_ids to sum(end-start) (one id per byte worst case).
extern "C" int64_t tg_backtrack_ids(
    const void* model_ptr, const uint8_t* rows, int64_t B, int64_t W,
    const int8_t* best_l,
    const int64_t* span_row, const int64_t* span_start,
    const int64_t* span_end, const uint8_t* span_ok, int64_t n_spans,
    int32_t* out_ids, int64_t* out_lens, int num_threads) {
  const Model& m = *static_cast<const Model*>(model_ptr);
  std::vector<int64_t> offs(n_spans + 1, 0);
  for (int64_t k = 0; k < n_spans; ++k)
    offs[k + 1] = offs[k] + (span_end[k] - span_start[k]);

  parallel_for(n_spans, num_threads, [&](int64_t kb, int64_t ke, int) {
    for (int64_t k = kb; k < ke; ++k) {
      const int64_t s = span_start[k], e = span_end[k];
      if (e == s) { out_lens[k] = 0; continue; }
      if (!span_ok[k]) { out_lens[k] = -1; continue; }
      const int64_t r = span_row[k];
      const uint8_t* row = rows + r * W;
      const int8_t* bl = best_l + r * W;
      int32_t* out = out_ids + offs[k];
      int64_t n = 0, pos = e;
      while (pos > s) {
        const int l = bl[pos - 1];
        if (l <= 0 || pos - l < s) { n = -2; break; }
        int32_t cur = 0;
        for (int64_t i = pos - l; i < pos; ++i) {
          cur = m.step(cur, row[i]);
          if (cur < 0) break;
        }
        const int32_t id = cur >= 0 ? m.nodes[cur].token_id : -1;
        if (id < 0) { n = -2; break; }
        out[n++] = id;
        pos -= l;
      }
      if (n >= 0) {  // backtrack walked right-to-left: reverse in place
        for (int64_t i = 0, j = n - 1; i < j; ++i, --j)
          std::swap(out[i], out[j]);
      }
      out_lens[k] = n;
    }
  });
  return offs[n_spans];
}

}  // extern "C"
