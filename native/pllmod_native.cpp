// Native host-runtime kernels for pllmod_tpu.
//
// The reference implements its entire host layer in C (SURVEY §2); the TPU
// build keeps the *compute path* in XLA/Pallas and implements the
// host-side hot loops natively here:
//
//  - site-pattern compression (libpll pll_compress_site_patterns):
//    hash-dedup of alignment columns -> pattern weights,
//  - Fitch parsimony scoring (pll_fastparsimony kernels): bitmask AND/OR
//    over sites, auto-vectorized,
//  - split operations (utree_distances.c/tbe_functions.c): popcount-based
//    Hamming / transfer-distance matrices,
//  - Newick parsing (pll_utree_parse_newick + the flex/bison split
//    parser's role): one-pass recursive descent into flat edge arrays.
//
// Exposed as a plain C ABI for ctypes; all buffers are caller-allocated.

#include <array>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cstdio>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Site-pattern compression.
// codes: int32 [n_taxa, n_sites] row-major. Output: first-occurrence order.
// Returns number of patterns, or -1 on error.
// codes_out: int32 [n_taxa, n_sites] (only first n_patterns columns valid)
// w_out: double [n_sites]
// ---------------------------------------------------------------------------
int64_t pllmod_compress_patterns(const int32_t* codes, int64_t n_taxa,
                                 int64_t n_sites, const double* w_in,
                                 int32_t* codes_out, double* w_out) {
  if (n_taxa <= 0 || n_sites < 0) return -1;
  std::unordered_map<std::string, int64_t> seen;
  seen.reserve(static_cast<size_t>(n_sites) * 2);
  std::string key(static_cast<size_t>(n_taxa) * sizeof(int32_t), '\0');
  int64_t n_pat = 0;
  std::vector<int32_t> col(n_taxa);
  for (int64_t s = 0; s < n_sites; ++s) {
    for (int64_t t = 0; t < n_taxa; ++t) col[t] = codes[t * n_sites + s];
    std::memcpy(&key[0], col.data(), key.size());
    auto it = seen.find(key);
    int64_t idx;
    if (it == seen.end()) {
      idx = n_pat++;
      seen.emplace(key, idx);
      for (int64_t t = 0; t < n_taxa; ++t)
        codes_out[t * n_sites + idx] = col[t];
      w_out[idx] = 0.0;
    } else {
      idx = it->second;
    }
    w_out[idx] += w_in ? w_in[s] : 1.0;
  }
  return n_pat;
}

// ---------------------------------------------------------------------------
// Fitch parsimony score.
// masks: uint64 [n_nodes_total?][n_sites] — tip rows only (n_tips rows).
// ops: int32 [n_ops, 3] postorder rows (parent_tmp, child1, child2) where
//   ids < n_tips refer to tips, else to previously computed temp rows
//   (id - n_tips indexes the scratch).
// w: double [n_sites] pattern weights.
// Returns the total weighted mutation count.
// ---------------------------------------------------------------------------
double pllmod_fitch_score(const uint64_t* tip_masks, int64_t n_tips,
                          int64_t n_sites, const int32_t* ops, int64_t n_ops,
                          const double* w) {
  std::vector<uint64_t> scratch(static_cast<size_t>(n_ops) * n_sites);
  double score = 0.0;
  for (int64_t i = 0; i < n_ops; ++i) {
    int32_t c1 = ops[i * 3 + 1];
    int32_t c2 = ops[i * 3 + 2];
    const uint64_t* a = (c1 < n_tips)
        ? tip_masks + static_cast<size_t>(c1) * n_sites
        : scratch.data() + static_cast<size_t>(c1 - n_tips) * n_sites;
    const uint64_t* b = (c2 < n_tips)
        ? tip_masks + static_cast<size_t>(c2) * n_sites
        : scratch.data() + static_cast<size_t>(c2 - n_tips) * n_sites;
    uint64_t* out = scratch.data() + static_cast<size_t>(i) * n_sites;
    double local = 0.0;
    for (int64_t s = 0; s < n_sites; ++s) {
      uint64_t inter = a[s] & b[s];
      if (inter == 0) {
        out[s] = a[s] | b[s];
        local += w[s];
      } else {
        out[s] = inter;
      }
    }
    score += local;
  }
  return score;
}

// ---------------------------------------------------------------------------
// Transfer-distance matrix between two normalized split sets.
// a: uint64 [na, n_words]; b: uint64 [nb, n_words]; out: int32 [na, nb]
// d = min(popcount(xor), n_tips - popcount(xor))
// ---------------------------------------------------------------------------
void pllmod_transfer_distance_matrix(const uint64_t* a, int64_t na,
                                     const uint64_t* b, int64_t nb,
                                     int64_t n_words, int64_t n_tips,
                                     int32_t* out) {
  for (int64_t i = 0; i < na; ++i) {
    const uint64_t* ai = a + i * n_words;
    for (int64_t j = 0; j < nb; ++j) {
      const uint64_t* bj = b + j * n_words;
      int64_t d = 0;
      for (int64_t k = 0; k < n_words; ++k)
        d += __builtin_popcountll(ai[k] ^ bj[k]);
      int64_t dd = n_tips - d;
      out[i * nb + j] = static_cast<int32_t>(d < dd ? d : dd);
    }
  }
}

// ---------------------------------------------------------------------------
// Directed Fitch state sets (the parsimony analog of directed CLVs):
// for every live edge e=(u,v), A[e] = Fitch set of u's side computed
// toward v, B[e] = v's side toward u (pll_fastparsimony's per-direction
// state sets). masks: uint64 [n_tips, S] per-site state bitmasks.
// edges: int32 [E, 2] (-1 rows dead). Outputs A/B uint64 [E, S].
// Returns 0, or -1 on malformed trees (e.g. disconnected).
// ---------------------------------------------------------------------------
static inline void fitch2(const uint64_t* a, const uint64_t* b,
                          uint64_t* out, int64_t S) {
  for (int64_t s = 0; s < S; ++s) {
    const uint64_t inter = a[s] & b[s];
    out[s] = inter ? inter : (a[s] | b[s]);
  }
}

int pllmod_directed_fitch_sets(const int32_t* edges, int64_t E,
                               int64_t n_tips, int64_t n_nodes,
                               const uint64_t* masks, int64_t S,
                               uint64_t* A, uint64_t* B) {
  // adjacency (node -> incident (nbr, edge) pairs)
  std::vector<int32_t> deg(n_nodes, 0);
  for (int64_t e = 0; e < E; ++e)
    if (edges[2 * e] >= 0) { ++deg[edges[2 * e]]; ++deg[edges[2 * e + 1]]; }
  std::vector<int64_t> off(n_nodes + 1, 0);
  for (int64_t i = 0; i < n_nodes; ++i) off[i + 1] = off[i] + deg[i];
  std::vector<int32_t> nbr(off[n_nodes]), ned(off[n_nodes]);
  std::vector<int64_t> fill(off.begin(), off.end() - 1);
  for (int64_t e = 0; e < E; ++e) {
    const int32_t u = edges[2 * e], v = edges[2 * e + 1];
    if (u < 0) continue;
    nbr[fill[u]] = v; ned[fill[u]++] = (int32_t)e;
    nbr[fill[v]] = u; ned[fill[v]++] = (int32_t)e;
  }
  // dir_set(e, toward): the set of the side OPPOSITE `toward`; store
  // A[e] = set of edges[e][0]'s side, B[e] = edges[e][1]'s side.
  // Iterative DFS from the first live tip's neighbor computing "up"
  // sets post-order, then "down" sets pre-order.
  int64_t root_tip = -1;
  for (int64_t t = 0; t < n_tips; ++t)
    if (deg[t]) { root_tip = t; break; }
  if (root_tip < 0 || deg[root_tip] != 1) return -1;
  const int32_t r = nbr[off[root_tip]];
  const int32_t e0 = ned[off[root_tip]];
  auto side_ptr = [&](int64_t e, int32_t node) {
    return (edges[2 * e] == node) ? A + e * S : B + e * S;
  };
  // post-order stack: (node, parent_edge, phase)
  std::vector<std::array<int32_t, 3>> stack;
  stack.push_back({r, e0, 0});
  std::vector<uint64_t> tmp(S);
  while (!stack.empty()) {
    auto [node, pe, phase] = stack.back();
    stack.pop_back();
    if (node < n_tips) {
      std::memcpy(side_ptr(pe, node), masks + node * S, S * 8);
      continue;
    }
    if (phase == 0) {
      stack.push_back({node, pe, 1});
      for (int64_t k = off[node]; k < off[node + 1]; ++k)
        if (ned[k] != pe) stack.push_back({nbr[k], ned[k], 0});
    } else {
      uint64_t* out = side_ptr(pe, node);
      bool first = true;
      for (int64_t k = off[node]; k < off[node + 1]; ++k) {
        if (ned[k] == pe) continue;
        // child set toward `node` = the side of edge ned[k] at nbr[k]
        const uint64_t* cs = side_ptr(ned[k], nbr[k]);
        if (first) { std::memcpy(out, cs, S * 8); first = false; }
        else fitch2(out, cs, out, S);
      }
    }
  }
  std::memcpy(side_ptr(e0, root_tip), masks + root_tip * S, S * 8);
  // pre-order down sets: set at `node` toward child c = fitch2 of the
  // parent-side set and the other children's up sets
  std::vector<std::array<int32_t, 2>> pstack;
  pstack.push_back({r, e0});
  while (!pstack.empty()) {
    auto [node, pe] = pstack.back();
    pstack.pop_back();
    if (node < n_tips) continue;
    for (int64_t k = off[node]; k < off[node + 1]; ++k) {
      if (ned[k] == pe) continue;
      const int32_t ce = ned[k];
      // down set for child edge ce (side at `node`)
      uint64_t* out = side_ptr(ce, node);
      // parent side of pe at the OTHER endpoint (i.e. not node's side)
      const uint64_t* ps = (edges[2 * pe] == node) ? B + pe * S
                                                   : A + pe * S;
      std::memcpy(out, ps, S * 8);
      for (int64_t k2 = off[node]; k2 < off[node + 1]; ++k2) {
        if (ned[k2] == pe || ned[k2] == ce) continue;
        fitch2(out, side_ptr(ned[k2], nbr[k2]), out, S);
      }
      pstack.push_back({nbr[k], ce});
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Directed-CLV traversal compilation (the host-side schedule build of
// optimize/blo.DirectedTraversal — the SPR candidate hot loop at >=1k
// taxa): one post-order pass (every inner node's CLV toward its
// parent) + one pre-order pass (every node's CLV away from each
// child), rows (slot, ref1, edge1, ref2, edge2) with slot = row index
// and refs = tip id or n_tips + slot. slot_de[e][side] = the slot of
// the CLV at edges[e][side] directed toward the other endpoint (-1 =
// absent: tips, or edges outside root_tip's component). Traversal
// order replicates the python builder exactly (same adjacency
// enumeration + LIFO stacks) so slot numbering is identical.
// Returns n_rows, or -1 (malformed/multifurcating -> python fallback).
// ---------------------------------------------------------------------------
int64_t pllmod_directed_traversal(const int32_t* edges, int64_t E,
                                  int64_t n_tips, int64_t n_nodes,
                                  int32_t root_tip, int32_t* ops_out,
                                  int64_t cap, int32_t* slot_de) {
  std::vector<int32_t> deg(n_nodes, 0);
  for (int64_t e = 0; e < E; ++e)
    if (edges[2 * e] >= 0) { ++deg[edges[2 * e]]; ++deg[edges[2 * e + 1]]; }
  std::vector<int64_t> off(n_nodes + 1, 0);
  for (int64_t i = 0; i < n_nodes; ++i) off[i + 1] = off[i] + deg[i];
  std::vector<int32_t> nbr(off[n_nodes]), ned(off[n_nodes]);
  std::vector<int64_t> fill(off.begin(), off.end() - 1);
  for (int64_t e = 0; e < E; ++e) {
    const int32_t u = edges[2 * e], v = edges[2 * e + 1];
    if (u < 0) continue;
    nbr[fill[u]] = v; ned[fill[u]++] = (int32_t)e;
    nbr[fill[v]] = u; ned[fill[v]++] = (int32_t)e;
  }
  for (int64_t i = 0; i < 2 * E; ++i) slot_de[i] = -1;
  if (root_tip < 0 || root_tip >= n_tips || deg[root_tip] != 1)
    return -1;
  const int32_t r = nbr[off[root_tip]];
  const int32_t e0 = ned[off[root_tip]];
  int64_t n_rows = 0;
  auto slot_ref = [&](int64_t e, int32_t node) -> int32_t* {
    return slot_de + 2 * e + (edges[2 * e] == node ? 0 : 1);
  };
  auto ref_of = [&](int32_t node, int64_t via_edge) -> int64_t {
    if (node < n_tips) return node;
    const int32_t s = *slot_ref(via_edge, node);
    return s < 0 ? -1 : n_tips + s;
  };
  // post-order (LIFO two-phase, neighbors pushed in adjacency order)
  std::vector<std::array<int32_t, 4>> st;  // node, parent, pedge, phase
  st.push_back({r, root_tip, e0, 0});
  while (!st.empty()) {
    auto [node, par, pe, phase] = st.back();
    st.pop_back();
    if (node < n_tips) continue;
    if (phase == 0) {
      st.push_back({node, par, pe, 1});
      for (int64_t k = off[node]; k < off[node + 1]; ++k)
        if (!(nbr[k] == par && ned[k] == pe))
          st.push_back({nbr[k], node, ned[k], 0});
    } else {
      int32_t kc[2], ke[2];
      int nk = 0;
      for (int64_t k = off[node]; k < off[node + 1]; ++k) {
        if (nbr[k] == par && ned[k] == pe) continue;
        if (nk >= 2) return -1;            // multifurcation
        kc[nk] = nbr[k]; ke[nk] = ned[k]; ++nk;
      }
      if (nk != 2 || n_rows >= cap) return -1;
      const int64_t r1 = ref_of(kc[0], ke[0]);
      const int64_t r2 = ref_of(kc[1], ke[1]);
      if (r1 < 0 || r2 < 0) return -1;
      *slot_ref(pe, node) = (int32_t)n_rows;
      int32_t* row = ops_out + 5 * n_rows++;
      row[0] = (int32_t)(n_rows - 1);
      row[1] = (int32_t)r1; row[2] = ke[0];
      row[3] = (int32_t)r2; row[4] = ke[1];
    }
  }
  // pre-order: slots (u -> child)
  std::vector<std::array<int32_t, 3>> ps;  // node, parent, pedge
  ps.push_back({r, root_tip, e0});
  while (!ps.empty()) {
    auto [u, par, pe] = ps.back();
    ps.pop_back();
    if (u < n_tips) continue;
    int32_t kc[2], ke[2];
    int nk = 0;
    for (int64_t k = off[u]; k < off[u + 1]; ++k) {
      if (ned[k] == pe) continue;
      if (nk >= 2) return -1;
      kc[nk] = nbr[k]; ke[nk] = ned[k]; ++nk;
    }
    if (nk != 2) return -1;
    for (int pass = 0; pass < 2; ++pass) {
      const int32_t c = kc[pass], ec = ke[pass];
      const int32_t o = kc[1 - pass];
      const int32_t eo = ke[1 - pass];
      const int64_t rp = ref_of(par, pe);
      const int64_t ro = ref_of(o, eo);
      if (rp < 0 || ro < 0 || n_rows >= cap) return -1;
      *slot_ref(ec, u) = (int32_t)n_rows;
      int32_t* row = ops_out + 5 * n_rows++;
      row[0] = (int32_t)(n_rows - 1);
      row[1] = (int32_t)rp; row[2] = pe;
      row[3] = (int32_t)ro; row[4] = eo;
      (void)c;
    }
    ps.push_back({kc[0], u, ke[0]});
    ps.push_back({kc[1], u, ke[1]});
  }
  return n_rows;
}

// ---------------------------------------------------------------------------
// Greedy stepwise-addition parsimony tree (pll_fastparsimony_stepwise
// regime): insert taxa in `order`, each at the edge minimizing
// sum_sites w * [(fitch_edge_set & tip_mask) == 0], recomputing the
// directed sets per insertion (O(n) fitch passes, all in-cache).
// Multi-partition = concatenated masks/weights (cost is per-site
// separable). edges_out: int32 [2n-3, 2]; inner ids start at n_tips.
// Tie-break: lowest edge id (matches np.argmin-first semantics of the
// python reference path). Returns 0 or -1.
// ---------------------------------------------------------------------------
int pllmod_parsimony_stepwise(const uint64_t* masks, int64_t n,
                              int64_t S, const double* w,
                              const int32_t* order,
                              int32_t* edges_out) {
  if (n < 3) return -1;
  const int64_t E_max = 2 * n - 3;
  std::vector<int32_t> edges(E_max * 2, -1);
  const int32_t t0 = order[0], t1 = order[1], t2 = order[2];
  edges[0] = t0; edges[1] = (int32_t)n;
  edges[2] = t1; edges[3] = (int32_t)n;
  edges[4] = t2; edges[5] = (int32_t)n;
  int64_t E = 3;
  int32_t next_inner = (int32_t)n + 1;
  std::vector<uint64_t> A(E_max * S), B(E_max * S), es(S);
  for (int64_t i = 3; i < n; ++i) {
    const int32_t tip = order[i];
    if (pllmod_directed_fitch_sets(edges.data(), E, n, next_inner,
                                   masks, S, A.data(), B.data()) != 0)
      return -1;
    const uint64_t* tm = masks + (int64_t)tip * S;
    double best_cost = 0; int64_t best = -1;
    for (int64_t e = 0; e < E; ++e) {
      fitch2(A.data() + e * S, B.data() + e * S, es.data(), S);
      double cost = 0;
      for (int64_t s = 0; s < S; ++s)
        if (!(es[s] & tm[s])) cost += w[s];
      if (best < 0 || cost < best_cost) { best_cost = cost; best = e; }
    }
    const int32_t u = edges[2 * best], v = edges[2 * best + 1];
    const int32_t wn = next_inner++;
    edges[2 * best] = u; edges[2 * best + 1] = wn;
    edges[2 * E] = wn; edges[2 * E + 1] = v; ++E;
    edges[2 * E] = tip; edges[2 * E + 1] = wn; ++E;
  }
  std::memcpy(edges_out, edges.data(), E_max * 2 * 4);
  return 0;
}

// ---------------------------------------------------------------------------
// TBE minimum transfer distances via counting traversals (the Nature
// linear-scan regime of the reference's pllmod_utree_tbe_nature,
// tbe_functions.c:104-147 search_mindist): for each reference split, ONE
// O(N) pass over the bootstrap tree's postorder accumulates the number
// of light-side taxa under every node; the candidate transfer distance
// at a node with subtree size s and ones o = |light ∩ subtree| is
// |light Δ subtree| = p + s - 2o, folded to min(d, n - d) (the
// complement orientation). Replaces the O(R x B x words) popcount
// matrix whose cost explodes at >=10k taxa x hundreds of boot trees.
//
// light:  uint64 [R, n_words] light-side (p = popcount <= n/2) masks
// p:      int32 [R]
// post:   int32 [n_post, 3] rows (node, left_child, right_child) in
//         postorder over the boot tree rooted at a tip's neighbor; node
//         ids < n_tips are leaves (implicit), >= n_tips inner.
// n_nodes: total node-id space (count buffer size)
// out:    int32 [R] minimum transfer distance (floor p-1 from trivial
//         splits included, matching the naive driver semantics)
// ---------------------------------------------------------------------------
void pllmod_tbe_mindist(const uint64_t* light, const int32_t* p,
                        int64_t R, int64_t n_words, int64_t n_tips,
                        const int32_t* post, int64_t n_post,
                        int64_t n_nodes, int32_t* out) {
  std::vector<int32_t> size(n_nodes, 0);
  std::vector<int32_t> ones(n_nodes, 0);
  // subtree sizes: one counting pass with all-ones "query"
  for (int64_t t = 0; t < n_tips; ++t) size[t] = 1;
  for (int64_t i = 0; i < n_post; ++i) {
    const int32_t* row = post + i * 3;
    size[row[0]] = size[row[1]] + size[row[2]];
  }
  const int64_t half = n_tips / 2;
  for (int64_t r = 0; r < R; ++r) {
    const uint64_t* lr = light + r * n_words;
    for (int64_t t = 0; t < n_tips; ++t)
      ones[t] = (lr[t >> 6] >> (t & 63)) & 1u;
    int32_t best = p[r] - 1;
    for (int64_t i = 0; i < n_post && best > 0; ++i) {
      const int32_t* row = post + i * 3;
      const int32_t o = ones[row[1]] + ones[row[2]];
      ones[row[0]] = o;
      int64_t cand = (int64_t)p[r] + size[row[0]] - 2 * o;
      if (cand > half) cand = n_tips - cand;
      if (cand < best) best = (int32_t)cand;
    }
    out[r] = best;
  }
}

// ---------------------------------------------------------------------------
// Shared-split count between two sorted-or-unsorted split sets (RF core).
// Uses a hash set over split bytes. Returns the number of shared splits.
// ---------------------------------------------------------------------------
int64_t pllmod_shared_splits(const uint64_t* a, int64_t na,
                             const uint64_t* b, int64_t nb,
                             int64_t n_words) {
  std::unordered_map<std::string, int> set;
  set.reserve(static_cast<size_t>(na) * 2);
  std::string key(static_cast<size_t>(n_words) * 8, '\0');
  for (int64_t i = 0; i < na; ++i) {
    std::memcpy(&key[0], a + i * n_words, key.size());
    set.emplace(key, 1);
  }
  int64_t shared = 0;
  for (int64_t j = 0; j < nb; ++j) {
    std::memcpy(&key[0], b + j * n_words, key.size());
    auto it = set.find(key);
    if (it != set.end() && it->second) {
      it->second = 0;  // count each split once
      ++shared;
    }
  }
  return shared;
}

// ---------------------------------------------------------------------------
// Newick parsing into flat arrays (pll_utree_parse_newick analog).
//
// Output convention matches pllmod_tpu.tree.topology.parse_newick:
//  - tips numbered 0..T-1 in encounter order, inner nodes follow,
//  - edges (parent, child) with branch lengths,
//  - labels_buf: tip labels '\0'-separated in tip order.
// Rooted bifurcations are NOT unrooted here (python wrapper does that).
// Returns 0 on success, negative error code otherwise.
// ---------------------------------------------------------------------------
struct NwState {
  const char* s;
  int64_t pos;
  int64_t len;
};

static void nw_skip_ws(NwState* st) {
  while (st->pos < st->len &&
         (st->s[st->pos] == ' ' || st->s[st->pos] == '\t' ||
          st->s[st->pos] == '\n' || st->s[st->pos] == '\r'))
    ++st->pos;
}

struct NwOut {
  std::vector<int32_t> edges;       // pairs (parent_tmp, child_tmp)
  std::vector<double> lengths;
  std::vector<std::string> tip_labels;
  std::vector<int32_t> tmp_is_tip;  // per temp node
  std::vector<int32_t> n_children;
};

static int64_t nw_node(NwOut* out, int is_tip, const std::string& label) {
  out->tmp_is_tip.push_back(is_tip);
  out->n_children.push_back(0);
  if (is_tip) out->tip_labels.push_back(label);
  return static_cast<int64_t>(out->tmp_is_tip.size()) - 1;
}

static int nw_label(NwState* st, std::string* out) {
  nw_skip_ws(st);
  if (st->pos >= st->len) return -1;
  char c = st->s[st->pos];
  if (c == '\'' || c == '"') {
    char q = c;
    ++st->pos;
    int64_t start = st->pos;
    while (st->pos < st->len && st->s[st->pos] != q) ++st->pos;
    if (st->pos >= st->len) return -1;
    out->assign(st->s + start, st->pos - start);
    ++st->pos;
    return 0;
  }
  int64_t start = st->pos;
  while (st->pos < st->len) {
    c = st->s[st->pos];
    if (c == '(' || c == ')' || c == ',' || c == ';' || c == ':' ||
        c == ' ' || c == '\t' || c == '\n' || c == '\r')
      break;
    ++st->pos;
  }
  if (st->pos == start) return -1;
  out->assign(st->s + start, st->pos - start);
  return 0;
}

static int nw_clade(NwState* st, NwOut* out, int64_t* node, double* blen);

static int nw_children(NwState* st, NwOut* out, int64_t parent) {
  for (;;) {
    int64_t child;
    double blen;
    if (nw_clade(st, out, &child, &blen)) return -1;
    out->edges.push_back(static_cast<int32_t>(parent));
    out->edges.push_back(static_cast<int32_t>(child));
    out->lengths.push_back(blen);
    out->n_children[parent]++;
    nw_skip_ws(st);
    if (st->pos < st->len && st->s[st->pos] == ',') {
      ++st->pos;
      continue;
    }
    break;
  }
  nw_skip_ws(st);
  if (st->pos >= st->len || st->s[st->pos] != ')') return -1;
  ++st->pos;
  return 0;
}

static int nw_clade(NwState* st, NwOut* out, int64_t* node, double* blen) {
  nw_skip_ws(st);
  if (st->pos >= st->len) return -1;
  if (st->s[st->pos] == '(') {
    ++st->pos;
    *node = nw_node(out, 0, "");
    if (nw_children(st, out, *node)) return -1;
    nw_skip_ws(st);
    // optional inner label (support) — skipped
    if (st->pos < st->len && st->s[st->pos] != ':' &&
        st->s[st->pos] != ',' && st->s[st->pos] != ')' &&
        st->s[st->pos] != ';') {
      std::string dummy;
      if (nw_label(st, &dummy)) return -1;
    }
  } else {
    std::string label;
    if (nw_label(st, &label)) return -1;
    *node = nw_node(out, 1, label);
  }
  *blen = 0.0;
  nw_skip_ws(st);
  if (st->pos < st->len && st->s[st->pos] == ':') {
    ++st->pos;
    nw_skip_ws(st);
    char* end = nullptr;
    *blen = std::strtod(st->s + st->pos, &end);
    if (end == st->s + st->pos) return -1;
    st->pos = end - st->s;
  }
  return 0;
}

// Returns 0 ok; fills counts. Caller then calls pllmod_newick_extract.
static thread_local NwOut* g_last = nullptr;
static thread_local int64_t g_root = -1;

int pllmod_newick_parse(const char* s, int64_t slen, int64_t* n_tips,
                        int64_t* n_edges, int64_t* n_nodes,
                        int64_t* labels_bytes, int64_t* root_children) {
  NwState st{s, 0, slen};
  delete g_last;
  g_last = new NwOut();
  int64_t root;
  double blen;
  if (nw_clade(&st, g_last, &root, &blen)) return -1;
  nw_skip_ws(&st);
  if (st.pos >= st.len || st.s[st.pos] != ';') return -2;
  g_root = root;
  *n_tips = static_cast<int64_t>(g_last->tip_labels.size());
  *n_edges = static_cast<int64_t>(g_last->lengths.size());
  *n_nodes = static_cast<int64_t>(g_last->tmp_is_tip.size());
  int64_t lb = 0;
  for (auto& l : g_last->tip_labels) lb += static_cast<int64_t>(l.size()) + 1;
  *labels_bytes = lb;
  *root_children = g_last->n_children[root];
  return 0;
}

// Extract with final numbering (tips 0.., inners after) exactly like the
// python parser: tips in encounter order, inner in creation order.
int pllmod_newick_extract(int32_t* edges_out, double* lengths_out,
                          char* labels_out, int64_t labels_cap,
                          int64_t* root_out) {
  if (!g_last) return -1;
  NwOut* o = g_last;
  int64_t n_tmp = static_cast<int64_t>(o->tmp_is_tip.size());
  int64_t n_tips = static_cast<int64_t>(o->tip_labels.size());
  std::vector<int32_t> remap(n_tmp);
  int32_t tip_c = 0, inner_c = static_cast<int32_t>(n_tips);
  for (int64_t t = 0; t < n_tmp; ++t)
    remap[t] = o->tmp_is_tip[t] ? tip_c++ : inner_c++;
  int64_t ne = static_cast<int64_t>(o->lengths.size());
  for (int64_t e = 0; e < ne; ++e) {
    edges_out[e * 2] = remap[o->edges[e * 2]];
    edges_out[e * 2 + 1] = remap[o->edges[e * 2 + 1]];
    lengths_out[e] = o->lengths[e];
  }
  int64_t off = 0;
  for (auto& l : o->tip_labels) {
    if (off + static_cast<int64_t>(l.size()) + 1 > labels_cap) return -2;
    std::memcpy(labels_out + off, l.c_str(), l.size() + 1);
    off += static_cast<int64_t>(l.size()) + 1;
  }
  *root_out = remap[g_root];
  return 0;
}

}  // extern "C"
