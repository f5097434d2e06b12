// Native graph loader: edge-list file -> dense adjacency + padded
// neighbor table + degrees, with first-appearance node ordering.
//
// This is the framework's native data-loading runtime component: the
// reference builds graphs through networkx' pure-Python ingest
// (network_reconstruction_nx.py:50-54); here parsing, label interning,
// and table construction run in C++ and fill caller-allocated NumPy
// buffers via a small ctypes-friendly C API (no pybind11 dependency).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC graph_loader.cpp -o libgraph_loader.so

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct GraphHandle {
  std::vector<int64_t> node_ids;               // index -> original label
  std::vector<std::pair<int32_t, int32_t>> edges;  // interned, deduped
  std::vector<int32_t> deg;
  int32_t max_deg = 0;
  std::string error;
};

// Parse one integer token within a line; separators are ',', ' ',
// '\t', '\r'. Sets bad on a malformed token (e.g. float weight or
// alphabetic label) so callers can fall back to the Python parser
// instead of silently corrupting the graph.
inline bool line_int(const char*& p, const char* line_end, int64_t& out,
                     bool& bad) {
  while (p < line_end &&
         (*p == ',' || *p == ' ' || *p == '\t' || *p == '\r'))
    ++p;
  if (p >= line_end) return false;
  bool neg = false;
  if (*p == '-') { neg = true; ++p; }
  int64_t v = 0;
  bool any = false;
  while (p < line_end && *p >= '0' && *p <= '9') {
    v = v * 10 + (*p - '0');
    ++p;
    any = true;
  }
  if (!any) { bad = true; return false; }
  // the token must end at a separator or the line end
  if (p < line_end &&
      !(*p == ',' || *p == ' ' || *p == '\t' || *p == '\r')) {
    bad = true;
    return false;
  }
  out = neg ? -v : v;
  return true;
}

}  // namespace

extern "C" {

// Load and parse an edge list file. Returns an opaque handle (never
// null); check gl_error() for parse failures.
void* gl_load(const char* path) {
  auto* h = new GraphHandle();
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    h->error = std::string("cannot open ") + path;
    return h;
  }
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  if (size < 0) {                 // unseekable input (pipe/fifo)
    h->error = std::string("cannot size ") + path;
    std::fclose(f);
    return h;
  }
  std::fseek(f, 0, SEEK_SET);
  std::string buf(static_cast<size_t>(size), '\0');
  if (size > 0 && std::fread(buf.data(), 1, size, f) != (size_t)size) {
    h->error = "short read";
    std::fclose(f);
    return h;
  }
  std::fclose(f);

  std::unordered_map<int64_t, int32_t> intern;
  intern.reserve(1 << 16);
  const char* p = buf.data();
  const char* end = p + buf.size();
  int64_t a, b;
  bool bad = false;
  std::vector<std::pair<int32_t, int32_t>> raw;
  // line-structured parse: every non-blank, non-comment line must hold
  // EXACTLY two integer tokens — weighted/multi-column or labeled edge
  // lists error out instead of silently pairing tokens across columns
  while (p < end && !bad) {
    const char* le = p;
    while (le < end && *le != '\n') ++le;
    const char* q = p;
    while (q < le && (*q == ',' || *q == ' ' || *q == '\t' || *q == '\r'))
      ++q;
    if (q < le && *q != '#') {
      if (!line_int(q, le, a, bad) || !line_int(q, le, b, bad)) {
        bad = true;
      } else {
        const char* r = q;
        while (r < le &&
               (*r == ',' || *r == ' ' || *r == '\t' || *r == '\r'))
          ++r;
        if (r < le) {
          bad = true;              // extra (third) column
        } else {
          auto ia = intern.emplace((int64_t)a, (int32_t)h->node_ids.size());
          if (ia.second) h->node_ids.push_back(a);
          auto ib = intern.emplace((int64_t)b, (int32_t)h->node_ids.size());
          if (ib.second) h->node_ids.push_back(b);
          int32_t u = ia.first->second, v = ib.first->second;
          if (u != v) raw.emplace_back(u, v);
        }
      }
    }
    p = (le < end) ? le + 1 : end;
  }
  // dedupe undirected edges via a hash set of packed pairs
  std::unordered_map<uint64_t, bool> seen;
  seen.reserve(raw.size() * 2);
  h->deg.assign(h->node_ids.size(), 0);
  for (auto [u, v] : raw) {
    uint64_t key = (uint64_t)(u < v ? u : v) << 32 | (uint32_t)(u < v ? v : u);
    if (seen.emplace(key, true).second) {
      h->edges.emplace_back(u, v);
      h->deg[u]++;
      h->deg[v]++;
    }
  }
  for (int32_t d : h->deg) if (d > h->max_deg) h->max_deg = d;
  if (bad) {
    h->error = "edge lines must be exactly two integer tokens "
               "(weighted/multi-column or labeled files are unsupported)";
  }
  return h;
}

const char* gl_error(void* hp) {
  auto* h = static_cast<GraphHandle*>(hp);
  return h->error.empty() ? nullptr : h->error.c_str();
}

int32_t gl_num_nodes(void* hp) {
  return (int32_t)static_cast<GraphHandle*>(hp)->node_ids.size();
}

int64_t gl_num_edges(void* hp) {
  return (int64_t)static_cast<GraphHandle*>(hp)->edges.size();
}

int32_t gl_max_deg(void* hp) {
  auto* h = static_cast<GraphHandle*>(hp);
  return h->max_deg > 0 ? h->max_deg : 1;
}

// Fill caller-allocated buffers:
//   adj      (n*n) uint8 dense symmetric adjacency
//   nbr      (n*max_deg) int32 padded neighbor table (pad 0)
//   deg      (n) int32
//   node_ids (n) int64 original labels in first-appearance order
void gl_fill(void* hp, uint8_t* adj, int32_t* nbr, int32_t* deg,
             int64_t* node_ids) {
  auto* h = static_cast<GraphHandle*>(hp);
  const int64_t n = (int64_t)h->node_ids.size();
  const int32_t md = h->max_deg > 0 ? h->max_deg : 1;
  std::memset(adj, 0, (size_t)(n * n));
  std::memset(nbr, 0, sizeof(int32_t) * (size_t)(n * md));
  std::vector<int32_t> fill(n, 0);
  for (int64_t i = 0; i < n; ++i) {
    deg[i] = h->deg[i];
    node_ids[i] = h->node_ids[i];
  }
  for (auto [u, v] : h->edges) {
    adj[(int64_t)u * n + v] = 1;
    adj[(int64_t)v * n + u] = 1;
    nbr[(int64_t)u * md + fill[u]++] = v;
    nbr[(int64_t)v * md + fill[v]++] = u;
  }
  // sort each neighbor row so the table is identical to the Python
  // path's np.flatnonzero order (seeded draws reproduce across hosts)
  for (int64_t i = 0; i < n; ++i) {
    std::sort(nbr + i * md, nbr + i * md + fill[i]);
  }
}

void gl_free(void* hp) { delete static_cast<GraphHandle*>(hp); }

}  // extern "C"
