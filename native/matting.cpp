// Grid min-cut for GrabCut-style foreground extraction.
//
// The reference pipeline removes backgrounds with rembg (a learned u2net,
// pipline_obj.py:256-261) whose weights need network egress.  This module
// supplies the classical alternative: a max-flow/min-cut solver on the
// 4-connected pixel grid (Dinic's algorithm with BFS level graphs and
// blocking-flow DFS), driven by the GMM color models in
// open_diffusiongs_tpu/utils/matting.py.
//
// C API (ctypes):
//   grid_mincut(h, w, cap_src[h*w], cap_snk[h*w],
//               cap_right[h*(w-1)], cap_down[(h-1)*w], out_fg[h*w])
// cap_src/cap_snk: terminal capacities (data term); cap_right/cap_down:
// symmetric n-link capacities (smoothness).  out_fg[i] = 1 if pixel i is on
// the SOURCE (foreground) side of the minimum cut.  Returns 0 on success.
//
// Build: make -C native  (libmatting.so)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Dinic {
  // arc arrays; arc a's reverse is a ^ 1
  std::vector<int32_t> to_, next_, head_;
  std::vector<double> cap_;
  std::vector<int32_t> level_, iter_;
  int32_t n_;

  explicit Dinic(int32_t n) : head_(n, -1), n_(n) {}

  void add_edge(int32_t u, int32_t v, double c_uv, double c_vu) {
    to_.push_back(v); cap_.push_back(c_uv);
    next_.push_back(head_[u]); head_[u] = (int32_t)to_.size() - 1;
    to_.push_back(u); cap_.push_back(c_vu);
    next_.push_back(head_[v]); head_[v] = (int32_t)to_.size() - 1;
  }

  bool bfs(int32_t s, int32_t t) {
    level_.assign(n_, -1);
    std::vector<int32_t> q;
    q.reserve(n_);
    q.push_back(s);
    level_[s] = 0;
    for (size_t qi = 0; qi < q.size(); qi++) {
      int32_t u = q[qi];
      for (int32_t a = head_[u]; a >= 0; a = next_[a]) {
        if (cap_[a] > 1e-12 && level_[to_[a]] < 0) {
          level_[to_[a]] = level_[u] + 1;
          if (to_[a] == t) {}  // keep BFS exact for level graph
          q.push_back(to_[a]);
        }
      }
    }
    return level_[t] >= 0;
  }

  double dfs(int32_t u, int32_t t, double f) {
    if (u == t) return f;
    for (int32_t& a = iter_[u]; a >= 0; a = next_[a]) {
      int32_t v = to_[a];
      if (cap_[a] > 1e-12 && level_[v] == level_[u] + 1) {
        double d = dfs(v, t, std::min(f, cap_[a]));
        if (d > 0) {
          cap_[a] -= d;
          cap_[a ^ 1] += d;
          return d;
        }
      }
    }
    return 0.0;
  }

  void maxflow(int32_t s, int32_t t) {
    while (bfs(s, t)) {
      iter_ = head_;
      while (dfs(s, t, 1e300) > 0) {}
    }
  }
};

}  // namespace

extern "C" int grid_mincut(int32_t h, int32_t w, const float* cap_src,
                           const float* cap_snk, const float* cap_right,
                           const float* cap_down, uint8_t* out_fg) {
  if (h <= 0 || w <= 0) return 1;
  const int64_t n = (int64_t)h * w;
  const int32_t S = (int32_t)n, T = (int32_t)n + 1;
  Dinic g((int32_t)n + 2);
  g.to_.reserve(4 * (n + (int64_t)h * (w - 1) + (int64_t)(h - 1) * w));

  // terminal links — fold the common min(src, snk) out (it flows anyway),
  // shrinking the graph's total flow and so Dinic's work
  for (int64_t i = 0; i < n; i++) {
    double cs = cap_src[i], ct = cap_snk[i];
    double m = std::min(cs, ct);
    cs -= m; ct -= m;
    if (cs > 0) g.add_edge(S, (int32_t)i, cs, 0.0);
    if (ct > 0) g.add_edge((int32_t)i, T, ct, 0.0);
  }
  for (int32_t y = 0; y < h; y++)
    for (int32_t x = 0; x + 1 < w; x++) {
      double c = cap_right[(int64_t)y * (w - 1) + x];
      if (c > 0) g.add_edge(y * w + x, y * w + x + 1, c, c);
    }
  for (int32_t y = 0; y + 1 < h; y++)
    for (int32_t x = 0; x < w; x++) {
      double c = cap_down[(int64_t)y * w + x];
      if (c > 0) g.add_edge(y * w + x, (y + 1) * w + x, c, c);
    }

  g.maxflow(S, T);

  // source side = nodes reachable from S in the residual graph
  std::vector<uint8_t> vis(n + 2, 0);
  std::vector<int32_t> q;
  q.push_back(S);
  vis[S] = 1;
  for (size_t qi = 0; qi < q.size(); qi++) {
    int32_t u = q[qi];
    for (int32_t a = g.head_[u]; a >= 0; a = g.next_[a]) {
      if (g.cap_[a] > 1e-12 && !vis[g.to_[a]]) {
        vis[g.to_[a]] = 1;
        q.push_back(g.to_[a]);
      }
    }
  }
  for (int64_t i = 0; i < n; i++) out_fg[i] = vis[i];
  return 0;
}
