// First-party native runtime components for SAME-TPU.
//
// The reference has no first-party native code — its hot host-side paths sit
// on third-party C/C++ (Qhull Delaunay via scipy, networkx Hopcroft-Karp in
// pure Python). Here the two host-side combinatorial kernels are provided as
// a small C++ library loaded via ctypes (same_tpu/utils/native.py):
//
//   same_delaunay      — Bowyer-Watson Delaunay triangulation (double
//                        precision, long-double incircle predicate), an
//                        alternative backend to Qhull
//                        (SAME_TPU_DELAUNAY=native);
//   same_hopcroft_karp — maximum-cardinality bipartite matching for the
//                        cross-window merge
//                        (windows.merge_window_matches_unique_ref).
//
// Build: make -C native   (produces libsame_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <functional>
#include <queue>
#include <vector>

namespace {

struct Tri {
  int64_t a, b, c;
  bool alive;
};

// Sign of the cross product (b-a) x (c-a).
static long double orient2d(const double* p, int64_t a, int64_t b, int64_t c) {
  long double ax = p[2 * a], ay = p[2 * a + 1];
  long double bx = p[2 * b], by = p[2 * b + 1];
  long double cx = p[2 * c], cy = p[2 * c + 1];
  return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax);
}

// Incircle test: is point d strictly inside the circumcircle of (a, b, c)?
// Assumes (a, b, c) is counter-clockwise.
static bool in_circle(const double* p, int64_t a, int64_t b, int64_t c,
                      int64_t d) {
  long double adx = p[2 * a] - p[2 * d];
  long double ady = p[2 * a + 1] - p[2 * d + 1];
  long double bdx = p[2 * b] - p[2 * d];
  long double bdy = p[2 * b + 1] - p[2 * d + 1];
  long double cdx = p[2 * c] - p[2 * d];
  long double cdy = p[2 * c + 1] - p[2 * d + 1];
  long double det =
      (adx * adx + ady * ady) * (bdx * cdy - cdx * bdy) -
      (bdx * bdx + bdy * bdy) * (adx * cdy - cdx * ady) +
      (cdx * cdx + cdy * cdy) * (adx * bdy - bdx * ady);
  return det > 0;
}

}  // namespace

extern "C" {

// Bowyer-Watson triangulation of n points (xy interleaved). Writes up to
// max_tris triangles (vertex triples) to out; returns triangle count, or -1
// on failure / overflow. Super-triangle vertices are appended internally.
int64_t same_delaunay(const double* xy, int64_t n, int64_t* out,
                      int64_t max_tris) {
  if (n < 3) return 0;

  // Working copy with 3 super-triangle vertices appended.
  std::vector<double> pts(xy, xy + 2 * n);
  double min_x = xy[0], max_x = xy[0], min_y = xy[1], max_y = xy[1];
  for (int64_t i = 0; i < n; ++i) {
    min_x = std::min(min_x, xy[2 * i]);
    max_x = std::max(max_x, xy[2 * i]);
    min_y = std::min(min_y, xy[2 * i + 1]);
    max_y = std::max(max_y, xy[2 * i + 1]);
  }
  double dx = max_x - min_x, dy = max_y - min_y;
  double delta = std::max({dx, dy, 1.0}) * 100.0;
  double mx = (min_x + max_x) / 2.0, my = (min_y + max_y) / 2.0;
  int64_t s0 = n, s1 = n + 1, s2 = n + 2;
  pts.push_back(mx - 2 * delta);
  pts.push_back(my - delta);
  pts.push_back(mx + 2 * delta);
  pts.push_back(my - delta);
  pts.push_back(mx);
  pts.push_back(my + 2 * delta);
  const double* p = pts.data();

  std::vector<Tri> tris;
  tris.push_back({s0, s1, s2, true});

  std::vector<int64_t> bad;
  // Boundary edges of the cavity with multiplicity bookkeeping.
  std::vector<std::pair<int64_t, int64_t>> edges;

  for (int64_t i = 0; i < n; ++i) {
    bad.clear();
    edges.clear();
    for (int64_t t = 0; t < (int64_t)tris.size(); ++t) {
      if (!tris[t].alive) continue;
      if (in_circle(p, tris[t].a, tris[t].b, tris[t].c, i)) {
        bad.push_back(t);
      }
    }
    for (int64_t t : bad) {
      tris[t].alive = false;
      int64_t v[3] = {tris[t].a, tris[t].b, tris[t].c};
      for (int k = 0; k < 3; ++k) {
        int64_t u = v[k], w = v[(k + 1) % 3];
        // An edge shared by two bad triangles appears twice (opposite
        // orientation) and is interior — cancel it.
        auto it = std::find_if(
            edges.begin(), edges.end(),
            [&](const std::pair<int64_t, int64_t>& e) {
              return e.first == w && e.second == u;
            });
        if (it != edges.end()) {
          edges.erase(it);
        } else {
          edges.emplace_back(u, w);
        }
      }
    }
    for (auto& e : edges) {
      // Keep counter-clockwise orientation.
      Tri t{e.first, e.second, i, true};
      if (orient2d(p, t.a, t.b, t.c) < 0) std::swap(t.b, t.c);
      tris.push_back(t);
    }
  }

  int64_t count = 0;
  for (auto& t : tris) {
    if (!t.alive) continue;
    if (t.a >= n || t.b >= n || t.c >= n) continue;  // touches super-triangle
    if (count >= max_tris) return -1;
    out[3 * count] = t.a;
    out[3 * count + 1] = t.b;
    out[3 * count + 2] = t.c;
    ++count;
  }
  return count;
}

// Hopcroft-Karp maximum-cardinality bipartite matching.
// Edges given as parallel arrays (left[i], right[i]); match_out has n_left
// entries set to the matched right vertex or -1. Returns matching size.
int64_t same_hopcroft_karp(const int64_t* left, const int64_t* right,
                           int64_t n_edges, int64_t n_left, int64_t n_right,
                           int64_t* match_out) {
  const int64_t INF = INT64_MAX;
  std::vector<std::vector<int64_t>> adj(n_left);
  for (int64_t e = 0; e < n_edges; ++e) {
    int64_t u = left[e], v = right[e];
    if (u < 0 || u >= n_left || v < 0 || v >= n_right) return -1;
    adj[u].push_back(v);
  }
  std::vector<int64_t> match_l(n_left, -1), match_r(n_right, -1);
  std::vector<int64_t> dist(n_left);

  auto bfs = [&]() -> bool {
    std::queue<int64_t> q;
    for (int64_t u = 0; u < n_left; ++u) {
      if (match_l[u] < 0) {
        dist[u] = 0;
        q.push(u);
      } else {
        dist[u] = INF;
      }
    }
    bool found = false;
    while (!q.empty()) {
      int64_t u = q.front();
      q.pop();
      for (int64_t v : adj[u]) {
        int64_t w = match_r[v];
        if (w < 0) {
          found = true;
        } else if (dist[w] == INF) {
          dist[w] = dist[u] + 1;
          q.push(w);
        }
      }
    }
    return found;
  };

  std::function<bool(int64_t)> dfs = [&](int64_t u) -> bool {
    for (int64_t v : adj[u]) {
      int64_t w = match_r[v];
      if (w < 0 || (dist[w] == dist[u] + 1 && dfs(w))) {
        match_l[u] = v;
        match_r[v] = u;
        return true;
      }
    }
    dist[u] = INF;
    return false;
  };

  int64_t matching = 0;
  while (bfs()) {
    for (int64_t u = 0; u < n_left; ++u) {
      if (match_l[u] < 0 && dfs(u)) ++matching;
    }
  }
  for (int64_t u = 0; u < n_left; ++u) match_out[u] = match_l[u];
  return matching;
}

}  // extern "C"
