// Host-side computational geometry for etol-tpu.
//
// Native replacement for the reference's CGAL usage
// (optimal_convex_partition_2 inside TrajectoryOptimizer::genRegion,
// reference TrajectoryOptimizer.cpp:84-159) and the eOMPL ray-casting
// ValidityChecker (eOMPL.cpp:22-111). Ear-clipping triangulation +
// Hertel-Mehlhorn diagonal merging; emits convex pieces as index lists,
// plus halfspace rows and edge-ellipse rows in the device layout used by
// etol_tpu.core.problem. Exposed through a plain C ABI for ctypes.
//
// Build: make -C native   (produces libetpu_geometry.so)

#include <array>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct P2 {
  double x, y;
};

inline double cross2(const P2 &o, const P2 &a, const P2 &b) {
  return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

constexpr double kEps = 1e-12;

double signed_area(const std::vector<P2> &p) {
  double s = 0.0;
  const size_t n = p.size();
  for (size_t i = 0; i < n; ++i) {
    const P2 &a = p[i], &b = p[(i + 1) % n];
    s += a.x * b.y - b.x * a.y;
  }
  return 0.5 * s;
}

bool is_ear(const std::vector<P2> &poly, const std::vector<int> &idxs,
            int i) {
  const int n = static_cast<int>(idxs.size());
  const P2 &pp = poly[idxs[(i - 1 + n) % n]];
  const P2 &pc = poly[idxs[i]];
  const P2 &pn = poly[idxs[(i + 1) % n]];
  if (cross2(pp, pc, pn) <= kEps) return false;  // reflex / collinear
  // vertices on the ear's boundary also block it: an ear whose chord
  // passes through another vertex splits the remainder into degenerate
  // overlapping pieces (L-shape case)
  for (int j = 0; j < n; ++j) {
    if (j == (i - 1 + n) % n || j == i || j == (i + 1) % n) continue;
    const P2 &q = poly[idxs[j]];
    if (cross2(pp, pc, q) > -1e-9 && cross2(pc, pn, q) > -1e-9 &&
        cross2(pn, pp, q) > -1e-9)
      return false;
  }
  return true;
}

// Ear-clipping triangulation; assumes CCW input. Returns index triples.
bool triangulate(const std::vector<P2> &poly,
                 std::vector<std::array<int, 3>> *tris);

bool triangulate(const std::vector<P2> &poly,
                 std::vector<std::array<int, 3>> *tris) {
  const int n = static_cast<int>(poly.size());
  if (n < 3) return false;
  std::vector<int> idxs(n);
  for (int i = 0; i < n; ++i) idxs[i] = i;
  long guard = 0;
  while (static_cast<int>(idxs.size()) > 3) {
    if (++guard > 10L * n * n) return false;
    const int m = static_cast<int>(idxs.size());
    bool clipped = false;
    for (int i = 0; i < m; ++i) {
      if (is_ear(poly, idxs, i)) {
        tris->push_back({idxs[(i - 1 + m) % m], idxs[i], idxs[(i + 1) % m]});
        idxs.erase(idxs.begin() + i);
        clipped = true;
        break;
      }
    }
    if (!clipped) {
      // degenerate input: clip the most-convex vertex to make progress
      int best = 0;
      double best_c = -1e300;
      for (int i = 0; i < m; ++i) {
        double c = cross2(poly[idxs[(i - 1 + m) % m]], poly[idxs[i]],
                          poly[idxs[(i + 1) % m]]);
        if (c > best_c) {
          best_c = c;
          best = i;
        }
      }
      tris->push_back({idxs[(best - 1 + m) % m], idxs[best],
                       idxs[(best + 1) % m]});
      idxs.erase(idxs.begin() + best);
    }
  }
  tris->push_back({idxs[0], idxs[1], idxs[2]});
  return true;
}

bool piece_convex(const std::vector<P2> &poly, const std::vector<int> &pc) {
  const int n = static_cast<int>(pc.size());
  for (int i = 0; i < n; ++i) {
    if (cross2(poly[pc[(i - 1 + n) % n]], poly[pc[i]],
               poly[pc[(i + 1) % n]]) < -1e-9)
      return false;
  }
  return true;
}

// Merge CCW pieces a, b sharing the directed edge (a[i], a[i+1]) ==
// (b[j+1], b[j]): walk a from i+1 around to i, then b's interior.
std::vector<int> merge_pieces(const std::vector<int> &a,
                              const std::vector<int> &b, int i, int j) {
  const int na = static_cast<int>(a.size());
  const int nb = static_cast<int>(b.size());
  std::vector<int> out;
  int k = (i + 1) % na;
  while (true) {
    out.push_back(a[k]);
    if (k == i) break;
    k = (k + 1) % na;
  }
  k = (j + 1) % nb;
  while (true) {
    k = (k + 1) % nb;
    if (k == j) break;
    out.push_back(b[k]);
  }
  return out;
}

}  // namespace

extern "C" {

// Convex partition of a simple polygon (xy: n pairs, any winding).
// Writes piece index lists (into the CCW-oriented polygon) back-to-back
// into out_indices with out_offsets[p]..out_offsets[p+1] delimiting piece
// p. Returns the piece count, or -1 on failure / capacity overflow.
// NOTE: indices refer to the CCW ordering; out_ccw (length n, may be
// null) receives the mapping new_index -> original_index.
int etpu_convex_partition(const double *xy, int n, int *out_offsets,
                          int *out_indices, int max_pieces, int cap,
                          int *out_ccw) {
  if (n < 3) return -1;
  std::vector<P2> poly(n);
  for (int i = 0; i < n; ++i) poly[i] = {xy[2 * i], xy[2 * i + 1]};
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  if (signed_area(poly) < 0) {
    std::vector<P2> rev(n);
    for (int i = 0; i < n; ++i) {
      rev[i] = poly[n - 1 - i];
      order[i] = n - 1 - i;
    }
    poly.swap(rev);
  }
  if (out_ccw)
    for (int i = 0; i < n; ++i) out_ccw[i] = order[i];

  std::vector<std::array<int, 3>> tris;
  if (!triangulate(poly, &tris)) return -1;
  std::vector<std::vector<int>> pieces;
  for (auto &t : tris) pieces.push_back({t[0], t[1], t[2]});

  // Hertel-Mehlhorn: greedily remove inessential diagonals
  bool merged = true;
  while (merged) {
    merged = false;
    for (size_t ai = 0; ai < pieces.size() && !merged; ++ai) {
      auto &a = pieces[ai];
      for (size_t i = 0; i < a.size() && !merged; ++i) {
        const int e0 = a[i];
        const int e1 = a[(i + 1) % a.size()];
        for (size_t bi = 0; bi < pieces.size() && !merged; ++bi) {
          if (bi == ai) continue;
          auto &b = pieces[bi];
          for (size_t j = 0; j < b.size(); ++j) {
            if (b[j] == e1 && b[(j + 1) % b.size()] == e0) {
              auto cand = merge_pieces(a, b, static_cast<int>(i),
                                       static_cast<int>(j));
              if (piece_convex(poly, cand)) {
                pieces[ai] = cand;
                pieces.erase(pieces.begin() + bi);
                merged = true;
              }
              break;
            }
          }
        }
      }
    }
  }

  if (static_cast<int>(pieces.size()) > max_pieces) return -1;
  int total = 0;
  for (size_t p = 0; p < pieces.size(); ++p) {
    out_offsets[p] = total;
    for (int idx : pieces[p]) {
      if (total >= cap) return -1;
      out_indices[total++] = idx;
    }
  }
  out_offsets[pieces.size()] = total;
  return static_cast<int>(pieces.size());
}

// Ray-casting point-in-polygon; boundary counts as inside
// (eOMPL isInside semantics, eOMPL.cpp:70-94). Returns 1/0.
int etpu_point_in_polygon(const double *xy, int n, double px, double py) {
  bool inside = false;
  for (int i = 0; i < n; ++i) {
    const double x1 = xy[2 * i], y1 = xy[2 * i + 1];
    const int j = (i + 1) % n;
    const double x2 = xy[2 * j], y2 = xy[2 * j + 1];
    const double minx = x1 < x2 ? x1 : x2, maxx = x1 < x2 ? x2 : x1;
    const double miny = y1 < y2 ? y1 : y2, maxy = y1 < y2 ? y2 : y1;
    if (px >= minx - kEps && px <= maxx + kEps && py >= miny - kEps &&
        py <= maxy + kEps &&
        std::fabs((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) < 1e-9)
      return 1;  // on the segment
    if ((y1 > py) != (y2 > py)) {
      const double xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1);
      if (px < xint) inside = !inside;
    }
  }
  return inside ? 1 : 0;
}

// Outward halfspaces of a convex CCW polygon: rows (nx, ny, b), interior
// satisfies nx*x + ny*y <= b. Returns the row count (skips zero edges).
int etpu_piece_halfspaces(const double *xy, int n, double *out) {
  int rows = 0;
  for (int i = 0; i < n; ++i) {
    const int j = (i + 1) % n;
    const double ex = xy[2 * j] - xy[2 * i];
    const double ey = xy[2 * j + 1] - xy[2 * i + 1];
    double nx = ey, ny = -ex;
    const double ln = std::hypot(nx, ny);
    if (ln < kEps) continue;
    nx /= ln;
    ny /= ln;
    out[3 * rows + 0] = nx;
    out[3 * rows + 1] = ny;
    out[3 * rows + 2] = nx * xy[2 * i] + ny * xy[2 * i + 1];
    ++rows;
  }
  return rows;
}

// Per-edge exclusion ellipses (rows cx, cy, cos, sin, asq, bsq) — the
// smooth obstacle form of the reference NLP examples
// (etol_psopt_example1.cpp:140-197). Returns the row count.
int etpu_edge_ellipses(const double *xy, int n, double flatten,
                       double *out) {
  int rows = 0;
  for (int i = 0; i < n; ++i) {
    const int j = (i + 1) % n;
    const double ax = xy[2 * i], ay = xy[2 * i + 1];
    const double bx = xy[2 * j], by = xy[2 * j + 1];
    const double cx = 0.5 * (ax + bx), cy = 0.5 * (ay + by);
    const double radsq = (cx - ax) * (cx - ax) + (cy - ay) * (cy - ay);
    if (radsq < kEps) continue;
    const double t = -std::atan2(cy - ay, cx - ax);
    out[6 * rows + 0] = cx;
    out[6 * rows + 1] = cy;
    out[6 * rows + 2] = std::cos(t);
    out[6 * rows + 3] = std::sin(t);
    out[6 * rows + 4] = radsq;
    out[6 * rows + 5] = flatten * radsq;
    ++rows;
  }
  return rows;
}

}  // extern "C"
