// Native geometry kernel for the host-side polygonization path.
//
// Replaces the skimage/shapely geometry the reference leans on
// (skimage.measure.find_contours in predict/ffl/polygonize_utils.py:15-44,
// shapely simplify) with self-contained C++:
//  - marching_squares: subpixel iso-contours of a float image at a level,
//    chained into closed/open polylines ((y, x) coords, matching skimage);
//  - douglas_peucker: polyline simplification.
//
// Exposed through a plain C ABI for ctypes (no pybind11 in this image).
// Build: g++ -O3 -shared -fPIC -o libp3geometry.so geometry.cpp

#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <utility>
#include <vector>

namespace {

struct Pt {
  double y, x;
};

// Edge key: unique id for a cell edge the contour crosses.
// Horizontal edge between (r,c)-(r,c+1): id = ((r * W + c) << 1) | 0
// Vertical   edge between (r,c)-(r+1,c): id = ((r * W + c) << 1) | 1
static inline int64_t hkey(int r, int c, int W) {
  return ((static_cast<int64_t>(r) * W + c) << 1);
}
static inline int64_t vkey(int r, int c, int W) {
  return ((static_cast<int64_t>(r) * W + c) << 1) | 1;
}

struct Segment {
  int64_t a_key, b_key;
  Pt a, b;
};

// fraction along [v0, v1] where the level crossing sits
static inline double frac(double v0, double v1, double level) {
  double d = v1 - v0;
  if (std::fabs(d) < 1e-30) return 0.5;
  double t = (level - v0) / d;
  if (t < 0.0) t = 0.0;
  if (t > 1.0) t = 1.0;
  return t;
}

}  // namespace

extern "C" {

// Marching squares. Output layout:
//   out_pts:    up to max_pts (y, x) float64 pairs, all contours concatenated
//   out_sizes:  up to max_contours contour lengths
//   out_closed: 1 if the contour is a closed ring
// Returns number of contours (negative on overflow).
int p3_marching_squares(const float* img, int H, int W, float level,
                        double* out_pts, int64_t max_pts, int32_t* out_sizes,
                        uint8_t* out_closed, int32_t max_contours) {
  std::vector<Segment> segs;
  segs.reserve(1024);

  for (int r = 0; r + 1 < H; ++r) {
    for (int c = 0; c + 1 < W; ++c) {
      double tl = img[r * W + c];
      double tr = img[r * W + c + 1];
      double bl = img[(r + 1) * W + c];
      double br = img[(r + 1) * W + c + 1];
      int idx = (tl > level ? 8 : 0) | (tr > level ? 4 : 0) |
                (br > level ? 2 : 0) | (bl > level ? 1 : 0);
      if (idx == 0 || idx == 15) continue;

      // crossing points on the four cell edges
      Pt top{(double)r, c + frac(tl, tr, level)};
      Pt bottom{(double)r + 1, c + frac(bl, br, level)};
      Pt left{r + frac(tl, bl, level), (double)c};
      Pt right{r + frac(tr, br, level), (double)c + 1};
      int64_t kt = hkey(r, c, W), kb = hkey(r + 1, c, W);
      int64_t kl = vkey(r, c, W), kr = vkey(r, c + 1, W);

      // Emit segments oriented so that the high side is to the LEFT of
      // a->b (keeps interiors consistently CCW in image coords).
      auto emit = [&](int64_t ka, const Pt& pa, int64_t kb2, const Pt& pb) {
        segs.push_back({ka, kb2, pa, pb});
      };
      switch (idx) {
        case 1: emit(kl, left, kb, bottom); break;
        case 2: emit(kb, bottom, kr, right); break;
        case 3: emit(kl, left, kr, right); break;
        case 4: emit(kr, right, kt, top); break;
        case 5: {  // saddle: resolve by center mean
          double center = 0.25 * (tl + tr + bl + br);
          if (center > level) {
            emit(kr, right, kb, bottom);
            emit(kl, left, kt, top);
          } else {
            emit(kl, left, kb, bottom);
            emit(kr, right, kt, top);
          }
          break;
        }
        case 6: emit(kb, bottom, kt, top); break;
        case 7: emit(kl, left, kt, top); break;
        case 8: emit(kt, top, kl, left); break;
        case 9: emit(kt, top, kb, bottom); break;
        case 10: {
          double center = 0.25 * (tl + tr + bl + br);
          if (center > level) {
            emit(kt, top, kl, left);
            emit(kb, bottom, kr, right);
          } else {
            emit(kt, top, kr, right);
            emit(kb, bottom, kl, left);
          }
          break;
        }
        case 11: emit(kt, top, kr, right); break;
        case 12: emit(kr, right, kl, left); break;
        case 13: emit(kr, right, kb, bottom); break;
        case 14: emit(kb, bottom, kl, left); break;
      }
    }
  }

  // chain segments: map from start-edge key -> segment index
  std::multimap<int64_t, size_t> by_start;
  for (size_t i = 0; i < segs.size(); ++i) by_start.insert({segs[i].a_key, i});
  std::vector<bool> used(segs.size(), false);

  int n_contours = 0;
  int64_t pt_count = 0;
  for (size_t i0 = 0; i0 < segs.size(); ++i0) {
    if (used[i0]) continue;
    // walk backwards to find a chain start (open contours)
    std::vector<size_t> chain;
    used[i0] = true;
    chain.push_back(i0);
    // forward
    int64_t tail = segs[i0].b_key;
    while (true) {
      auto range = by_start.equal_range(tail);
      size_t nxt = SIZE_MAX;
      for (auto it = range.first; it != range.second; ++it) {
        if (!used[it->second]) {
          nxt = it->second;
          break;
        }
      }
      if (nxt == SIZE_MAX) break;
      used[nxt] = true;
      chain.push_back(nxt);
      tail = segs[nxt].b_key;
      if (tail == segs[i0].a_key) break;  // closed
    }
    bool closed = (tail == segs[i0].a_key);
    if (!closed) {
      // extend backwards: find segments ending at the chain head
      // (build reverse map lazily — open contours are rare: border touches)
      std::multimap<int64_t, size_t> by_end;
      for (size_t i = 0; i < segs.size(); ++i)
        if (!used[i]) by_end.insert({segs[i].b_key, i});
      int64_t head = segs[chain.front()].a_key;
      std::vector<size_t> prefix;
      while (true) {
        auto range = by_end.equal_range(head);
        size_t prv = SIZE_MAX;
        for (auto it = range.first; it != range.second; ++it) {
          if (!used[it->second]) {
            prv = it->second;
            break;
          }
        }
        if (prv == SIZE_MAX) break;
        used[prv] = true;
        prefix.push_back(prv);
        head = segs[prv].a_key;
      }
      chain.insert(chain.begin(), prefix.rbegin(), prefix.rend());
    }

    int32_t n = static_cast<int32_t>(chain.size()) + 1;
    if (n_contours >= max_contours || pt_count + n > max_pts) return -1;
    out_sizes[n_contours] = n;
    out_closed[n_contours] = closed ? 1 : 0;
    // first point of first segment, then end point of each segment
    out_pts[2 * pt_count] = segs[chain[0]].a.y;
    out_pts[2 * pt_count + 1] = segs[chain[0]].a.x;
    ++pt_count;
    for (size_t k = 0; k < chain.size(); ++k) {
      out_pts[2 * pt_count] = segs[chain[k]].b.y;
      out_pts[2 * pt_count + 1] = segs[chain[k]].b.x;
      ++pt_count;
    }
    ++n_contours;
  }
  return n_contours;
}

// Douglas-Peucker simplification of one polyline ((y, x) float64 pairs).
// Writes kept-point indices into out_keep (caller allocates n). Returns count.
int p3_douglas_peucker(const double* pts, int n, double tol, int32_t* out_keep) {
  if (n <= 2) {
    for (int i = 0; i < n; ++i) out_keep[i] = i;
    return n;
  }
  std::vector<char> keep(n, 0);
  keep[0] = keep[n - 1] = 1;
  std::vector<std::pair<int, int>> stack{{0, n - 1}};
  while (!stack.empty()) {
    auto [a, b] = stack.back();
    stack.pop_back();
    if (b <= a + 1) continue;
    double ay = pts[2 * a], ax = pts[2 * a + 1];
    double by = pts[2 * b], bx = pts[2 * b + 1];
    double dy = by - ay, dx = bx - ax;
    double len = std::sqrt(dy * dy + dx * dx);
    double best = -1.0;
    int bi = -1;
    for (int i = a + 1; i < b; ++i) {
      double py = pts[2 * i] - ay, px = pts[2 * i + 1] - ax;
      double d;
      if (len < 1e-12) {
        d = std::sqrt(py * py + px * px);
      } else {
        d = std::fabs(dy / len * px - dx / len * py);
      }
      if (d > best) {
        best = d;
        bi = i;
      }
    }
    if (best > tol) {
      keep[bi] = 1;
      stack.push_back({a, bi});
      stack.push_back({bi, b});
    }
  }
  int m = 0;
  for (int i = 0; i < n; ++i)
    if (keep[i]) out_keep[m++] = i;
  return m;
}

}  // extern "C"
