// Native host runtime for coherence_tpu.
//
// The reference's native inventory (SURVEY.md §2): the GPC polygon clipper
// (only ever fed axis-aligned boxes), wxWidgets, and Unix socket stubs.  The
// TPU build's host-side equivalents that benefit from native code:
//
//   * batch box algebra — per-frame culling of object bounds against dirty
//     regions (1000+-primitive scenes; render.ml:1270-1279 trivial reject);
//   * masked RGB blit — writing rendered sprites into window framebuffers
//     (wxgui.ml:370-424 writepixel loops);
//   * wire frame encoding — RefreshWindow pixel frames for the display
//     protocol (camlpy.ml marshalling of multi-megabyte strings);
//   * framebuffer diff — dirty-rect extraction between two RGB buffers;
//   * bezier subdivision + the scanline sweep — the per-scene-change host
//     geometry stage (polygon.ml:107-127 subdivision, polygon.ml:306-512
//     sweep); pure float64/int64 transcriptions of the NumPy formulations
//     in geometry/path.py and raster/scanline.py, bit-identical by
//     construction (MUST be compiled with -ffp-contract=off: an FMA
//     contraction of a*b+c changes double rounding vs NumPy).
//
// Exposed with a plain C ABI for ctypes; built by native_lib.py.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <array>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Batch box algebra.  Boxes are int32 [x0, y0, x1, y1], inclusive.
// ---------------------------------------------------------------------------

// For each of n boxes, write 1 if it overlaps (qx0,qy0,qx1,qy1), else 0.
// Returns the number of overlapping boxes.
int32_t boxes_overlap_filter(const int32_t* boxes, int32_t n,
                             int32_t qx0, int32_t qy0, int32_t qx1, int32_t qy1,
                             uint8_t* out) {
  int32_t count = 0;
  for (int32_t i = 0; i < n; ++i) {
    const int32_t* b = boxes + 4 * i;
    uint8_t hit = (b[0] <= qx1) & (qx0 <= b[2]) & (b[1] <= qy1) & (qy0 <= b[3]);
    out[i] = hit;
    count += hit;
  }
  return count;
}

// Union of n boxes (n >= 1) into out[4].
void boxes_union_reduce(const int32_t* boxes, int32_t n, int32_t* out) {
  int32_t x0 = boxes[0], y0 = boxes[1], x1 = boxes[2], y1 = boxes[3];
  for (int32_t i = 1; i < n; ++i) {
    const int32_t* b = boxes + 4 * i;
    x0 = std::min(x0, b[0]);
    y0 = std::min(y0, b[1]);
    x1 = std::max(x1, b[2]);
    y1 = std::max(y1, b[3]);
  }
  out[0] = x0; out[1] = y0; out[2] = x1; out[3] = y1;
}

// Pairwise intersection of n boxes with one query box; degenerate results
// are marked empty (out_valid[i] = 0).
void boxes_intersect(const int32_t* boxes, int32_t n,
                     int32_t qx0, int32_t qy0, int32_t qx1, int32_t qy1,
                     int32_t* out, uint8_t* out_valid) {
  for (int32_t i = 0; i < n; ++i) {
    const int32_t* b = boxes + 4 * i;
    int32_t x0 = std::max(b[0], qx0), y0 = std::max(b[1], qy0);
    int32_t x1 = std::min(b[2], qx1), y1 = std::min(b[3], qy1);
    out[4 * i] = x0; out[4 * i + 1] = y0; out[4 * i + 2] = x1; out[4 * i + 3] = y1;
    out_valid[i] = (x0 <= x1) & (y0 <= y1);
  }
}

// ---------------------------------------------------------------------------
// Masked RGB blit: fb (H, W, 3) u8; src rgba (h, w, 4) int32 premultiplied;
// mask (h, w) u8.  Writes src rgb where mask, at (ox, oy), clipped.
// ---------------------------------------------------------------------------

void blit_masked_rgb(uint8_t* fb, int32_t FH, int32_t FW,
                     const int32_t* rgba, const uint8_t* mask,
                     int32_t h, int32_t w, int32_t oy, int32_t ox) {
  int32_t y_lo = std::max(0, -oy), y_hi = std::min(h, FH - oy);
  int32_t x_lo = std::max(0, -ox), x_hi = std::min(w, FW - ox);
  for (int32_t y = y_lo; y < y_hi; ++y) {
    uint8_t* frow = fb + ((oy + y) * FW + ox) * 3;
    const int32_t* srow = rgba + (y * w) * 4;
    const uint8_t* mrow = mask + y * w;
    for (int32_t x = x_lo; x < x_hi; ++x) {
      if (mrow[x]) {
        frow[x * 3] = (uint8_t)srow[x * 4];
        frow[x * 3 + 1] = (uint8_t)srow[x * 4 + 1];
        frow[x * 3 + 2] = (uint8_t)srow[x * 4 + 2];
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Wire frame encoding for RefreshWindow (camlpy.ml format):
// frame = BE32 total | tag_tuple(0) BE32 len | [String name] [Int window]
//         [Int x] [Int y] [Int w] [Int h] [String pixels].
// Copies the pixel rect out of the framebuffer directly into the frame.
// Returns total frame size written to out (caller sizes: 64 + w*h*3).
// ---------------------------------------------------------------------------

static void put_be32(uint8_t* p, uint32_t v) {
  p[0] = (uint8_t)(v >> 24); p[1] = (uint8_t)(v >> 16);
  p[2] = (uint8_t)(v >> 8); p[3] = (uint8_t)v;
}

int64_t encode_refresh_frame(const uint8_t* fb, int32_t FH, int32_t FW,
                             int32_t window, int32_t x, int32_t y,
                             int32_t w, int32_t h, uint8_t* out) {
  static const char name[] = "RefreshWindow";
  const uint32_t name_len = sizeof(name) - 1;
  const uint32_t pix_len = (uint32_t)(w * h * 3);
  const uint32_t tuple_len = (1 + 4 + name_len) + 5 * (1 + 4) + (1 + 4 + pix_len);
  const uint32_t total = 1 + 4 + tuple_len;
  uint8_t* p = out;
  put_be32(p, total); p += 4;
  *p++ = 0; /* tag_tuple */ put_be32(p, tuple_len); p += 4;
  *p++ = 3; /* tag_string */ put_be32(p, name_len); p += 4;
  std::memcpy(p, name, name_len); p += name_len;
  const int32_t ints[5] = {window, x, y, w, h};
  for (int k = 0; k < 5; ++k) {
    *p++ = 2; /* tag_int */ put_be32(p, (uint32_t)ints[k]); p += 4;
  }
  *p++ = 3; put_be32(p, pix_len); p += 4;
  for (int32_t row = 0; row < h; ++row) {
    std::memcpy(p, fb + ((y + row) * FW + x) * 3, (size_t)w * 3);
    p += (size_t)w * 3;
  }
  return (int64_t)(p - out);
}

// ---------------------------------------------------------------------------
// Framebuffer diff: tight bounding box of differing pixels between two
// (H, W, 3) u8 buffers.  Returns 1 and writes [x0, y0, x1, y1] if any
// difference, else 0.
// ---------------------------------------------------------------------------

int32_t fb_diff_bbox(const uint8_t* a, const uint8_t* b,
                     int32_t H, int32_t W, int32_t* out) {
  int32_t x0 = W, y0 = H, x1 = -1, y1 = -1;
  const size_t rowbytes = (size_t)W * 3;
  for (int32_t yy = 0; yy < H; ++yy) {
    const uint8_t* ra = a + yy * rowbytes;
    const uint8_t* rb = b + yy * rowbytes;
    if (std::memcmp(ra, rb, rowbytes) == 0) continue;
    y0 = std::min(y0, yy); y1 = yy;
    int32_t xx = 0;
    while (xx < W && ra[xx * 3] == rb[xx * 3] && ra[xx * 3 + 1] == rb[xx * 3 + 1] &&
           ra[xx * 3 + 2] == rb[xx * 3 + 2]) ++xx;
    x0 = std::min(x0, xx);
    int32_t xe = W - 1;
    while (xe >= 0 && ra[xe * 3] == rb[xe * 3] && ra[xe * 3 + 1] == rb[xe * 3 + 1] &&
           ra[xe * 3 + 2] == rb[xe * 3 + 2]) --xe;
    x1 = std::max(x1, xe);
  }
  if (y1 < 0) return 0;
  out[0] = x0; out[1] = y0; out[2] = x1; out[3] = y1;
  return 1;
}

// ---------------------------------------------------------------------------
// Bezier subdivision (geometry/path.py bezier_subdivide; polygon.ml:107-127).
// ctrl: (n, 8) float64 control points [x1 y1 x2 y2 x3 y3 x4 y4]; out:
// (cap, 4) float64 chords [ax ay bx by] in DFS left-to-right order; counts:
// (n,) chords per bezier.  Returns the TOTAL chord count — callers re-call
// with a larger `out` when it exceeds cap (only the first cap chords are
// written).  Float semantics match CPython exactly: ** 2 is pow (correctly
// rounded on glibc), midpoints are (a + b) / 2, the flatness predicate
// treats nan/inf/zero/subnormal distances as flat.
// ---------------------------------------------------------------------------

static inline double dist_point_line(double cx, double cy, double ax, double ay,
                                     double bx, double by) {
  double l = std::sqrt(std::pow(bx - ax, 2.0) + std::pow(by - ay, 2.0));
  if (l == 0.0 || !std::isfinite(l)) return NAN;
  double s = ((ay - cy) * (bx - ax) - (ax - cx) * (by - ay)) / (l * l);
  return std::fabs(s) * l;
}

static inline bool dist_normal(double d) {
  return std::isfinite(d) && d != 0.0 && std::fabs(d) >= 2.2250738585072014e-308;
}

int64_t bezier_subdivide_batch(const double* ctrl, int64_t n, double eps,
                               double* out, int64_t cap, int64_t* counts) {
  std::vector<std::array<double, 8>> stack;
  int64_t total = 0;
  for (int64_t i = 0; i < n; ++i) {
    const double* c = ctrl + 8 * i;
    int64_t cnt = 0;
    stack.clear();
    stack.push_back({c[0], c[1], c[2], c[3], c[4], c[5], c[6], c[7]});
    while (!stack.empty()) {
      std::array<double, 8> q = stack.back();
      stack.pop_back();
      double ax = q[0], ay = q[1], bx = q[2], by = q[3];
      double cx = q[4], cy = q[5], dx = q[6], dy = q[7];
      double d1 = dist_point_line(bx, by, ax, ay, dx, dy);
      double d2 = dist_point_line(cx, cy, ax, ay, dx, dy);
      bool flat = (dist_normal(d1) && dist_normal(d2)) ? (d1 < eps && d2 < eps)
                                                       : true;
      if (flat) {
        if (total < cap) {
          out[4 * total] = ax;
          out[4 * total + 1] = ay;
          out[4 * total + 2] = dx;
          out[4 * total + 3] = dy;
        }
        ++total;
        ++cnt;
      } else {
        double l2x = (ax + bx) / 2.0, l2y = (ay + by) / 2.0;
        double hx = (bx + cx) / 2.0, hy = (by + cy) / 2.0;
        double l3x = (l2x + hx) / 2.0, l3y = (l2y + hy) / 2.0;
        double r3x = (cx + dx) / 2.0, r3y = (cy + dy) / 2.0;
        double r2x = (hx + r3x) / 2.0, r2y = (hy + r3y) / 2.0;
        double l4x = (l3x + r2x) / 2.0, l4y = (l3y + r2y) / 2.0;
        // Right pushed first so the left half pops first (in-order chords).
        stack.push_back({l4x, l4y, r2x, r2y, r3x, r3y, dx, dy});
        stack.push_back({ax, ay, l2x, l2y, l3x, l3y, l4x, l4y});
      }
    }
    counts[i] = cnt;
  }
  return total;
}

// ---------------------------------------------------------------------------
// Scanline sweep (raster/scanline.py _edge_spans; polygon.ml:306-512).
// Edges are (n, 4) int64 subbin [x0, y0, x1, y1]; pixel row y covers
// subbins [32y-47 .. 32y+16].  Two-call protocol: edge_spans_count returns
// the exact coverage-span count T (one span per active (edge, row) pair
// after the row clip); edge_spans_fill writes the coverage spans (cov_*,
// capacity T) and the winding crossing spans (cross_*, capacity 2T is
// always sufficient: each family emits < its crossing count <= T), in the
// EXACT array order of the NumPy formulation (edge-major coverage; top
// crossings sorted by (row, x) stable then bottom ones).
// ---------------------------------------------------------------------------

static inline int64_t floordiv64(int64_t a, int64_t b) {
  int64_t q = a / b, r = a % b;
  return (r != 0 && ((r < 0) != (b < 0))) ? q - 1 : q;
}

// Pixel bin of subbin n: trunc-toward-zero of (n + 31) / 32 (coord.ml:44).
static inline int64_t pix_of_sub64(int64_t nn) { return (nn + 31) / 32; }

int64_t edge_spans_count(const int64_t* edges, int64_t n,
                         int64_t clip_lo, int64_t clip_hi) {
  int64_t T = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t ey0 = edges[4 * i + 1], ey1 = edges[4 * i + 3];
    int64_t ymin = std::min(ey0, ey1), ymax = std::max(ey0, ey1);
    int64_t ylo = std::max(-floordiv64(-(ymin - 16), 32), clip_lo);
    int64_t yhi = std::min(floordiv64(ymax + 47, 32), clip_hi);
    if (yhi >= ylo) T += yhi - ylo + 1;
  }
  return T;
}

struct CrossPt {
  int64_t r, x;
  int32_t d;
};

static int64_t emit_crossing_spans(std::vector<CrossPt>& v, int32_t nonzero,
                                   int64_t ext, int64_t* rows, int64_t* s,
                                   int64_t* e, int64_t off) {
  std::stable_sort(v.begin(), v.end(), [](const CrossPt& a, const CrossPt& b) {
    return a.r != b.r ? a.r < b.r : a.x < b.x;
  });
  int64_t m = 0, wind = 0, idx_in_row = 0;
  for (size_t i = 0; i < v.size(); ++i) {
    if (i == 0 || v[i].r != v[i - 1].r) {
      wind = 0;
      idx_in_row = 0;
    }
    wind += v[i].d;
    bool same_next = (i + 1 < v.size()) && v[i + 1].r == v[i].r;
    bool emit = nonzero ? (same_next && wind != 0)
                        : (same_next && (idx_in_row % 2 == 0));
    if (emit) {
      rows[off + m] = v[i].r;
      s[off + m] = pix_of_sub64(v[i].x - ext);
      e[off + m] = pix_of_sub64(v[i + 1].x + ext);
      ++m;
    }
    ++idx_in_row;
  }
  return m;
}

void edge_spans_fill(const int64_t* edges, int64_t n, int32_t nonzero,
                     int64_t crossing_ext, int64_t clip_lo, int64_t clip_hi,
                     int64_t* cov_rows, int64_t* cov_s, int64_t* cov_e,
                     int64_t* cross_rows, int64_t* cross_s, int64_t* cross_e,
                     int64_t* out_counts) {
  std::vector<CrossPt> tops, bots;
  int64_t ncov = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t ex0 = edges[4 * i], ey0 = edges[4 * i + 1];
    int64_t ex1 = edges[4 * i + 2], ey1 = edges[4 * i + 3];
    int64_t ymin = std::min(ey0, ey1), ymax = std::max(ey0, ey1);
    bool up = ey1 > ey0, down = ey0 > ey1;
    int64_t x0in = down ? ex1 : (up ? ex0 : std::min(ex0, ex1));
    int64_t x1in = down ? ex0 : (up ? ex1 : std::max(ex0, ex1));
    int32_t dir = up ? 1 : -1;
    double denom = (double)(ymax - ymin);
    double grad = denom == 0.0 ? 0.0 : (double)(x1in - x0in) / denom;
    int64_t ylo = std::max(-floordiv64(-(ymin - 16), 32), clip_lo);
    int64_t yhi = std::min(floordiv64(ymax + 47, 32), clip_hi);
    for (int64_t row = ylo; row <= yhi; ++row) {
      int64_t top = 32 * row - 47;
      int64_t bot = top + 63;
      bool has_top = ymin < top;
      bool has_bot = ymax > bot;
      int64_t x_t = 0, x_b = 0;
      if (has_top) {
        x_t = (int64_t)std::trunc(
            (double)x0in + grad * ((double)(top - 1 - ymin) + 0.25) + 0.5);
        tops.push_back({row, x_t, dir});
      }
      if (has_bot) {
        // Top-and-bottom clipped edges compound the already-rounded top
        // crossing (polygon.ml:365-385); (2*32 - 1) + 0.25 == 63.25.
        x_b = has_top
                  ? (int64_t)std::trunc((double)x_t + grad * 63.25 + 0.5)
                  : (int64_t)std::trunc(
                        (double)x0in + grad * ((double)(bot - ymin) + 0.25) + 0.5);
        bots.push_back({row, x_b, dir});
      }
      int64_t a = has_top ? x_t : x0in;
      int64_t b = has_bot ? x_b : x1in;
      cov_rows[ncov] = row;
      cov_s[ncov] = pix_of_sub64(std::min(a, b) - 16);
      cov_e[ncov] = pix_of_sub64(std::max(a, b) + 16);
      ++ncov;
    }
  }
  int64_t m = emit_crossing_spans(tops, nonzero, crossing_ext, cross_rows,
                                  cross_s, cross_e, 0);
  m += emit_crossing_spans(bots, nonzero, crossing_ext, cross_rows, cross_s,
                           cross_e, m);
  out_counts[0] = ncov;
  out_counts[1] = m;
}

// ---------------------------------------------------------------------------
// Tile assignment of pixel spans (raster/tile_raster._expand_1x/_expand_aa
// + _group_slices), fused: expand each span to the tiles it overlaps and
// bucket-sort the expansions by tile id STABLY (the per-tile entry order
// matches NumPy's stable argsort of the expansion order, so staged span
// arrays are bit-identical).  Two-call protocol: *_count returns the total
// expansion count; *_grouped fills caller buffers of that capacity plus a
// (n_tiles, 3) group table [tile, lo, hi] and returns the group count.
// ---------------------------------------------------------------------------

int64_t expand_1x_count(const int64_t* rows, const int64_t* ss,
                        const int64_t* ee, int64_t T, int64_t nty,
                        int64_t ntx, int64_t tile_h, int64_t tile_w) {
  int64_t total = 0;
  for (int64_t i = 0; i < T; ++i) {
    int64_t band = floordiv64(rows[i] - 1, tile_h);
    if (band < 0 || band >= nty || ee[i] < 1) continue;
    int64_t lo = std::max(floordiv64(ss[i] - 1, tile_w), (int64_t)0);
    int64_t hi = std::min(floordiv64(ee[i] - 1, tile_w), ntx - 1);
    if (hi >= lo) total += hi - lo + 1;
  }
  return total;
}

int64_t expand_1x_grouped(const int64_t* rows, const int64_t* ss,
                          const int64_t* ee, int64_t T, int64_t nty,
                          int64_t ntx, int64_t tile_h, int64_t tile_w,
                          int64_t* out_r, int64_t* out_s, int64_t* out_e,
                          int64_t* groups, int64_t* n_groups) {
  const int64_t n_tiles = nty * ntx;
  std::vector<int64_t> counts((size_t)n_tiles, 0);
  for (int64_t i = 0; i < T; ++i) {
    int64_t band = floordiv64(rows[i] - 1, tile_h);
    if (band < 0 || band >= nty || ee[i] < 1) continue;
    int64_t lo = std::max(floordiv64(ss[i] - 1, tile_w), (int64_t)0);
    int64_t hi = std::min(floordiv64(ee[i] - 1, tile_w), ntx - 1);
    for (int64_t tx = lo; tx <= hi; ++tx) ++counts[(size_t)(band * ntx + tx)];
  }
  std::vector<int64_t> offs((size_t)n_tiles, 0);
  int64_t total = 0, ng = 0;
  for (int64_t t = 0; t < n_tiles; ++t) {
    offs[(size_t)t] = total;
    if (counts[(size_t)t]) {
      groups[3 * ng] = t;
      groups[3 * ng + 1] = total;
      groups[3 * ng + 2] = total + counts[(size_t)t];
      ++ng;
    }
    total += counts[(size_t)t];
  }
  for (int64_t i = 0; i < T; ++i) {
    int64_t band = floordiv64(rows[i] - 1, tile_h);
    if (band < 0 || band >= nty || ee[i] < 1) continue;
    int64_t lo = std::max(floordiv64(ss[i] - 1, tile_w), (int64_t)0);
    int64_t hi = std::min(floordiv64(ee[i] - 1, tile_w), ntx - 1);
    int64_t r_rel = rows[i] - (band * tile_h + 1);
    for (int64_t tx = lo; tx <= hi; ++tx) {
      int64_t col0 = tx * tile_w + 1;
      int64_t& o = offs[(size_t)(band * ntx + tx)];
      out_r[o] = r_rel;
      out_s[o] = std::max(ss[i] - col0, (int64_t)0);
      out_e[o] = std::min(ee[i] - col0, tile_w - 1);
      ++o;
    }
  }
  *n_groups = ng;
  return total;
}

// AA expansion: scaled spans to edge-tile t-plane windows (rows
// [hstep*ty - hpad, hstep*ty + hstep - 1], cols [wstep*tx - hpad,
// wstep*tx + wstep - 1]); candidate bands cand = 0 then 1, matching the
// NumPy concatenation order.  edge_tiles: (nty*ntx,) u8 filter.
static inline bool aa_row_tile(int64_t row, int64_t cand, int64_t nty,
                               int64_t hstep, int64_t hpad, int64_t* ty) {
  int64_t t = floordiv64(row + hpad, hstep) - cand;
  *ty = t;
  return t >= 0 && t < nty && hstep * t - hpad <= row &&
         row <= hstep * t + hstep - 1;
}

int64_t expand_aa_count(const int64_t* rows, const int64_t* ss,
                        const int64_t* ee, int64_t T, int64_t nty,
                        int64_t ntx, int64_t hstep, int64_t wstep,
                        int64_t hpad, const uint8_t* edge_tiles) {
  int64_t total = 0;
  for (int64_t cand = 0; cand < 2; ++cand) {
    for (int64_t i = 0; i < T; ++i) {
      int64_t ty;
      if (!aa_row_tile(rows[i], cand, nty, hstep, hpad, &ty)) continue;
      int64_t lo = std::max(-floordiv64(-(ss[i] - (wstep - 1)), wstep),
                            (int64_t)0);
      int64_t hi = std::min(floordiv64(ee[i] + hpad, wstep), ntx - 1);
      for (int64_t tx = lo; tx <= hi; ++tx)
        if (edge_tiles[ty * ntx + tx]) ++total;
    }
  }
  return total;
}

int64_t expand_aa_grouped(const int64_t* rows, const int64_t* ss,
                          const int64_t* ee, int64_t T, int64_t nty,
                          int64_t ntx, int64_t hstep, int64_t wstep,
                          int64_t hpad, int64_t ttw, const uint8_t* edge_tiles,
                          int64_t* out_r, int64_t* out_s, int64_t* out_e,
                          int64_t* groups, int64_t* n_groups) {
  const int64_t n_tiles = nty * ntx;
  std::vector<int64_t> counts((size_t)n_tiles, 0);
  for (int64_t cand = 0; cand < 2; ++cand) {
    for (int64_t i = 0; i < T; ++i) {
      int64_t ty;
      if (!aa_row_tile(rows[i], cand, nty, hstep, hpad, &ty)) continue;
      int64_t lo = std::max(-floordiv64(-(ss[i] - (wstep - 1)), wstep),
                            (int64_t)0);
      int64_t hi = std::min(floordiv64(ee[i] + hpad, wstep), ntx - 1);
      for (int64_t tx = lo; tx <= hi; ++tx)
        if (edge_tiles[ty * ntx + tx]) ++counts[(size_t)(ty * ntx + tx)];
    }
  }
  std::vector<int64_t> offs((size_t)n_tiles, 0);
  int64_t total = 0, ng = 0;
  for (int64_t t = 0; t < n_tiles; ++t) {
    offs[(size_t)t] = total;
    if (counts[(size_t)t]) {
      groups[3 * ng] = t;
      groups[3 * ng + 1] = total;
      groups[3 * ng + 2] = total + counts[(size_t)t];
      ++ng;
    }
    total += counts[(size_t)t];
  }
  for (int64_t cand = 0; cand < 2; ++cand) {
    for (int64_t i = 0; i < T; ++i) {
      int64_t ty;
      if (!aa_row_tile(rows[i], cand, nty, hstep, hpad, &ty)) continue;
      int64_t lo = std::max(-floordiv64(-(ss[i] - (wstep - 1)), wstep),
                            (int64_t)0);
      int64_t hi = std::min(floordiv64(ee[i] + hpad, wstep), ntx - 1);
      int64_t tr0 = hstep * ty - hpad;
      for (int64_t tx = lo; tx <= hi; ++tx) {
        if (!edge_tiles[ty * ntx + tx]) continue;
        int64_t tc0 = wstep * tx - hpad;
        int64_t& o = offs[(size_t)(ty * ntx + tx)];
        out_r[o] = rows[i] - tr0;
        out_s[o] = std::min(std::max(ss[i] - tc0, (int64_t)0), ttw - 1);
        out_e[o] = std::min(std::max(ee[i] - tc0, (int64_t)0), ttw - 1);
        ++o;
      }
    }
  }
  *n_groups = ng;
  return total;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// JBIG2 generic-region decoding (T.88 Annex E MQ decoder + 6.2.5.7).
// The per-pixel sequential arithmetic decode of scanned pages (megapixels)
// is JBIG2's one hot loop; this is a transcription of io/jbig2.py's
// MQDecoder/decode_generic (kept bit-identical — tests/test_jbig2.py fuzzes
// native vs Python).  Standalone regions only: symbol dictionaries share MQ
// state across symbols and stay in Python (their bitmaps are tiny).
// ---------------------------------------------------------------------------

namespace {

struct MQQe { uint16_t qe; uint8_t nmps, nlps, sw; };
static const MQQe kQe[47] = {
  {0x5601,1,1,1},{0x3401,2,6,0},{0x1801,3,9,0},{0x0AC1,4,12,0},
  {0x0521,5,29,0},{0x0221,38,33,0},{0x5601,7,6,1},{0x5401,8,14,0},
  {0x4801,9,14,0},{0x3801,10,14,0},{0x3001,11,17,0},{0x2401,12,18,0},
  {0x1C01,13,20,0},{0x1601,29,21,0},{0x5601,15,14,1},{0x5401,16,14,0},
  {0x5101,17,15,0},{0x4801,18,16,0},{0x3801,19,17,0},{0x3401,20,18,0},
  {0x3001,21,19,0},{0x2801,22,19,0},{0x2401,23,20,0},{0x2201,24,21,0},
  {0x1C01,25,22,0},{0x1801,26,23,0},{0x1601,27,24,0},{0x1401,28,25,0},
  {0x1201,29,26,0},{0x1101,30,27,0},{0x0AC1,31,28,0},{0x09C1,32,29,0},
  {0x08A1,33,30,0},{0x0521,34,31,0},{0x0441,35,32,0},{0x02A1,36,33,0},
  {0x0221,37,34,0},{0x0141,38,35,0},{0x0111,39,36,0},{0x0085,40,37,0},
  {0x0049,41,38,0},{0x0025,42,39,0},{0x0015,43,40,0},{0x0009,44,41,0},
  {0x0005,45,42,0},{0x0001,45,43,0},{0x5601,46,46,0},
};

struct MQDec {
  const uint8_t* data;
  int64_t len, bp;
  uint32_t c, a;
  int32_t ct;

  void bytein() {
    uint8_t b = bp < len ? data[bp] : 0xFF;
    if (b == 0xFF) {
      uint8_t b1 = bp + 1 < len ? data[bp + 1] : 0xFF;
      if (b1 > 0x8F) { c += 0xFF00; ct = 8; }
      else { ++bp; c += (uint32_t)b1 << 9; ct = 7; }
    } else {
      ++bp;
      uint8_t b1 = bp < len ? data[bp] : 0xFF;
      c += (uint32_t)b1 << 8; ct = 8;
    }
  }

  void init(const uint8_t* d, int64_t n) {
    data = d; len = n; bp = 0;
    c = (uint32_t)(n > 0 ? d[0] : 0xFF) << 16;
    bytein();
    c <<= 7; ct -= 7; a = 0x8000;
  }

  int decode(uint8_t* cx_i, uint8_t* cx_mps, uint32_t label) {
    uint8_t i = cx_i[label], mps = cx_mps[label];
    const MQQe& q = kQe[i];
    int d;
    a -= q.qe;
    if (((c >> 16) & 0xFFFF) < q.qe) {
      if (a < q.qe) { d = mps; cx_i[label] = q.nmps; }
      else {
        d = 1 - mps;
        if (q.sw) cx_mps[label] = 1 - mps;
        cx_i[label] = q.nlps;
      }
      a = q.qe;
    } else {
      c -= (uint32_t)q.qe << 16;
      if (a & 0x8000) return mps;
      if (a < q.qe) {
        d = 1 - mps;
        if (q.sw) cx_mps[label] = 1 - mps;
        cx_i[label] = q.nlps;
      } else { d = mps; cx_i[label] = q.nmps; }
    }
    do {
      if (ct == 0) bytein();
      a <<= 1; c <<= 1; --ct;
    } while (!(a & 0x8000));
    a &= 0xFFFF;
    return d;
  }
};

static const int8_t kGenTemplates[4][12][2] = {
  {{-1,-2},{0,-2},{1,-2},{-2,-1},{-1,-1},{0,-1},{1,-1},{2,-1},{-4,0},{-3,0},{-2,0},{-1,0}},
  {{-1,-2},{0,-2},{1,-2},{2,-2},{-2,-1},{-1,-1},{0,-1},{1,-1},{2,-1},{-3,0},{-2,0},{-1,0}},
  {{-1,-2},{0,-2},{1,-2},{-2,-1},{-1,-1},{0,-1},{1,-1},{-2,0},{-1,0},{0,0},{0,0},{0,0}},
  {{-3,-1},{-2,-1},{-1,-1},{0,-1},{1,-1},{-4,0},{-3,0},{-2,0},{-1,0},{0,0},{0,0},{0,0}},
};
static const int kGenTemplateN[4] = {12, 12, 9, 9};
static const uint32_t kTpgdCtx[4] = {0x9B25, 0x0795, 0x00E5, 0x0195};

}  // namespace

extern "C" {

// Decode one arithmetic generic region from fresh MQ/context state.
// at: atn pairs of (dx, dy) int8.  out: h*w bytes (0/1).  Returns 0 on
// success, negative on bad arguments.
int32_t jbig2_generic_region(const uint8_t* data, int64_t len,
                             int32_t w, int32_t h, int32_t tmpl,
                             const int8_t* at, int32_t atn,
                             int32_t tpgdon, uint8_t* out) {
  if (tmpl < 0 || tmpl > 3 || w <= 0 || h <= 0 || atn < 0 || atn > 4)
    return -1;
  // Assemble template + AT pixels and sort by (dy, dx) — the context order
  // of io/jbig2.py:_context_pixels.
  int n = kGenTemplateN[tmpl];
  std::array<std::array<int, 2>, 16> pts{};
  for (int k = 0; k < n; ++k) {
    pts[(size_t)k][0] = kGenTemplates[tmpl][k][0];
    pts[(size_t)k][1] = kGenTemplates[tmpl][k][1];
  }
  for (int k = 0; k < atn; ++k) {
    pts[(size_t)(n + k)][0] = at[2 * k];
    pts[(size_t)(n + k)][1] = at[2 * k + 1];
  }
  n += atn;
  std::sort(pts.begin(), pts.begin() + n,
            [](const std::array<int, 2>& p, const std::array<int, 2>& q) {
              return p[1] != q[1] ? p[1] < q[1] : p[0] < q[0];
            });
  std::vector<uint8_t> cx_i((size_t)1 << 16, 0), cx_mps((size_t)1 << 16, 0);
  MQDec mq;
  mq.init(data, len);
  std::memset(out, 0, (size_t)w * (size_t)h);
  int ltp = 0;
  for (int32_t y = 0; y < h; ++y) {
    if (tpgdon) {
      if (mq.decode(cx_i.data(), cx_mps.data(), kTpgdCtx[tmpl])) ltp ^= 1;
      if (ltp) {
        if (y > 0)
          std::memcpy(out + (size_t)y * w, out + (size_t)(y - 1) * w, (size_t)w);
        continue;
      }
    }
    for (int32_t x = 0; x < w; ++x) {
      uint32_t ctxv = 0;
      for (int k = 0; k < n; ++k) {
        int xx = x + pts[(size_t)k][0], yy = y + pts[(size_t)k][1];
        uint32_t bit = 0;
        if (yy >= 0 && yy < h && xx >= 0 && xx < w &&
            (yy < y || (yy == y && xx < x)))
          bit = out[(size_t)yy * w + xx];
        ctxv = (ctxv << 1) | bit;
      }
      out[(size_t)y * w + x] =
          (uint8_t)mq.decode(cx_i.data(), cx_mps.data(), ctxv);
    }
  }
  return 0;
}

}  // extern "C"
