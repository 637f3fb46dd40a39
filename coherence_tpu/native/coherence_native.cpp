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
//   * framebuffer diff — dirty-rect extraction between two RGB buffers.
//
// Exposed with a plain C ABI for ctypes; built by native/build.py.

#include <cstdint>
#include <cstring>
#include <algorithm>

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

}  // extern "C"
