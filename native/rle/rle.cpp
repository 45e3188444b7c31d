// Run-length-encoded binary mask kernels (COCO RLE layout: column-major
// scan, counts alternate zeros/ones starting with zeros).
//
// TPU-native rebuild of the reference's C mask kernel
// (lib/pycocotools/maskApi.c: rleEncode:32, rleDecode, rleArea, rleIou:77,
// rleToBbox, rleMerge) — written from scratch against the published COCO RLE
// format. These run on the HOST data-pipeline side (seg->bbox at load time,
// SURVEY §2.6); the TPU never sees masks.
//
// Exposed as a C ABI for ctypes (no pybind11 in the image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Encode a column-major HxW uint8 mask. counts_out must hold h*w+1 entries.
// Returns the number of counts written.
int rle_encode(const uint8_t* mask, int h, int w, uint32_t* counts_out) {
  int n = 0;
  uint32_t run = 0;
  uint8_t cur = 0;  // runs start with zeros
  const long total = (long)h * w;
  for (long i = 0; i < total; ++i) {
    uint8_t v = mask[i] ? 1 : 0;
    if (v != cur) {
      counts_out[n++] = run;
      run = 0;
      cur = v;
    }
    ++run;
  }
  counts_out[n++] = run;
  return n;
}

// Decode counts back into a column-major HxW uint8 mask.
void rle_decode(const uint32_t* counts, int n, int h, int w, uint8_t* mask) {
  long pos = 0;
  uint8_t v = 0;
  const long total = (long)h * w;
  for (int i = 0; i < n; ++i) {
    uint32_t run = counts[i];
    for (uint32_t j = 0; j < run && pos < total; ++j) mask[pos++] = v;
    v = !v;
  }
  while (pos < total) mask[pos++] = 0;
}

uint64_t rle_area(const uint32_t* counts, int n) {
  uint64_t a = 0;
  for (int i = 1; i < n; i += 2) a += counts[i];
  return a;
}

// Tight bbox [x, y, w, h] of the mask (pycocotools rleToBbox convention).
void rle_to_bbox(const uint32_t* counts, int n, int h, int w, double* bbox) {
  long xs = w, xe = -1, ys = h, ye = -1;
  long pos = 0;
  uint8_t v = 0;
  for (int i = 0; i < n; ++i) {
    long run = counts[i];
    if (v && run > 0) {
      long start = pos;
      long end = pos + run - 1;
      long x0 = start / h, y0 = start % h;
      long x1 = end / h, y1 = end % h;
      xs = std::min(xs, x0);
      xe = std::max(xe, x1);
      if (x0 < x1) {
        // run spans full columns
        ys = 0;
        ye = h - 1;
      } else {
        ys = std::min(ys, y0);
        ye = std::max(ye, y1);
      }
    }
    pos += run;
    v = !v;
  }
  if (xe < 0) {
    bbox[0] = bbox[1] = bbox[2] = bbox[3] = 0;
    return;
  }
  bbox[0] = (double)xs;
  bbox[1] = (double)ys;
  bbox[2] = (double)(xe - xs + 1);
  bbox[3] = (double)(ye - ys + 1);
}

// Intersection area of two RLEs by run sweeping.
static uint64_t rle_intersect_area(const uint32_t* ca, int na,
                                   const uint32_t* cb, int nb) {
  uint64_t inter = 0;
  long pa = 0, pb = 0;       // absolute positions
  int ia = 0, ib = 0;
  uint8_t va = 0, vb = 0;
  long ea = (na > 0) ? (long)ca[0] : 0;  // end of current run a
  long eb = (nb > 0) ? (long)cb[0] : 0;
  while (ia < na && ib < nb) {
    long lo = std::max(pa, pb);
    long hi = std::min(ea, eb);
    if (hi > lo && va && vb) inter += (uint64_t)(hi - lo);
    if (ea <= eb) {
      pa = ea;
      ++ia;
      if (ia < na) ea += ca[ia];
      va = !va;
    } else {
      pb = eb;
      ++ib;
      if (ib < nb) eb += cb[ib];
      vb = !vb;
    }
  }
  return inter;
}

// IoU between two RLE masks; if is_crowd, uses intersection/area(a) like COCO.
double rle_iou(const uint32_t* ca, int na, const uint32_t* cb, int nb,
               int is_crowd) {
  uint64_t inter = rle_intersect_area(ca, na, cb, nb);
  uint64_t aa = rle_area(ca, na);
  uint64_t ab = rle_area(cb, nb);
  double denom = is_crowd ? (double)aa : (double)(aa + ab - inter);
  if (denom <= 0) return 0.0;
  return (double)inter / denom;
}

// Merge (union or intersection) two RLEs into counts_out; returns count len.
int rle_merge(const uint32_t* ca, int na, const uint32_t* cb, int nb,
              int intersect, uint32_t* counts_out) {
  long pa = 0, pb = 0;
  int ia = 0, ib = 0;
  uint8_t va = 0, vb = 0;
  long ea = (na > 0) ? (long)ca[0] : 0;
  long eb = (nb > 0) ? (long)cb[0] : 0;
  int n = 0;
  uint8_t cur = 0;
  uint32_t run = 0;
  while (ia < na && ib < nb) {
    long hi = std::min(ea, eb);
    long lo = std::max(pa, pb);
    (void)lo;
    long seg_start = std::max(pa, pb);
    long seg_len = hi - seg_start;
    if (seg_len > 0) {
      uint8_t v = intersect ? (va && vb) : (va || vb);
      if (v != cur) {
        counts_out[n++] = run;
        run = 0;
        cur = v;
      }
      run += (uint32_t)seg_len;
    }
    if (ea <= eb) {
      pa = ea;
      ++ia;
      if (ia < na) ea += ca[ia];
      va = !va;
    } else {
      pb = eb;
      ++ib;
      if (ib < nb) eb += cb[ib];
      vb = !vb;
    }
  }
  counts_out[n++] = run;
  return n;
}

}  // extern "C"
