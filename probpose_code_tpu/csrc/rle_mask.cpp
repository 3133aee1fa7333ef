// COCO run-length-encoded (RLE) mask operations — native implementation.
//
// TPU-native counterpart of the xtcocotools C extension the reference wraps
// (``mmpose/evaluation/metrics/_mask.py:3``): column-major RLE encode /
// decode / area / merge / IoU (with crowd semantics) and polygon
// rasterization. Exposed through a C ABI consumed via ctypes
// (probpose_code_tpu/evaluation/functional/mask.py).
//
// Build: g++ -O3 -shared -fPIC rle_mask.cpp -o librle_mask.so

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <cmath>

extern "C" {

// Encode a column-major binary mask (h*w uint8) into RLE counts.
// Returns the number of counts written (caller provides a buffer of
// capacity h*w+1).
int64_t rle_encode(const uint8_t* mask, int64_t h, int64_t w, uint32_t* counts_out) {
    int64_t n = h * w;
    int64_t n_counts = 0;
    uint8_t prev = 0;
    int64_t run = 0;
    for (int64_t i = 0; i < n; ++i) {
        uint8_t v = mask[i] ? 1 : 0;
        if (v != prev) {
            counts_out[n_counts++] = (uint32_t)run;
            run = 0;
            prev = v;
        }
        ++run;
    }
    counts_out[n_counts++] = (uint32_t)run;
    return n_counts;
}

// Decode RLE counts into a column-major binary mask (h*w uint8).
void rle_decode(const uint32_t* counts, int64_t n_counts, int64_t h, int64_t w, uint8_t* mask_out) {
    int64_t pos = 0;
    uint8_t v = 0;
    int64_t n = h * w;
    for (int64_t i = 0; i < n_counts && pos < n; ++i) {
        int64_t run = counts[i];
        if (run > n - pos) run = n - pos;
        std::memset(mask_out + pos, v, (size_t)run);
        pos += run;
        v = 1 - v;
    }
    if (pos < n) std::memset(mask_out + pos, 0, (size_t)(n - pos));
}

// Area (number of foreground pixels) of an RLE.
int64_t rle_area(const uint32_t* counts, int64_t n_counts) {
    int64_t area = 0;
    for (int64_t i = 1; i < n_counts; i += 2) area += counts[i];
    return area;
}

// Intersection area of two RLEs over the same canvas.
static int64_t rle_intersection(const uint32_t* a, int64_t na, const uint32_t* b, int64_t nb) {
    int64_t ia = 0, ib = 0;
    int64_t ca = (na > 0) ? (int64_t)a[0] : 0;
    int64_t cb = (nb > 0) ? (int64_t)b[0] : 0;
    uint8_t va = 0, vb = 0;
    int64_t inter = 0;
    while (ia < na && ib < nb) {
        int64_t step = std::min(ca, cb);
        if (va && vb) inter += step;
        ca -= step;
        cb -= step;
        if (ca == 0) { ++ia; if (ia < na) { ca = a[ia]; va = 1 - va; } }
        if (cb == 0) { ++ib; if (ib < nb) { cb = b[ib]; vb = 1 - vb; } }
    }
    return inter;
}

// IoU between detection RLE (d) and ground-truth RLE (g).
// iscrowd: intersection over detection area (COCO crowd semantics).
double rle_iou(const uint32_t* d, int64_t nd, const uint32_t* g, int64_t ng, int iscrowd) {
    int64_t inter = rle_intersection(d, nd, g, ng);
    int64_t area_d = rle_area(d, nd);
    int64_t area_g = rle_area(g, ng);
    double denom = iscrowd ? (double)area_d : (double)(area_d + area_g - inter);
    if (denom <= 0) return 0.0;
    return (double)inter / denom;
}

// Merge (union or intersection) of two RLEs; returns count length.
int64_t rle_merge(const uint32_t* a, int64_t na, const uint32_t* b, int64_t nb,
                  int intersect, uint32_t* counts_out) {
    int64_t ia = 0, ib = 0;
    int64_t ca = (na > 0) ? (int64_t)a[0] : 0;
    int64_t cb = (nb > 0) ? (int64_t)b[0] : 0;
    uint8_t va = 0, vb = 0;
    int64_t n_out = 0;
    uint8_t prev = 0;
    int64_t run = 0;
    while (ia < na && ib < nb) {
        int64_t step = std::min(ca, cb);
        uint8_t v = intersect ? (va && vb) : (va || vb);
        if (v != prev) {
            counts_out[n_out++] = (uint32_t)run;
            run = 0;
            prev = v;
        }
        run += step;
        ca -= step;
        cb -= step;
        if (ca == 0) { ++ia; if (ia < na) { ca = a[ia]; va = 1 - va; } }
        if (cb == 0) { ++ib; if (ib < nb) { cb = b[ib]; vb = 1 - vb; } }
    }
    counts_out[n_out++] = (uint32_t)run;
    return n_out;
}

// Rasterize a polygon (xy interleaved, n points) into a column-major mask.
// Even-odd scanline fill matching pixel-center sampling.
void poly_to_mask(const double* xy, int64_t n_pts, int64_t h, int64_t w, uint8_t* mask_out) {
    std::memset(mask_out, 0, (size_t)(h * w));
    if (n_pts < 3) return;
    std::vector<double> xs(n_pts), ys(n_pts);
    for (int64_t i = 0; i < n_pts; ++i) { xs[i] = xy[2 * i]; ys[i] = xy[2 * i + 1]; }

    for (int64_t row = 0; row < h; ++row) {
        double yc = (double)row + 0.5;
        std::vector<double> crossings;
        for (int64_t i = 0; i < n_pts; ++i) {
            int64_t j = (i + 1) % n_pts;
            double y0 = ys[i], y1 = ys[j];
            if ((y0 <= yc && y1 > yc) || (y1 <= yc && y0 > yc)) {
                double t = (yc - y0) / (y1 - y0);
                crossings.push_back(xs[i] + t * (xs[j] - xs[i]));
            }
        }
        std::sort(crossings.begin(), crossings.end());
        for (size_t k = 0; k + 1 < crossings.size(); k += 2) {
            int64_t x_start = (int64_t)std::ceil(crossings[k] - 0.5);
            int64_t x_end = (int64_t)std::floor(crossings[k + 1] - 0.5);
            if (x_start < 0) x_start = 0;
            if (x_end >= w) x_end = w - 1;
            for (int64_t x = x_start; x <= x_end; ++x) {
                mask_out[x * h + row] = 1;  // column-major
            }
        }
    }
}

// Bounding box (x, y, w, h) of an RLE.
void rle_to_bbox(const uint32_t* counts, int64_t n_counts, int64_t h, int64_t w, double* bbox_out) {
    int64_t xmin = w, xmax = -1, ymin = h, ymax = -1;
    int64_t pos = 0;
    uint8_t v = 0;
    for (int64_t i = 0; i < n_counts; ++i) {
        int64_t run = counts[i];
        if (v) {
            int64_t start = pos, end = pos + run - 1;
            int64_t x0 = start / h, x1 = end / h;
            if (x0 < xmin) xmin = x0;
            if (x1 > xmax) xmax = x1;
            if (x0 == x1) {
                int64_t y0 = start % h, y1 = end % h;
                if (y0 < ymin) ymin = y0;
                if (y1 > ymax) ymax = y1;
            } else {
                ymin = 0;
                ymax = h - 1;
            }
        }
        pos += run;
        v = 1 - v;
    }
    if (xmax < 0) { bbox_out[0] = bbox_out[1] = bbox_out[2] = bbox_out[3] = 0; return; }
    bbox_out[0] = (double)xmin;
    bbox_out[1] = (double)ymin;
    bbox_out[2] = (double)(xmax - xmin + 1);
    bbox_out[3] = (double)(ymax - ymin + 1);
}

}  // extern "C"
