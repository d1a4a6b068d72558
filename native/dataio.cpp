// Native data-IO kernels for the host-side input pipeline.
//
// The reference's dataloader decode (PIL resize + pandas CSV parse per
// sample, utils/dataloader.py:87-233) is its #3 hot loop (SURVEY.md §3).
// This library provides the CPU-bound pieces as C++ with ctypes bindings
// (achelous_tpu/data/native.py); the Python pipeline falls back to PIL/csv
// when the shared object is absent.
//
// Build: make -C native   (produces native/libdataio.so)
//
// Exposed functions (C ABI):
//   letterbox_bicubic_u8 : aspect-preserving bicubic resize of an RGB u8
//                          image onto a gray-(128) canvas + ImageNet
//                          normalization to f32 (fused, one pass per output
//                          pixel) — replaces PIL resize+paste+numpy norm.
//   letterbox_nearest_u8 : nearest-neighbor letterbox for label masks.
//   parse_radar_csv      : comma-separated float table parser returning the
//                          selected columns — replaces csv.DictReader.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdio>

extern "C" {

// Catmull-Rom cubic kernel (a = -0.5), matching PIL BICUBIC's filter family.
static inline float cubic(float x) {
    const float a = -0.5f;
    x = std::fabs(x);
    if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
    if (x < 2.0f) return ((x - 5.0f) * x + 8.0f) * x * a - 4.0f * a;
    return 0.0f;
}

// Resize src (h_in x w_in x 3, u8) to (nh x nw) with bicubic filtering and
// write it normalized ((v/255 - mean)/std) into dst (h_out x w_out x 3, f32)
// at offset (dy, dx); the rest of dst is pre-filled with the normalized gray
// value. Separable two-pass implementation with PIL-style support scaling
// when downsampling.
void letterbox_bicubic_u8(const uint8_t* src, int h_in, int w_in,
                          float* dst, int h_out, int w_out,
                          int nh, int nw, int dy, int dx) {
    static const float mean[3] = {0.485f, 0.456f, 0.406f};
    static const float stdv[3] = {0.229f, 0.224f, 0.225f};
    // gray 128 canvas, normalized
    for (int c = 0; c < 3; ++c) {
        float g = (128.0f / 255.0f - mean[c]) / stdv[c];
        for (int i = 0; i < h_out * w_out; ++i) dst[i * 3 + c] = g;
    }
    if (nh <= 0 || nw <= 0) return;

    // pass 1: horizontal resize into tmp (h_in x nw x 3)
    float* tmp = new float[(size_t)h_in * nw * 3];
    {
        float scale = (float)w_in / nw;
        float support = std::max(scale, 1.0f) * 2.0f;
        for (int ox = 0; ox < nw; ++ox) {
            float center = (ox + 0.5f) * scale;
            int lo = (int)std::floor(center - support);
            int hi = (int)std::ceil(center + support);
            lo = std::max(lo, 0); hi = std::min(hi, w_in - 1);
            float wsum = 0.0f, wts[64];
            int n = hi - lo + 1;
            if (n > 64) n = 64;
            for (int k = 0; k < n; ++k) {
                float d = (lo + k + 0.5f - center) / std::max(scale, 1.0f);
                wts[k] = cubic(d);
                wsum += wts[k];
            }
            if (wsum == 0.0f) { wts[0] = 1.0f; wsum = 1.0f; n = 1; }
            for (int y = 0; y < h_in; ++y) {
                const uint8_t* row = src + (size_t)y * w_in * 3;
                float acc[3] = {0, 0, 0};
                for (int k = 0; k < n; ++k) {
                    const uint8_t* px = row + (size_t)(lo + k) * 3;
                    float w = wts[k];
                    acc[0] += w * px[0]; acc[1] += w * px[1]; acc[2] += w * px[2];
                }
                float* out = tmp + ((size_t)y * nw + ox) * 3;
                out[0] = acc[0] / wsum; out[1] = acc[1] / wsum; out[2] = acc[2] / wsum;
            }
        }
    }
    // pass 2: vertical resize + normalize into dst window
    {
        float scale = (float)h_in / nh;
        float support = std::max(scale, 1.0f) * 2.0f;
        for (int oy = 0; oy < nh; ++oy) {
            float center = (oy + 0.5f) * scale;
            int lo = (int)std::floor(center - support);
            int hi = (int)std::ceil(center + support);
            lo = std::max(lo, 0); hi = std::min(hi, h_in - 1);
            float wsum = 0.0f, wts[64];
            int n = hi - lo + 1;
            if (n > 64) n = 64;
            for (int k = 0; k < n; ++k) {
                float d = (lo + k + 0.5f - center) / std::max(scale, 1.0f);
                wts[k] = cubic(d);
                wsum += wts[k];
            }
            if (wsum == 0.0f) { wts[0] = 1.0f; wsum = 1.0f; n = 1; }
            for (int ox = 0; ox < nw; ++ox) {
                float acc[3] = {0, 0, 0};
                for (int k = 0; k < n; ++k) {
                    const float* px = tmp + ((size_t)(lo + k) * nw + ox) * 3;
                    float w = wts[k];
                    acc[0] += w * px[0]; acc[1] += w * px[1]; acc[2] += w * px[2];
                }
                float* out = dst + ((size_t)(oy + dy) * w_out + (ox + dx)) * 3;
                for (int c = 0; c < 3; ++c) {
                    float v = std::min(std::max(acc[c] / wsum, 0.0f), 255.0f);
                    out[c] = (v / 255.0f - mean[c]) / stdv[c];
                }
            }
        }
    }
    delete[] tmp;
}

// Nearest-neighbor letterbox for single-channel label masks (clip to
// clip_max, background 0), matching PIL Image.NEAREST + paste semantics.
void letterbox_nearest_u8(const uint8_t* src, int h_in, int w_in,
                          int32_t* dst, int h_out, int w_out,
                          int nh, int nw, int dy, int dx, int clip_max) {
    std::memset(dst, 0, sizeof(int32_t) * (size_t)h_out * w_out);
    for (int oy = 0; oy < nh; ++oy) {
        // PIL NEAREST: src index = floor((oy + 0.5) * h_in / nh)
        int sy = std::min((int)(((float)oy + 0.5f) * h_in / nh), h_in - 1);
        for (int ox = 0; ox < nw; ++ox) {
            int sx = std::min((int)(((float)ox + 0.5f) * w_in / nw), w_in - 1);
            int v = src[(size_t)sy * w_in + sx];
            if (v >= clip_max) v = clip_max;
            dst[(size_t)(oy + dy) * w_out + (ox + dx)] = v;
        }
    }
}

// Parse a CSV of floats with a header line. col_idx lists the indices of the
// wanted columns (n_cols of them); out has room for max_rows * n_cols.
// Returns the number of rows parsed (<= max_rows).
int parse_radar_csv(const char* path, const int32_t* col_idx, int n_cols,
                    float* out, int max_rows) {
    FILE* f = std::fopen(path, "r");
    if (!f) return -1;
    char line[8192];
    if (!std::fgets(line, sizeof line, f)) { std::fclose(f); return 0; }
    int rows = 0;
    int max_col = 0;
    for (int i = 0; i < n_cols; ++i) max_col = std::max(max_col, col_idx[i]);
    float vals[256];
    while (rows < max_rows && std::fgets(line, sizeof line, f)) {
        int col = 0;
        char* p = line;
        while (col <= max_col && col < 256 && *p) {
            vals[col++] = std::strtof(p, &p);
            if (*p == ',') ++p; else break;
        }
        if (col == 0) continue;
        for (int i = 0; i < n_cols; ++i)
            out[(size_t)rows * n_cols + i] =
                col_idx[i] < col ? vals[col_idx[i]] : 0.0f;
        ++rows;
    }
    std::fclose(f);
    return rows;
}

}  // extern "C"
