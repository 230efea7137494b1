// Fused host-side image ops for the data pipeline.
//
// The per-sample hot path (affine warp -> BGR->RGB -> ImageNet
// normalize, plus the mask->segmentation decode) is fused into single
// C++ passes to cut the Python/numpy dispatch overhead of the training
// input pipeline. Exposed through a C ABI consumed via ctypes
// (dir_tpu/data/native.py); every entry point has a numpy fallback so
// the framework runs without the compiled library.
//
// Build: make -C native   (produces libimageops.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Bilinear affine warp matching cv2.warpAffine(flags=INTER_LINEAR) on
// this OpenCV build (5.x float HAL path: float32 source coordinates,
// float32 tap weights, round-half-even output quantization). The
// production aug path (utils/utils.py:405-441, data_augmentation_3D)
// uses the DEFAULT border: BORDER_CONSTANT value 0 (border=0 here);
// border=1 gives BORDER_REPLICATE (the reference's other, unused warp,
// utils/utils.py:357-364). Parity asserted in
// tests/test_native.py::test_affine_warp_parity.
// src: HxWx3 uint8, dst: OHxOWx3 uint8, m: 2x3 row-major FORWARD
// matrix (dst = M src); the inverse map is computed internally, as
// cv2.warpAffine does.
void affine_warp_u8(const uint8_t* src, int h, int w,
                    uint8_t* dst, int oh, int ow,
                    const float* m /* 2x3 forward */, int border) {
    // invert the 2x3 affine in double, like cv::invertAffineTransform
    double a = m[0], b = m[1], c = m[2];
    double d = m[3], e = m[4], f = m[5];
    double det = a * e - b * d;
    det = det != 0.0 ? 1.0 / det : 0.0;
    double ia = e * det, ib = -b * det;
    double id = -d * det, ie = a * det;
    double ic = -(ia * c + ib * f);
    double if_ = -(id * c + ie * f);

    static const uint8_t zero3[3] = {0, 0, 0};
    for (int y = 0; y < oh; ++y) {
        double sx_row = ib * y + ic;
        double sy_row = ie * y + if_;

        // General (border-aware) path for one output pixel.
        auto border_px = [&](int px) {
            float sx = (float)(ia * px + sx_row);
            float sy = (float)(id * px + sy_row);
            int x0 = (int)std::floor(sx);
            int y0 = (int)std::floor(sy);
            float fx = sx - (float)x0;
            float fy = sy - (float)y0;
            uint8_t* out = dst + (y * ow + px) * 3;
            const uint8_t* tap[4];
            for (int ky = 0; ky < 2; ++ky) {
                for (int kx = 0; kx < 2; ++kx) {
                    int tx = x0 + kx, ty = y0 + ky;
                    if (0 <= tx && tx < w && 0 <= ty && ty < h) {
                        tap[ky * 2 + kx] = src + (ty * w + tx) * 3;
                    } else if (border == 1) {  // BORDER_REPLICATE
                        int cx = std::min(std::max(tx, 0), w - 1);
                        int cy = std::min(std::max(ty, 0), h - 1);
                        tap[ky * 2 + kx] = src + (cy * w + cx) * 3;
                    } else {  // BORDER_CONSTANT value 0
                        tap[ky * 2 + kx] = zero3;
                    }
                }
            }
            float w00 = (1.0f - fy) * (1.0f - fx);
            float w01 = (1.0f - fy) * fx;
            float w10 = fy * (1.0f - fx);
            float w11 = fy * fx;
            for (int ch = 0; ch < 3; ++ch) {
                float v = w00 * tap[0][ch] + w01 * tap[1][ch] +
                          w10 * tap[2][ch] + w11 * tap[3][ch];
                int r = (int)std::lrintf(v);
                out[ch] = (uint8_t)std::min(std::max(r, 0), 255);
            }
        };

        // Interior span: x range where the whole 2x2 tap window is in
        // bounds -> branch-free inner loop (the border path is ~3x
        // slower per pixel).
        double lo = 0.0, hi = (double)ow - 1;
        auto constrain = [&](double coef, double off, double vmin,
                             double vmax) {
            // keep vmin <= coef*x + off <= vmax
            if (coef > 1e-12) {
                lo = std::max(lo, (vmin - off) / coef);
                hi = std::min(hi, (vmax - off) / coef);
            } else if (coef < -1e-12) {
                lo = std::max(lo, (vmax - off) / coef);
                hi = std::min(hi, (vmin - off) / coef);
            } else if (off < vmin || off > vmax) {
                hi = lo - 1.0;
            }
        };
        // floor(s) must stay in [0, dim-2]; the 1e-3 margin keeps the
        // float32-rounded coordinate safely below dim-1.
        constrain(ia, sx_row, 0.0, (double)(w - 1) - 1e-3);
        constrain(id, sy_row, 0.0, (double)(h - 1) - 1e-3);
        int xlo = (int)std::ceil(lo);
        int xhi = (int)std::floor(hi);

        if (xhi < xlo) {
            for (int px = 0; px < ow; ++px) border_px(px);
            continue;
        }
        for (int px = 0; px < xlo; ++px) border_px(px);
        for (int px = xlo; px <= xhi; ++px) {
            float sx = (float)(ia * px + sx_row);
            float sy = (float)(id * px + sy_row);
            int x0 = (int)sx;  // coords are non-negative in the span
            int y0 = (int)sy;
            float fx = sx - (float)x0;
            float fy = sy - (float)y0;
            const uint8_t* p0 = src + (y0 * w + x0) * 3;
            const uint8_t* p1 = p0 + w * 3;
            uint8_t* out = dst + (y * ow + px) * 3;
            float w00 = (1.0f - fy) * (1.0f - fx);
            float w01 = (1.0f - fy) * fx;
            float w10 = fy * (1.0f - fx);
            float w11 = fy * fx;
            for (int ch = 0; ch < 3; ++ch) {
                float v = w00 * p0[ch] + w01 * p0[3 + ch] +
                          w10 * p1[ch] + w11 * p1[3 + ch];
                int r = (int)std::lrintf(v);
                out[ch] = (uint8_t)std::min(std::max(r, 0), 255);
            }
        }
        for (int px = xhi + 1; px < ow; ++px) border_px(px);
    }
}

// Fused BGR uint8 -> normalized RGB float32 (ImageNet statistics),
// replacing three numpy passes (dataset/interhand.py:223-225).
void normalize_bgr_u8(const uint8_t* src, int h, int w, float* dst,
                      const float* mean /*3 rgb*/, const float* std_ /*3*/) {
    const float inv255 = 1.0f / 255.0f;
    float inv_std[3] = {1.0f / std_[0], 1.0f / std_[1], 1.0f / std_[2]};
    int n = h * w;
    for (int i = 0; i < n; ++i) {
        const uint8_t* p = src + i * 3;  // BGR
        float* o = dst + i * 3;          // RGB
        o[0] = (p[2] * inv255 - mean[0]) * inv_std[0];
        o[1] = (p[1] * inv255 - mean[1]) * inv_std[1];
        o[2] = (p[0] * inv255 - mean[2]) * inv_std[2];
    }
}

// Mask-color -> 3-class segmentation decode
// (dataset/interhand.py:206-215): ch1 vs ch2 with threshold 50; a flip
// swaps the labels.
void seg_from_mask_u8(const uint8_t* mask, int h, int w, int flipped,
                      int32_t* seg) {
    int n = h * w;
    int32_t left_label = flipped ? 2 : 1;
    int32_t right_label = flipped ? 1 : 2;
    for (int i = 0; i < n; ++i) {
        const uint8_t* p = mask + i * 3;  // BGR
        uint8_t g = p[1], r = p[2];
        if (g > 50 || r > 50) {
            seg[i] = (g >= r) ? left_label : right_label;
        } else {
            seg[i] = 0;
        }
    }
}

}  // extern "C"
