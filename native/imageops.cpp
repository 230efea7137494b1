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

// Bilinear affine warp with BORDER_REPLICATE, matching
// cv2.warpAffine(flags=INTER_LINEAR, borderMode=BORDER_REPLICATE) as the
// reference uses for image augmentation (utils/utils.py:357-364).
// src: HxWx3 uint8, dst: OHxOWx3 uint8, m: 2x3 row-major inverse map is
// computed internally from the forward matrix.
void affine_warp_u8(const uint8_t* src, int h, int w,
                    uint8_t* dst, int oh, int ow,
                    const float* m /* 2x3 forward */) {
    // invert the 2x3 affine (forward dst = M src => src = Minv dst)
    float a = m[0], b = m[1], c = m[2];
    float d = m[3], e = m[4], f = m[5];
    float det = a * e - b * d;
    if (std::fabs(det) < 1e-12f) det = det < 0 ? -1e-12f : 1e-12f;
    float ia = e / det, ib = -b / det;
    float id = -d / det, ie = a / det;
    float ic = -(ia * c + ib * f);
    float if_ = -(id * c + ie * f);

    for (int y = 0; y < oh; ++y) {
        for (int x = 0; x < ow; ++x) {
            float sx = ia * x + ib * y + ic;
            float sy = id * x + ie * y + if_;
            int x0 = (int)std::floor(sx);
            int y0 = (int)std::floor(sy);
            float fx = sx - x0;
            float fy = sy - y0;
            int x0c = std::min(std::max(x0, 0), w - 1);
            int x1c = std::min(std::max(x0 + 1, 0), w - 1);
            int y0c = std::min(std::max(y0, 0), h - 1);
            int y1c = std::min(std::max(y0 + 1, 0), h - 1);
            const uint8_t* p00 = src + (y0c * w + x0c) * 3;
            const uint8_t* p01 = src + (y0c * w + x1c) * 3;
            const uint8_t* p10 = src + (y1c * w + x0c) * 3;
            const uint8_t* p11 = src + (y1c * w + x1c) * 3;
            uint8_t* out = dst + (y * ow + x) * 3;
            for (int ch = 0; ch < 3; ++ch) {
                float v = (1 - fy) * ((1 - fx) * p00[ch] + fx * p01[ch]) +
                          fy * ((1 - fx) * p10[ch] + fx * p11[ch]);
                out[ch] = (uint8_t)std::min(std::max(v + 0.5f, 0.0f),
                                            255.0f);
            }
        }
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
