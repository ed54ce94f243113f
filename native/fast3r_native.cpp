// fast3r_tpu native runtime ops (C++, ctypes ABI).
//
// The reference's only native code is the CUDA/C++ curope extension
// (fast3r/croco/models/curope/{curope.cpp,kernels.cu}): an in-place 2D rotary
// embedding.  On TPU the rotation fuses into XLA (fast3r_tpu/ops/rope2d.py),
// so the native layer here serves the HOST side of the framework instead:
//
//   * rope2d_forward: standalone 2D RoPE with the exact torch-fallback
//     numerics (pos_embed.py:131-183) — the CPU reference used to validate
//     the device kernels, and a self-inverse backward (direction=-1) like the
//     curope autograd (curope2d.py:18-36);
//   * img_normalize_u8: the data loader's hot per-pixel path — uint8 HWC ->
//     float32 (x/255 - 0.5)/0.5, OpenMP-parallel;
//   * pointmap_from_depth: batched pinhole back-projection
//     (geometry.py:180-245) for the loader's pts3d computation.
//
// Build: make -C native   (produces libfast3r_native.so; loaded via ctypes in
// fast3r_tpu/native.py with a pure-python fallback when absent).

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// tokens: (B, H, N, D) float32, positions: (B, N, 2) int64 (y, x)
// direction: +1 forward, -1 inverse (self-inverse pair, curope2d.py:29-36)
void rope2d_forward(float* tokens, const int64_t* positions,
                    int64_t B, int64_t H, int64_t N, int64_t D,
                    float base, float direction) {
    const int64_t half = D / 2;      // y-half / x-half split
    const int64_t quarter = half / 2;

#pragma omp parallel for collapse(2)
    for (int64_t b = 0; b < B; ++b) {
        for (int64_t n = 0; n < N; ++n) {
            const int64_t posy = positions[(b * N + n) * 2 + 0];
            const int64_t posx = positions[(b * N + n) * 2 + 1];
            for (int64_t h = 0; h < H; ++h) {
                float* t = tokens + ((b * H + h) * N + n) * D;
                // two coordinate halves, each rotated by its own position
                for (int c = 0; c < 2; ++c) {
                    float* seg = t + c * half;
                    const float pos = static_cast<float>(c == 0 ? posy : posx);
                    for (int64_t i = 0; i < quarter; ++i) {
                        // inv_freq = base^{-2i/half} (pos_embed.py:140-142)
                        const float inv_freq =
                            std::pow(base, -2.0f * static_cast<float>(i) /
                                               static_cast<float>(half));
                        const float angle = pos * inv_freq * direction;
                        const float c0 = std::cos(angle);
                        const float s0 = std::sin(angle);
                        const float u = seg[i];
                        const float v = seg[i + quarter];
                        seg[i] = u * c0 - v * s0;
                        seg[i + quarter] = v * c0 + u * s0;
                    }
                }
            }
        }
    }
}

// img: (N, H, W, 3) uint8 -> out float32 normalized to [-1, 1]
void img_normalize_u8(const uint8_t* img, float* out, int64_t count) {
#pragma omp parallel for
    for (int64_t i = 0; i < count; ++i) {
        out[i] = (static_cast<float>(img[i]) / 255.0f - 0.5f) / 0.5f;
    }
}

// depth: (H, W) f32; K: 3x3 row-major; pose: 4x4 cam2world row-major (or
// nullptr for camera frame) -> pts (H, W, 3), valid (H, W) uint8
void pointmap_from_depth(const float* depth, const float* K,
                         const float* pose, int64_t Hh, int64_t Ww,
                         float* pts, uint8_t* valid) {
    const float fx = K[0], cx = K[2], fy = K[4], cy = K[5];
#pragma omp parallel for
    for (int64_t v = 0; v < Hh; ++v) {
        for (int64_t u = 0; u < Ww; ++u) {
            const int64_t i = v * Ww + u;
            const float z = depth[i];
            float x = z * (static_cast<float>(u) - cx) / fx;
            float y = z * (static_cast<float>(v) - cy) / fy;
            float w[3] = {x, y, z};
            if (pose != nullptr) {
                float r[3];
                for (int k = 0; k < 3; ++k) {
                    r[k] = pose[4 * k + 0] * x + pose[4 * k + 1] * y +
                           pose[4 * k + 2] * z + pose[4 * k + 3];
                }
                std::memcpy(w, r, sizeof(r));
            }
            pts[i * 3 + 0] = w[0];
            pts[i * 3 + 1] = w[1];
            pts[i * 3 + 2] = w[2];
            valid[i] = z > 0.0f ? 1 : 0;
        }
    }
}

}  // extern "C"
