// mcaq_dataio: native preprocessing for the MCAQ-YOLO-TPU data pipeline.
//
// The reference delegates its data pipeline to Ultralytics (Python); the
// hot host-side ops here — letterbox (bilinear resize + pad) fused with
// uint8->float normalization, and horizontal flip — are implemented in C++
// and exposed via a C ABI for ctypes binding (no pybind11 in this image).
//
// Fusion rationale: the Python path does resize (cv2), pad (numpy copy),
// dtype convert (numpy copy), /255 (numpy copy) — four passes over the
// image; this does one. On the single-core host feeding the TPU, input
// preprocessing is on the critical path of the input pipeline.
//
// Build: make -C native      (produces libmcaq_dataio.so)

#include <algorithm>
#include <cstdint>
#include <cstring>

extern "C" {

// Bilinear-resize an HxWx3 uint8 RGB image into a letterboxed
// out_size x out_size x 3 float32 buffer in [0,1], gray padding.
// Matches cv2.INTER_LINEAR coordinate semantics:
//   src = (dst + 0.5) / scale - 0.5
// Returns the applied scale; writes pad offsets to pad_x/pad_y.
float mcaq_letterbox_f32(
    const uint8_t* img, int h, int w,
    int out_size, float pad_value_u8,
    float* out, int* pad_x, int* pad_y)
{
    const float scale = std::min(
        static_cast<float>(out_size) / h,
        static_cast<float>(out_size) / w);
    const int nh = static_cast<int>(h * scale + 0.5f);
    const int nw = static_cast<int>(w * scale + 0.5f);
    const int py = (out_size - nh) / 2;
    const int px = (out_size - nw) / 2;
    *pad_x = px;
    *pad_y = py;

    const float pad_f = pad_value_u8 / 255.0f;
    const float inv_scale_y = static_cast<float>(h) / nh;
    const float inv_scale_x = static_cast<float>(w) / nw;
    const float inv255 = 1.0f / 255.0f;

    // fill padding rows/cols lazily: memset-like fill of whole buffer first
    const long long total = static_cast<long long>(out_size) * out_size * 3;
    for (long long i = 0; i < total; ++i) out[i] = pad_f;

    for (int y = 0; y < nh; ++y) {
        float sy = (y + 0.5f) * inv_scale_y - 0.5f;
        sy = std::max(0.0f, std::min(sy, static_cast<float>(h - 1)));
        const int y0 = static_cast<int>(sy);
        const int y1 = std::min(y0 + 1, h - 1);
        const float fy = sy - y0;

        float* dst_row = out + (static_cast<long long>(y + py) * out_size + px) * 3;
        const uint8_t* row0 = img + static_cast<long long>(y0) * w * 3;
        const uint8_t* row1 = img + static_cast<long long>(y1) * w * 3;

        for (int x = 0; x < nw; ++x) {
            float sx = (x + 0.5f) * inv_scale_x - 0.5f;
            sx = std::max(0.0f, std::min(sx, static_cast<float>(w - 1)));
            const int x0 = static_cast<int>(sx);
            const int x1 = std::min(x0 + 1, w - 1);
            const float fx = sx - x0;

            const float w00 = (1 - fy) * (1 - fx);
            const float w01 = (1 - fy) * fx;
            const float w10 = fy * (1 - fx);
            const float w11 = fy * fx;

            for (int c = 0; c < 3; ++c) {
                const float v =
                    w00 * row0[x0 * 3 + c] + w01 * row0[x1 * 3 + c] +
                    w10 * row1[x0 * 3 + c] + w11 * row1[x1 * 3 + c];
                dst_row[x * 3 + c] = v * inv255;
            }
        }
    }
    return scale;
}

// uint8-out letterbox: same geometry as mcaq_letterbox_f32 but keeps the
// image uint8 (no normalization).  The /255 moves onto the accelerator,
// where it fuses into the first conv for free — and host->device transfers
// shrink 4x (they are on the critical path when the device is reached
// through a network tunnel).  Identity fast path: square source already at
// out_size -> memcpy.
float mcaq_letterbox_u8(
    const uint8_t* img, int h, int w,
    int out_size, uint8_t pad_value,
    uint8_t* out, int* pad_x, int* pad_y)
{
    if (h == out_size && w == out_size) {
        *pad_x = 0;
        *pad_y = 0;
        std::memcpy(out, img, static_cast<size_t>(out_size) * out_size * 3);
        return 1.0f;
    }
    const float scale = std::min(
        static_cast<float>(out_size) / h,
        static_cast<float>(out_size) / w);
    const int nh = static_cast<int>(h * scale + 0.5f);
    const int nw = static_cast<int>(w * scale + 0.5f);
    const int py = (out_size - nh) / 2;
    const int px = (out_size - nw) / 2;
    *pad_x = px;
    *pad_y = py;

    const float inv_scale_y = static_cast<float>(h) / nh;
    const float inv_scale_x = static_cast<float>(w) / nw;

    std::memset(out, pad_value,
                static_cast<size_t>(out_size) * out_size * 3);

    for (int y = 0; y < nh; ++y) {
        float sy = (y + 0.5f) * inv_scale_y - 0.5f;
        sy = std::max(0.0f, std::min(sy, static_cast<float>(h - 1)));
        const int y0 = static_cast<int>(sy);
        const int y1 = std::min(y0 + 1, h - 1);
        const float fy = sy - y0;

        uint8_t* dst_row = out + (static_cast<long long>(y + py) * out_size + px) * 3;
        const uint8_t* row0 = img + static_cast<long long>(y0) * w * 3;
        const uint8_t* row1 = img + static_cast<long long>(y1) * w * 3;

        for (int x = 0; x < nw; ++x) {
            float sx = (x + 0.5f) * inv_scale_x - 0.5f;
            sx = std::max(0.0f, std::min(sx, static_cast<float>(w - 1)));
            const int x0 = static_cast<int>(sx);
            const int x1 = std::min(x0 + 1, w - 1);
            const float fx = sx - x0;

            const float w00 = (1 - fy) * (1 - fx);
            const float w01 = (1 - fy) * fx;
            const float w10 = fy * (1 - fx);
            const float w11 = fy * fx;

            for (int c = 0; c < 3; ++c) {
                const float v =
                    w00 * row0[x0 * 3 + c] + w01 * row0[x1 * 3 + c] +
                    w10 * row1[x0 * 3 + c] + w11 * row1[x1 * 3 + c];
                dst_row[x * 3 + c] = static_cast<uint8_t>(v + 0.5f);
            }
        }
    }
    return scale;
}

// In-place horizontal flip of an SxSx3 float32 image.
void mcaq_hflip_f32(float* img, int size)
{
    for (int y = 0; y < size; ++y) {
        float* row = img + static_cast<long long>(y) * size * 3;
        for (int x = 0; x < size / 2; ++x) {
            for (int c = 0; c < 3; ++c) {
                std::swap(row[x * 3 + c], row[(size - 1 - x) * 3 + c]);
            }
        }
    }
}

// Batched letterbox: n images with per-image (h, w), contiguous output
// (n, out_size, out_size, 3) float32. imgs[i] points at image i's uint8 data.
void mcaq_letterbox_batch_f32(
    const uint8_t** imgs, const int* hs, const int* ws, int n,
    int out_size, float pad_value_u8,
    float* out, float* scales, int* pads_xy)
{
    const long long stride = static_cast<long long>(out_size) * out_size * 3;
    for (int i = 0; i < n; ++i) {
        scales[i] = mcaq_letterbox_f32(
            imgs[i], hs[i], ws[i], out_size, pad_value_u8,
            out + i * stride, &pads_xy[i * 2], &pads_xy[i * 2 + 1]);
    }
}

}  // extern "C"
