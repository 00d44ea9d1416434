// Native batched image loader: JPEG decode + NEAREST shorter-side
// resize + center crop in a pthread worker pool.
//
// The reference leans on torch's C++ DataLoader workers + PIL for its
// input pipeline (build.py:167-199); this is the equss_tpu native IO
// equivalent, feeding fixed-shape uint8 batches to the device pipeline
// (normalization/augmentation happen on-device, data/transforms.py).
// Exposed through a plain C ABI for ctypes (no pybind11 in the image).
//
// Build: part of `make -C native` (links -ljpeg).

#include <cstddef>  // size_t, required before the C jpeglib header
#include <cmath>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// decode a JPEG file into RGB; returns false on failure
bool decode_jpeg(const char* path, std::vector<uint8_t>& rgb,
                 int* h, int* w) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    jpeg_decompress_struct cinfo;
    jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        std::fclose(f);
        return false;
    }
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    *w = cinfo.output_width;
    *h = cinfo.output_height;
    rgb.resize(static_cast<size_t>(*w) * *h * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = rgb.data() +
                       static_cast<size_t>(cinfo.output_scanline) * *w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return true;
}

// PIL-convention NEAREST index: floor((dst + 0.5) * in / out)
inline int nearest_idx(int dst, int in_size, int out_size) {
    int idx = static_cast<int>((dst + 0.5) * in_size / out_size);
    return std::min(idx, in_size - 1);
}

// shorter-side NEAREST resize + center crop to (res, res) RGB
void resize_center_crop(const std::vector<uint8_t>& rgb, int h, int w,
                        int res, uint8_t* out) {
    int out_h, out_w;
    if (w <= h) {
        out_w = res;
        out_h = std::max(static_cast<int>(
                             std::lround(static_cast<double>(res) * h / w)),
                         1);
    } else {
        out_h = res;
        out_w = std::max(static_cast<int>(
                             std::lround(static_cast<double>(res) * w / h)),
                         1);
    }
    // torch CenterCrop origin
    int top = static_cast<int>(std::lround((out_h - res) / 2.0));
    int left = static_cast<int>(std::lround((out_w - res) / 2.0));

    for (int y = 0; y < res; ++y) {
        int sy = nearest_idx(y + top, h, out_h);
        for (int x = 0; x < res; ++x) {
            int sx = nearest_idx(x + left, w, out_w);
            const uint8_t* src =
                rgb.data() + (static_cast<size_t>(sy) * w + sx) * 3;
            uint8_t* dst = out + (static_cast<size_t>(y) * res + x) * 3;
            dst[0] = src[0];
            dst[1] = src[1];
            dst[2] = src[2];
        }
    }
}

}  // namespace

extern "C" {

// Load a batch of JPEGs into out (n, res, res, 3) uint8 using a thread
// pool.  paths: array of n C strings.  Returns the number of failures.
int load_image_batch(const char** paths, int n, int res, int n_threads,
                     uint8_t* out) {
    std::atomic<int> next(0);
    std::atomic<int> failures(0);
    int workers = std::max(1, n_threads);

    auto work = [&]() {
        std::vector<uint8_t> rgb;
        int h = 0, w = 0;
        while (true) {
            int i = next.fetch_add(1);
            if (i >= n) break;
            uint8_t* dst = out + static_cast<size_t>(i) * res * res * 3;
            if (decode_jpeg(paths[i], rgb, &h, &w)) {
                resize_center_crop(rgb, h, w, res, dst);
            } else {
                std::memset(dst, 0, static_cast<size_t>(res) * res * 3);
                failures.fetch_add(1);
            }
        }
    };

    std::vector<std::thread> pool;
    for (int t = 0; t < workers; ++t) pool.emplace_back(work);
    for (auto& th : pool) th.join();
    return failures.load();
}

}  // extern "C"
