// Native batched image/label loader: JPEG + PNG decode, NEAREST
// shorter-side resize + center crop (or exact stretch), pthread pool.
//
// The reference leans on torch's C++ DataLoader workers + PIL for its
// input pipeline (build.py:167-199); this is the equss_tpu native IO
// equivalent, feeding fixed-shape uint8 batches to the device pipeline
// (normalization/augmentation happen on-device, data/transforms.py).
// Geometry is bit-identical to the PIL path in data/transforms.py
// (torchvision T.Resize(NEAREST) + CenterCrop conventions — tested in
// tests/test_crf_native.py).  Labels decode to their RAW single
// channel: 8-bit gray values or palette INDICES (matching
// np.asarray(Image.open(png)) on L/P modes), never palette RGB.
// Exposed through a plain C ABI for ctypes (no pybind11 in the image).
//
// Build: part of `make -C native` (links -ljpeg -lpng).

#include <cstddef>  // size_t, required before the C jpeglib header
#include <cmath>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------
// decoders
// ---------------------------------------------------------------------

// libjpeg's default error_exit calls exit() — fatal for the host
// process (the trainer).  Route errors through setjmp like the PNG
// decoder, so a corrupt file is a per-item failure, not a crash.
struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jmp;
};

void jpeg_error_longjmp(j_common_ptr cinfo) {
    longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jmp, 1);
}

// decode a JPEG file; channels_out is 3 (RGB, also for gray JPEGs when
// want_rgb) or 1 (grayscale output of a grayscale JPEG). Returns false
// on failure.
bool decode_jpeg(const char* path, std::vector<uint8_t>& data,
                 int* h, int* w, int* channels, bool want_rgb) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_error_longjmp;
    if (setjmp(jerr.jmp)) {
        jpeg_destroy_decompress(&cinfo);
        std::fclose(f);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        std::fclose(f);
        return false;
    }
    cinfo.out_color_space =
        (want_rgb || cinfo.num_components != 1) ? JCS_RGB : JCS_GRAYSCALE;
    *channels = (cinfo.out_color_space == JCS_RGB) ? 3 : 1;
    jpeg_start_decompress(&cinfo);
    *w = cinfo.output_width;
    *h = cinfo.output_height;
    data.resize(static_cast<size_t>(*w) * *h * *channels);
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = data.data() +
                       static_cast<size_t>(cinfo.output_scanline) * *w *
                           *channels;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return true;
}

// decode a PNG file. want_rgb: everything converts to RGB8 (like
// PIL .convert("RGB") — palette expanded, 16-bit stripped, alpha
// dropped). !want_rgb (labels): raw single channel — 8-bit gray values
// or palette indices (like np.asarray(Image.open()) on L/P modes);
// multi-channel label PNGs are rejected.
bool decode_png(const char* path, std::vector<uint8_t>& data,
                int* h, int* w, int* channels, bool want_rgb) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    png_byte sig[8];
    if (std::fread(sig, 1, 8, f) != 8 || png_sig_cmp(sig, 0, 8)) {
        std::fclose(f);
        return false;
    }
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             nullptr, nullptr, nullptr);
    if (!png) { std::fclose(f); return false; }
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        std::fclose(f);
        return false;
    }
    std::vector<png_bytep> rows;  // declared before setjmp
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        std::fclose(f);
        return false;
    }
    png_init_io(png, f);
    png_set_sig_bytes(png, 8);
    png_read_info(png, info);

    const png_uint_32 width = png_get_image_width(png, info);
    const png_uint_32 height = png_get_image_height(png, info);
    const png_byte color_type = png_get_color_type(png, info);
    const png_byte bit_depth = png_get_bit_depth(png, info);

    if (want_rgb) {
        if (color_type == PNG_COLOR_TYPE_PALETTE)
            png_set_palette_to_rgb(png);
        if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
            png_set_expand_gray_1_2_4_to_8(png);
        if (png_get_valid(png, info, PNG_INFO_tRNS))
            png_set_tRNS_to_alpha(png);
        if (bit_depth == 16) png_set_strip_16(png);
        if (color_type == PNG_COLOR_TYPE_GRAY ||
            color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
            png_set_gray_to_rgb(png);
        png_set_strip_alpha(png);
        *channels = 3;
    } else {
        // raw label channel: palette INDICES or 8-bit gray only.  16-bit
        // gray is REJECTED (PIL decodes it as int32 'I' mode with values
        // possibly > 255 — stripping to 8 bits would silently corrupt
        // ids; rejection routes the file to the PIL fallback instead).
        if (color_type == PNG_COLOR_TYPE_PALETTE) {
            if (bit_depth < 8) png_set_packing(png);  // 1 byte / index
        } else if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth <= 8) {
            if (bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
        } else {
            longjmp(png_jmpbuf(png), 1);  // not a label-shaped PNG
        }
        *channels = 1;
    }
    png_read_update_info(png, info);
    const size_t rowbytes = png_get_rowbytes(png, info);
    if (rowbytes != static_cast<size_t>(width) * *channels)
        longjmp(png_jmpbuf(png), 1);

    data.resize(static_cast<size_t>(height) * rowbytes);
    rows.resize(height);
    for (png_uint_32 y = 0; y < height; ++y)
        rows[y] = data.data() + static_cast<size_t>(y) * rowbytes;
    png_read_image(png, rows.data());  // handles interlace internally
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    *w = static_cast<int>(width);
    *h = static_cast<int>(height);
    return true;
}

// sniff magic bytes and dispatch
bool decode_image(const char* path, std::vector<uint8_t>& data,
                  int* h, int* w, int* channels, bool want_rgb) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    unsigned char magic[2] = {0, 0};
    size_t got = std::fread(magic, 1, 2, f);
    std::fclose(f);
    if (got != 2) return false;
    if (magic[0] == 0xFF && magic[1] == 0xD8)
        return decode_jpeg(path, data, h, w, channels, want_rgb);
    if (magic[0] == 0x89 && magic[1] == 0x50)
        return decode_png(path, data, h, w, channels, want_rgb);
    return false;
}

// ---------------------------------------------------------------------
// geometry (PIL/torchvision parity, see data/transforms.py)
// ---------------------------------------------------------------------

// PIL NEAREST source-index map for a full resized axis.  Pillow's
// ImagingScaleAffine ACCUMULATES the step in double (xo = 0.5*step;
// idx = (int)xo; xo += step), which breaks exact-integer ties
// differently from the closed form floor((d+0.5)*in/out) — e.g.
// 320 -> 224 at d=17.  Replicated bit-for-bit (verified against PIL
// over 2000+ size pairs); also faster: no per-pixel divide.
void build_nearest_map(int in_size, int out_size, std::vector<int>& map) {
    map.resize(out_size);
    const double step = static_cast<double>(in_size) / out_size;
    double xo = step * 0.5;
    for (int x = 0; x < out_size; ++x) {
        int idx = static_cast<int>(xo);
        map[x] = idx < in_size ? idx : in_size - 1;
        xo += step;
    }
}

// mode 0: shorter-side NEAREST resize + center crop to (res, res)
// mode 1: NEAREST stretch to exactly (res, res)  (crop_type none —
//         transforms.prepare_image's (res, res) branch)
void resize_to_out(const std::vector<uint8_t>& data, int h, int w, int c,
                   int res, int mode, std::vector<int>& row_map,
                   std::vector<int>& col_map, uint8_t* out) {
    int out_h, out_w, top = 0, left = 0;
    if (mode == 1) {
        out_h = res;
        out_w = res;
    } else {
        // Python round() is half-to-EVEN — std::rint under the default
        // FE_TONEAREST mode matches it; lround (half-away) does not
        // (diverges whenever the scaled size / crop margin hits x.5).
        if (w <= h) {
            out_w = res;
            out_h = std::max(static_cast<int>(std::rint(
                                 static_cast<double>(res) * h / w)),
                             1);
        } else {
            out_h = res;
            out_w = std::max(static_cast<int>(std::rint(
                                 static_cast<double>(res) * w / h)),
                             1);
        }
        // torch CenterCrop origin (torchvision F.center_crop round())
        top = static_cast<int>(std::rint((out_h - res) / 2.0));
        left = static_cast<int>(std::rint((out_w - res) / 2.0));
    }
    build_nearest_map(h, out_h, row_map);
    build_nearest_map(w, out_w, col_map);
    const int* rows = row_map.data() + top;
    const int* cols = col_map.data() + left;

    for (int y = 0; y < res; ++y) {
        const uint8_t* src_row = data.data() +
                                 static_cast<size_t>(rows[y]) * w * c;
        uint8_t* dst = out + static_cast<size_t>(y) * res * c;
        if (c == 3) {
            for (int x = 0; x < res; ++x) {
                const uint8_t* src = src_row + 3 * static_cast<size_t>(cols[x]);
                *dst++ = src[0];
                *dst++ = src[1];
                *dst++ = src[2];
            }
        } else {
            for (int x = 0; x < res; ++x) *dst++ = src_row[cols[x]];
        }
    }
}

// shared batch driver
int run_batch(const char** paths, int n, int res, int mode, int n_threads,
              int out_channels, uint8_t* out) {
    std::atomic<int> next(0);
    std::atomic<int> failures(0);
    int workers = std::max(1, std::min(n_threads, n));
    const bool want_rgb = out_channels == 3;
    const size_t item = static_cast<size_t>(res) * res * out_channels;

    auto work = [&]() {
        std::vector<uint8_t> data;
        std::vector<int> row_map, col_map;
        int h = 0, w = 0, c = 0;
        while (true) {
            int i = next.fetch_add(1);
            if (i >= n) break;
            uint8_t* dst = out + static_cast<size_t>(i) * item;
            if (decode_image(paths[i], data, &h, &w, &c, want_rgb) &&
                c == out_channels) {
                resize_to_out(data, h, w, c, res, mode, row_map, col_map,
                              dst);
            } else {
                std::memset(dst, want_rgb ? 0 : 0xFF, item);
                failures.fetch_add(1);
            }
        }
    };

    if (workers == 1) {
        work();
    } else {
        std::vector<std::thread> pool;
        for (int t = 0; t < workers; ++t) pool.emplace_back(work);
        for (auto& th : pool) th.join();
    }
    return failures.load();
}

}  // namespace

extern "C" {

// Load a batch of images (JPEG or PNG) into out (n, res, res, 3) uint8
// using a thread pool; shorter-side resize + center crop.  paths: array
// of n C strings.  Returns the number of failures (failed slots are
// zero-filled).
int load_image_batch(const char** paths, int n, int res, int n_threads,
                     uint8_t* out) {
    return run_batch(paths, n, res, /*mode=*/0, n_threads, 3, out);
}

// Same with an explicit geometry mode: 0 = shorter-side resize + center
// crop, 1 = exact (res, res) NEAREST stretch (crop_type none).
int load_image_batch2(const char** paths, int n, int res, int mode,
                      int n_threads, uint8_t* out) {
    return run_batch(paths, n, res, mode, n_threads, 3, out);
}

// Load a batch of LABEL maps (PNG gray-8 / palette indices, or
// grayscale JPEG) into out (n, res, res) uint8.  Failed slots fill
// 0xFF.  mode as above.
int load_label_batch(const char** paths, int n, int res, int mode,
                     int n_threads, uint8_t* out) {
    return run_batch(paths, n, res, mode, n_threads, 1, out);
}

}  // extern "C"
