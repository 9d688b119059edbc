// Native data plane: multithreaded JPEG decode + Pillow-compatible
// antialiased bilinear resize to a square RGB buffer.
//
// Replaces the reference's host-side image path (PIL/libjpeg via torchvision
// ImageNet + DataLoader workers, reference: CALM_ViT_V2.py:159-178) — the
// only native-performance dependency on the reference's host data path. The
// Python loader calls decode_resize_batch() once per batch; decoding runs on
// a std::thread pool with the GIL released (ctypes), so JPEG decode overlaps
// both Python bookkeeping and device compute.
//
// Resampling matches Pillow's triangle (BILINEAR) filter with support
// scaling on downscale (Pillow >= 2.7 semantics, "antialias"), so images are
// numerically close to the PIL path used for golden tests.
//
// Build: scripts/build_native.sh (g++ -O3 -shared, links -ljpeg).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>  // requires <cstddef>/<cstdio> first (libjpeg62 header)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(err->jb, 1);
}

// Decode one JPEG file to an RGB byte buffer. Returns false on any error.
bool decode_jpeg(const char* path, std::vector<uint8_t>& pixels, int& w,
                 int& h) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;

    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return false;
    }
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    w = cinfo.output_width;
    h = cinfo.output_height;
    if (w <= 0 || h <= 0 || cinfo.output_components != 3) {
        jpeg_abort_decompress(&cinfo);
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return false;
    }
    pixels.resize(static_cast<size_t>(w) * h * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = pixels.data() +
                       static_cast<size_t>(cinfo.output_scanline) * w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return true;
}

// Pillow-style precomputed triangle-filter coefficients for one axis.
struct ResampleCoeffs {
    std::vector<int> bounds;      // (xmin, size) pairs
    std::vector<float> weights;   // ksize weights per output pixel
    int ksize;
};

ResampleCoeffs precompute(int in_size, int out_size) {
    ResampleCoeffs rc;
    const double scale = static_cast<double>(in_size) / out_size;
    const double filterscale = std::max(scale, 1.0);
    const double support = 1.0 * filterscale;  // triangle support = 1
    rc.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
    rc.bounds.resize(2 * out_size);
    rc.weights.assign(static_cast<size_t>(rc.ksize) * out_size, 0.0f);
    for (int xx = 0; xx < out_size; ++xx) {
        const double center = (xx + 0.5) * scale;
        int xmin = static_cast<int>(std::max(center - support + 0.5, 0.0));
        int xmax = static_cast<int>(
            std::min(center + support + 0.5, static_cast<double>(in_size)));
        xmax -= xmin;
        double total = 0.0;
        float* k = rc.weights.data() + static_cast<size_t>(xx) * rc.ksize;
        for (int x = 0; x < xmax; ++x) {
            double arg = (x + xmin - center + 0.5) / filterscale;
            double wv = arg < 0 ? 1.0 + arg : 1.0 - arg;  // triangle
            wv = std::max(wv, 0.0);
            k[x] = static_cast<float>(wv);
            total += wv;
        }
        if (total > 0) {
            for (int x = 0; x < xmax; ++x) k[x] /= static_cast<float>(total);
        }
        rc.bounds[2 * xx] = xmin;
        rc.bounds[2 * xx + 1] = xmax;
    }
    return rc;
}

// Separable resize RGB uint8 (h_in, w_in) -> (out, out).
void resize_bilinear(const uint8_t* src, int w_in, int h_in, int out,
                     uint8_t* dst) {
    ResampleCoeffs rx = precompute(w_in, out);
    ResampleCoeffs ry = precompute(h_in, out);
    // Horizontal pass -> fp32 (h_in, out, 3)
    std::vector<float> tmp(static_cast<size_t>(h_in) * out * 3);
    for (int y = 0; y < h_in; ++y) {
        const uint8_t* row = src + static_cast<size_t>(y) * w_in * 3;
        float* trow = tmp.data() + static_cast<size_t>(y) * out * 3;
        for (int x = 0; x < out; ++x) {
            const int xmin = rx.bounds[2 * x];
            const int xmax = rx.bounds[2 * x + 1];
            const float* k = rx.weights.data() +
                             static_cast<size_t>(x) * rx.ksize;
            float acc0 = 0, acc1 = 0, acc2 = 0;
            for (int i = 0; i < xmax; ++i) {
                const uint8_t* p = row + static_cast<size_t>(xmin + i) * 3;
                acc0 += p[0] * k[i];
                acc1 += p[1] * k[i];
                acc2 += p[2] * k[i];
            }
            trow[x * 3 + 0] = acc0;
            trow[x * 3 + 1] = acc1;
            trow[x * 3 + 2] = acc2;
        }
    }
    // Vertical pass -> uint8 (out, out, 3)
    for (int y = 0; y < out; ++y) {
        const int ymin = ry.bounds[2 * y];
        const int ymax = ry.bounds[2 * y + 1];
        const float* k = ry.weights.data() + static_cast<size_t>(y) * ry.ksize;
        uint8_t* drow = dst + static_cast<size_t>(y) * out * 3;
        for (int x = 0; x < out * 3; ++x) {
            float acc = 0;
            for (int i = 0; i < ymax; ++i) {
                acc += tmp[static_cast<size_t>(ymin + i) * out * 3 + x] * k[i];
            }
            int v = static_cast<int>(acc + 0.5f);
            drow[x] = static_cast<uint8_t>(std::clamp(v, 0, 255));
        }
    }
}

}  // namespace

extern "C" {

// Decode n images and resize each to (out_size, out_size, 3) RGB into `out`
// (contiguous, n*out_size*out_size*3 bytes). ok[i] = 1 on success, 0 on any
// failure (caller falls back to its slow path for those). Runs on
// `n_threads` std::threads; call with the GIL released.
void decode_resize_batch(const char** paths, int n, int out_size,
                         uint8_t* out, uint8_t* ok, int n_threads) {
    std::atomic<int> next(0);
    auto worker = [&]() {
        std::vector<uint8_t> pixels;
        for (;;) {
            const int i = next.fetch_add(1);
            if (i >= n) return;
            int w = 0, h = 0;
            if (decode_jpeg(paths[i], pixels, w, h)) {
                resize_bilinear(pixels.data(), w, h, out_size,
                                out + static_cast<size_t>(i) * out_size *
                                          out_size * 3);
                ok[i] = 1;
            } else {
                ok[i] = 0;
            }
        }
    };
    const int nt = std::max(1, std::min(n_threads, n));
    std::vector<std::thread> threads;
    threads.reserve(nt);
    for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
}

// Standalone resize entry (testing): src (h,w,3) uint8 -> dst (out,out,3).
void resize_rgb(const uint8_t* src, int w, int h, int out_size,
                uint8_t* dst) {
    resize_bilinear(src, w, h, out_size, dst);
}

}  // extern "C"
