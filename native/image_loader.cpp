// Native JPEG decode + resize for the host input pipeline.
//
// The reference's DataLoader workers decode with PIL (Datasets.py:42-46);
// here the hot path (JPEG -> RGB -> bilinear resize to the CNN input size)
// runs in C++: libjpeg for the decode and a reimplementation of Pillow's
// fixed-point triangle ("bilinear") resampling (Pillow
// src/libImaging/Resample.c, 8bpc path) so outputs are byte-identical to
// the PIL transform given the same decoded pixels — preprocessing parity
// is part of checkpoint parity.
//
// Exposed via ctypes (simpleimagecaptionzoo_tpu/data/_native_image.py);
// every caller falls back to PIL when this library is absent or an image
// is unsupported (non-JPEG, CMYK, corrupt).  Calls release the GIL by
// construction (plain C ABI), so the existing 8-thread Python decode pool
// scales across cores.
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>

#include <jpeglib.h>

namespace {

// ---------------------------------------------------------------------------
// Pillow-compatible triangle resampling (Resample.c, 8bpc)
// ---------------------------------------------------------------------------

constexpr int PRECISION_BITS = 32 - 8 - 2;

inline uint8_t clip8(int in) {
    if (in >= (1 << (PRECISION_BITS + 8))) return 255;
    if (in <= 0) return 0;
    return static_cast<uint8_t>(in >> PRECISION_BITS);
}

inline double triangle_filter(double x) {
    if (x < 0.0) x = -x;
    return x < 1.0 ? 1.0 - x : 0.0;
}

// Per-axis coefficient table: Pillow precompute_coeffs + normalize_8bpc.
struct Coeffs {
    int ksize;
    std::vector<int> bounds;   // (out, 2): xmin, xmax(count)
    std::vector<int32_t> kk;   // (out, ksize) fixed-point weights
};

Coeffs precompute(int in_size, int out_size) {
    Coeffs c;
    double scale = static_cast<double>(in_size) / out_size;
    double filterscale = scale < 1.0 ? 1.0 : scale;
    double support = 1.0 * filterscale;            // triangle support == 1
    c.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
    c.bounds.resize(out_size * 2);
    c.kk.resize(static_cast<size_t>(out_size) * c.ksize);
    std::vector<double> k(c.ksize);
    for (int xx = 0; xx < out_size; xx++) {
        double center = (xx + 0.5) * scale;
        double ww = 0.0;
        double ss = 1.0 / filterscale;
        int xmin = static_cast<int>(center - support + 0.5);
        if (xmin < 0) xmin = 0;
        int xmax = static_cast<int>(center + support + 0.5);
        if (xmax > in_size) xmax = in_size;
        xmax -= xmin;
        int x = 0;
        for (; x < xmax; x++) {
            double w = triangle_filter((x + xmin - center + 0.5) * ss);
            k[x] = w;
            ww += w;
        }
        for (x = 0; x < xmax; x++) {
            if (ww != 0.0) k[x] /= ww;
        }
        for (; x < c.ksize; x++) k[x] = 0.0;
        for (x = 0; x < c.ksize; x++) {
            double v = k[x] * (1 << PRECISION_BITS);
            c.kk[static_cast<size_t>(xx) * c.ksize + x] =
                static_cast<int32_t>(v < 0 ? v - 0.5 : v + 0.5);
        }
        c.bounds[xx * 2 + 0] = xmin;
        c.bounds[xx * 2 + 1] = xmax;
    }
    return c;
}

// Two-pass resize of an interleaved RGB8 image, quantizing to 8 bits
// between passes exactly as Pillow does (horizontal first).
void resize_rgb8(const uint8_t* in, int h, int w, int out_h, int out_w,
                 uint8_t* out) {
    Coeffs ch = precompute(w, out_w);
    std::vector<uint8_t> tmp(static_cast<size_t>(h) * out_w * 3);
    for (int yy = 0; yy < h; yy++) {
        const uint8_t* row = in + static_cast<size_t>(yy) * w * 3;
        uint8_t* trow = tmp.data() + static_cast<size_t>(yy) * out_w * 3;
        for (int xx = 0; xx < out_w; xx++) {
            int xmin = ch.bounds[xx * 2 + 0];
            int xmax = ch.bounds[xx * 2 + 1];
            const int32_t* k = &ch.kk[static_cast<size_t>(xx) * ch.ksize];
            int s0 = 1 << (PRECISION_BITS - 1);
            int s1 = s0, s2 = s0;
            for (int x = 0; x < xmax; x++) {
                const uint8_t* px = row + static_cast<size_t>(xmin + x) * 3;
                s0 += px[0] * k[x];
                s1 += px[1] * k[x];
                s2 += px[2] * k[x];
            }
            trow[xx * 3 + 0] = clip8(s0);
            trow[xx * 3 + 1] = clip8(s1);
            trow[xx * 3 + 2] = clip8(s2);
        }
    }
    Coeffs cv = precompute(h, out_h);
    for (int yy = 0; yy < out_h; yy++) {
        int ymin = cv.bounds[yy * 2 + 0];
        int ymax = cv.bounds[yy * 2 + 1];
        const int32_t* k = &cv.kk[static_cast<size_t>(yy) * cv.ksize];
        uint8_t* orow = out + static_cast<size_t>(yy) * out_w * 3;
        for (int xx = 0; xx < out_w; xx++) {
            int s0 = 1 << (PRECISION_BITS - 1);
            int s1 = s0, s2 = s0;
            for (int y = 0; y < ymax; y++) {
                const uint8_t* px = tmp.data()
                    + (static_cast<size_t>(ymin + y) * out_w + xx) * 3;
                s0 += px[0] * k[y];
                s1 += px[1] * k[y];
                s2 += px[2] * k[y];
            }
            orow[xx * 3 + 0] = clip8(s0);
            orow[xx * 3 + 1] = clip8(s1);
            orow[xx * 3 + 2] = clip8(s2);
        }
    }
}

// ---------------------------------------------------------------------------
// libjpeg decode with longjmp error recovery
// ---------------------------------------------------------------------------

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf env;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(err->env, 1);
}

// Heap-allocated decode state: everything libjpeg mutates after setjmp
// lives here, NOT in the setjmp frame's locals.  C11 7.13.2.1 makes
// non-volatile automatics modified between setjmp and longjmp
// indeterminate after the jump; routing all mutation through a pointer
// established before setjmp (and decoding in a separate helper frame)
// keeps the recovery path well-defined (ADVICE r2).
struct DecodeCtx {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    std::vector<uint8_t> pixels;
    int w = 0, h = 0;
};

// All libjpeg calls; may longjmp back into the caller's setjmp.  Returns 0
// on success with ctx->pixels/w/h filled, <0 after destroying the
// decompressor itself.
int decode_jpeg_into(DecodeCtx* ctx, const uint8_t* data, int len) {
    jpeg_decompress_struct* cinfo = &ctx->cinfo;
    jpeg_create_decompress(cinfo);
    jpeg_mem_src(cinfo, data, static_cast<unsigned long>(len));
    jpeg_read_header(cinfo, TRUE);
    if (cinfo->jpeg_color_space == JCS_CMYK ||
        cinfo->jpeg_color_space == JCS_YCCK) {
        jpeg_destroy_decompress(cinfo);
        return -3;                                  // PIL handles CMYK
    }
    cinfo->out_color_space = JCS_RGB;               // gray -> RGB replicated
    cinfo->dct_method = JDCT_ISLOW;                 // PIL's default accuracy
    jpeg_start_decompress(cinfo);
    int w = static_cast<int>(cinfo->output_width);
    int h = static_cast<int>(cinfo->output_height);
    if (cinfo->output_components != 3 || w <= 0 || h <= 0) {
        jpeg_destroy_decompress(cinfo);
        return -4;
    }
    ctx->w = w;
    ctx->h = h;
    ctx->pixels.resize(static_cast<size_t>(h) * w * 3);
    while (cinfo->output_scanline < cinfo->output_height) {
        JSAMPROW row = ctx->pixels.data()
            + static_cast<size_t>(cinfo->output_scanline) * w * 3;
        jpeg_read_scanlines(cinfo, &row, 1);
    }
    jpeg_finish_decompress(cinfo);
    // Truncated entropy data is only a WARNING to libjpeg (it inserts a
    // fake EOI and gray-fills the remaining scanlines) — error_exit never
    // fires.  Refuse such files so the Python caller falls back to PIL,
    // which raises loudly instead of training on silently-corrupt pixels.
    long warnings = cinfo->err->num_warnings;
    jpeg_destroy_decompress(cinfo);
    if (warnings > 0) return -5;
    return 0;
}

}  // namespace

extern "C" {

// Resize an interleaved RGB8 buffer Pillow-style (parity test surface).
int sicz_resize_rgb8(const uint8_t* in, int h, int w, int out_h, int out_w,
                     uint8_t* out) {
    if (!in || !out || h <= 0 || w <= 0 || out_h <= 0 || out_w <= 0)
        return -1;
    resize_rgb8(in, h, w, out_h, out_w, out);
    return 0;
}

// Decode a JPEG byte buffer to RGB and resize to (out_size, out_size, 3).
// Returns 0 on success; <0 when the image can't be handled natively (the
// Python caller then falls back to PIL).
int sicz_decode_jpeg_resize(const uint8_t* data, int len, int out_size,
                            uint8_t* out) {
    if (!data || len <= 0 || out_size <= 0 || !out) return -1;
    // ctx is set before setjmp and never reassigned, so its (pointer)
    // value is well-defined after longjmp; all mutated decode state is
    // behind it on the heap (see DecodeCtx).
    DecodeCtx* const ctx = new DecodeCtx();
    ctx->cinfo.err = jpeg_std_error(&ctx->jerr.mgr);
    ctx->jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(ctx->jerr.env)) {
        jpeg_destroy_decompress(&ctx->cinfo);
        delete ctx;
        return -2;                                  // corrupt / unsupported
    }
    const int rc = decode_jpeg_into(ctx, data, len);
    if (rc == 0)
        resize_rgb8(ctx->pixels.data(), ctx->h, ctx->w, out_size, out_size,
                    out);
    delete ctx;
    return rc;
}

}  // extern "C"
