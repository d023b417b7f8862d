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
//
// min_size > 0 selects the FAST ingest mode: the IDCT runs at the largest
// power-of-two downscale (1/2, 1/4, 1/8 — DCT-domain, so a 1/2 decode does
// a 4x4 IDCT instead of 8x8 and touches 4x fewer output pixels) that keeps
// min(w, h) >= min_size, and max_dim caps the scaled output's larger side
// (0 = uncapped); the scale is pushed further if needed to fit max_dim.
// min_size == 0 is the PARITY mode: full-resolution decode, byte-equal
// input to the Pillow-parity resample.  fast_dct selects JDCT_IFAST
// (fast mode only; parity mode always uses PIL's JDCT_ISLOW).
int decode_jpeg_into(DecodeCtx* ctx, const uint8_t* data, int len,
                     int min_size, int max_dim, int fast_dct) {
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
    if (min_size > 0) {
        int full_w = static_cast<int>(cinfo->image_width);
        int full_h = static_cast<int>(cinfo->image_height);
        int lo = full_w < full_h ? full_w : full_h;
        int hi = full_w < full_h ? full_h : full_w;
        int denom = 1;
        while (denom < 8 && lo / (denom * 2) >= min_size) denom *= 2;
        // an extreme aspect ratio can leave the long side over the caller's
        // buffer cap; trade min-size (the device resample upscales fine)
        // for fitting, exactly once per doubling.  libjpeg rounds output
        // dims UP (jdiv_round_up), so the fit check must ceil too — floor
        // would pass e.g. hi=4097 denom=8 (4097/8=512) while the decode
        // emits 513 rows and overruns the caller's (pad, pad, 3) buffer.
        while (max_dim > 0 && denom < 8 &&
               (hi + denom - 1) / denom > max_dim) denom *= 2;
        if (max_dim > 0 && (hi + denom - 1) / denom > max_dim) {
            jpeg_destroy_decompress(cinfo);
            return -6;                              // can't fit: host path
        }
        cinfo->scale_num = 1;
        cinfo->scale_denom = static_cast<unsigned>(denom);
        if (fast_dct) cinfo->dct_method = JDCT_IFAST;
    }
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

// Shared decode driver: setjmp frame + DecodeCtx lifecycle.  on_success is
// called with the decoded pixels while ctx is live; its return value is
// passed through.
template <typename Fn>
int with_decoded(const uint8_t* data, int len, int min_size, int max_dim,
                 int fast_dct, Fn on_success) {
    DecodeCtx* const ctx = new DecodeCtx();
    ctx->cinfo.err = jpeg_std_error(&ctx->jerr.mgr);
    ctx->jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(ctx->jerr.env)) {
        jpeg_destroy_decompress(&ctx->cinfo);
        delete ctx;
        return -2;                                  // corrupt / unsupported
    }
    int rc = decode_jpeg_into(ctx, data, len, min_size, max_dim, fast_dct);
    if (rc == 0) rc = on_success(ctx);
    delete ctx;
    return rc;
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
    return with_decoded(data, len, 0, 0, 0, [&](DecodeCtx* ctx) {
        resize_rgb8(ctx->pixels.data(), ctx->h, ctx->w, out_size, out_size,
                    out);
        return 0;
    });
}

// FAST ingest: DCT-domain scaled decode (min-dim kept >= out_size where
// possible) followed by the same Pillow-semantics resample from the much
// smaller scaled image.  Host work drops ~3-4x vs the parity path; pixels
// differ slightly from PIL's full-res transform (documented fast mode).
int sicz_decode_jpeg_resize_fast(const uint8_t* data, int len, int out_size,
                                 int fast_dct, uint8_t* out) {
    if (!data || len <= 0 || out_size <= 0 || !out) return -1;
    return with_decoded(data, len, out_size, 0, fast_dct,
                        [&](DecodeCtx* ctx) {
        resize_rgb8(ctx->pixels.data(), ctx->h, ctx->w, out_size, out_size,
                    out);
        return 0;
    });
}

// FASTEST ingest: scaled decode only — NO host resample.  The scaled
// image lands top-left in the caller's (pad, pad, 3) buffer (only valid
// rows are written — the device resample's weights are exactly zero
// beyond the true extent, so the rest is don't-care) with its true dims
// in (*out_h, *out_w); the device finishes the job with the
// triangle-resample matmul kernel (ops/image.resize_normalize) fused
// ahead of normalization.  Returns -6 when the scaled decode cannot fit
// the pad box (extreme aspect ratio) — caller takes the host-resize path.
int sicz_decode_jpeg_scaled(const uint8_t* data, int len, int min_size,
                            int pad, int fast_dct, uint8_t* out,
                            int* out_h, int* out_w) {
    if (!data || len <= 0 || min_size <= 0 || pad < min_size || !out ||
        !out_h || !out_w)
        return -1;
    return with_decoded(data, len, min_size, pad, fast_dct,
                        [&](DecodeCtx* ctx) {
        if (ctx->h > pad || ctx->w > pad) return -6;   // never overrun `out`
        for (int y = 0; y < ctx->h; y++)
            std::memcpy(out + static_cast<size_t>(y) * pad * 3,
                        ctx->pixels.data() + static_cast<size_t>(y) * ctx->w * 3,
                        static_cast<size_t>(ctx->w) * 3);
        *out_h = ctx->h;
        *out_w = ctx->w;
        return 0;
    });
}

}  // extern "C"
