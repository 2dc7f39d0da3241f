// Native data-IO runtime: JPEG/PNG decode, bilinear resize + center crop,
// PNG encode.  The host-side hot path of dataset loading and image saving
// (the role torch's native DataLoader/torchvision codecs play for the
// reference — here first-class, reference src/dataset/dataset.py:8-41,
// src/utils/model_utils.py:24-28).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// All functions return 0 on success, negative error codes otherwise.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <vector>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------- decode
struct sdbl_error_mgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

static void sdbl_jpeg_error_exit(j_common_ptr cinfo) {
  sdbl_error_mgr* err = reinterpret_cast<sdbl_error_mgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG in memory to RGB8. Caller passes a buffer of out_cap bytes;
// on success *out_w/*out_h are set and the pixel data (h*w*3) is written.
int sdbl_decode_jpeg(const uint8_t* data, int64_t size, uint8_t* out,
                     int64_t out_cap, int32_t* out_w, int32_t* out_h) {
  jpeg_decompress_struct cinfo;
  sdbl_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = sdbl_jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(size));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, h = cinfo.output_height;
  if (static_cast<int64_t>(w) * h * 3 > out_cap) {
    jpeg_destroy_decompress(&cinfo);
    return -4;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + static_cast<int64_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out_w = w;
  *out_h = h;
  return 0;
}

struct PngReadCtx {
  const uint8_t* data;
  int64_t size;
  int64_t pos;
};

static void png_mem_read(png_structp png, png_bytep out, png_size_t n) {
  PngReadCtx* ctx = static_cast<PngReadCtx*>(png_get_io_ptr(png));
  if (ctx->pos + static_cast<int64_t>(n) > ctx->size) {
    png_error(png, "read past end");
  }
  memcpy(out, ctx->data + ctx->pos, n);
  ctx->pos += n;
}

int sdbl_decode_png(const uint8_t* data, int64_t size, uint8_t* out,
                    int64_t out_cap, int32_t* out_w, int32_t* out_h) {
  if (size < 8 || png_sig_cmp(data, 0, 8)) return -3;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -1;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -2;
  }
  PngReadCtx ctx{data, size, 0};
  png_set_read_fn(png, &ctx, png_mem_read);
  png_read_info(png, info);
  png_set_expand(png);           // palette/gray/low-bit -> 8-bit RGB(A)
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  const int w = png_get_image_width(png, info);
  const int h = png_get_image_height(png, info);
  if (png_get_channels(png, info) != 3 ||
      static_cast<int64_t>(w) * h * 3 > out_cap) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -4;
  }
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = out + static_cast<int64_t>(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  *out_w = w;
  *out_h = h;
  return 0;
}

// ----------------------------- resize (antialiased bilinear) + crop
// src: h*w*3 RGB8.  Resizes so the short side equals `size` (separable
// triangle filter with support scaled on downscale — PIL/torchvision
// BILINEAR semantics, matching the reference's Resize+CenterCrop transform,
// base_experiment.py:79-85), then center crops to size x size.
// dst must hold size*size*3 bytes.

namespace {

// Precompute, for each of n_dst output positions (offset by crop x0), the
// contributing source index range and normalized triangle weights.
struct FilterBank {
  std::vector<int> start;
  std::vector<int> count;
  std::vector<double> weights;  // flattened, max_taps per output
  int max_taps;
};

FilterBank make_filter(int n_src, int n_dst_full, int crop0, int n_out) {
  const double scale = static_cast<double>(n_dst_full) / n_src;  // dst/src
  const double inv = 1.0 / scale;
  const double support = scale < 1.0 ? inv : 1.0;  // triangle radius in src units
  FilterBank fb;
  fb.max_taps = static_cast<int>(2 * support + 2);
  fb.start.resize(n_out);
  fb.count.resize(n_out);
  fb.weights.assign(static_cast<size_t>(n_out) * fb.max_taps, 0.0);
  for (int o = 0; o < n_out; ++o) {
    const double center = (o + crop0 + 0.5) * inv - 0.5;
    int lo = static_cast<int>(center - support + 0.5 - 1);
    int hi = static_cast<int>(center + support + 0.5 + 1);
    if (lo < 0) lo = 0;
    if (hi > n_src - 1) hi = n_src - 1;
    double total = 0.0;
    int cnt = 0;
    for (int i = lo; i <= hi && cnt < fb.max_taps; ++i) {
      const double d = (i - center) * (scale < 1.0 ? scale : 1.0);
      const double wgt = d > -1.0 && d < 1.0 ? 1.0 - (d < 0 ? -d : d) : 0.0;
      if (wgt <= 0.0 && cnt == 0) {
        ++lo;
        continue;
      }
      fb.weights[static_cast<size_t>(o) * fb.max_taps + cnt] = wgt;
      total += wgt;
      ++cnt;
    }
    fb.start[o] = lo;
    fb.count[o] = cnt;
    if (total > 0) {
      for (int t = 0; t < cnt; ++t)
        fb.weights[static_cast<size_t>(o) * fb.max_taps + t] /= total;
    }
  }
  return fb;
}

}  // namespace

int sdbl_resize_center_crop(const uint8_t* src, int32_t w, int32_t h,
                            int32_t size, uint8_t* dst) {
  if (w <= 0 || h <= 0 || size <= 0) return -1;
  const double scale = static_cast<double>(size) / (w < h ? w : h);
  const int rw = static_cast<int>(w * scale + 0.5);
  const int rh = static_cast<int>(h * scale + 0.5);
  const int x0 = (rw - size) / 2;
  const int y0 = (rh - size) / 2;

  FilterBank fx = make_filter(w, rw, x0, size);
  FilterBank fy = make_filter(h, rh, y0, size);

  // Horizontal pass into a float intermediate (h x size x 3).
  std::vector<float> tmp(static_cast<size_t>(h) * size * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + static_cast<int64_t>(y) * w * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * size * 3;
    for (int x = 0; x < size; ++x) {
      double acc[3] = {0, 0, 0};
      const int s = fx.start[x], c = fx.count[x];
      const double* wts = &fx.weights[static_cast<size_t>(x) * fx.max_taps];
      for (int t = 0; t < c; ++t) {
        const uint8_t* p = row + static_cast<int64_t>(s + t) * 3;
        acc[0] += wts[t] * p[0];
        acc[1] += wts[t] * p[1];
        acc[2] += wts[t] * p[2];
      }
      trow[x * 3 + 0] = static_cast<float>(acc[0]);
      trow[x * 3 + 1] = static_cast<float>(acc[1]);
      trow[x * 3 + 2] = static_cast<float>(acc[2]);
    }
  }
  // Vertical pass.
  for (int y = 0; y < size; ++y) {
    const int s = fy.start[y], c = fy.count[y];
    const double* wts = &fy.weights[static_cast<size_t>(y) * fy.max_taps];
    uint8_t* drow = dst + static_cast<int64_t>(y) * size * 3;
    for (int x = 0; x < size * 3; ++x) {
      double acc = 0;
      for (int t = 0; t < c; ++t) {
        acc += wts[t] * tmp[static_cast<size_t>(s + t) * size * 3 + x];
      }
      const double v = acc + 0.5;
      drow[x] = static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
  }
  return 0;
}

// ----------------------------------------------------------------- encode
struct PngWriteCtx {
  std::vector<uint8_t>* buf;
};

static void png_mem_write(png_structp png, png_bytep data, png_size_t n) {
  PngWriteCtx* ctx = static_cast<PngWriteCtx*>(png_get_io_ptr(png));
  ctx->buf->insert(ctx->buf->end(), data, data + n);
}

static void png_mem_flush(png_structp) {}

// Encode RGB8 to PNG. Returns encoded size, or negative error. Two-call
// protocol: if out == nullptr, only the size is computed... PNG sizes are
// not predictable, so instead the caller passes a capacity; -4 = too small.
int64_t sdbl_encode_png(const uint8_t* rgb, int32_t w, int32_t h,
                        uint8_t* out, int64_t out_cap) {
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_write_struct(&png, nullptr);
    return -1;
  }
  std::vector<uint8_t> buf;
  buf.reserve(static_cast<size_t>(w) * h);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    return -2;
  }
  PngWriteCtx ctx{&buf};
  png_set_write_fn(png, &ctx, png_mem_write, png_mem_flush);
  png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_RGB, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_set_compression_level(png, 3);  // fast; these are bulk artifacts
  png_write_info(png, info);
  for (int y = 0; y < h; ++y) {
    png_write_row(png, const_cast<png_bytep>(rgb + static_cast<int64_t>(y) * w * 3));
  }
  png_write_end(png, info);
  png_destroy_write_struct(&png, &info);
  if (static_cast<int64_t>(buf.size()) > out_cap) return -4;
  memcpy(out, buf.data(), buf.size());
  return static_cast<int64_t>(buf.size());
}

int sdbl_version() { return 1; }

}  // extern "C"
