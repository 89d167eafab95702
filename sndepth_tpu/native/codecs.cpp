// Native image codecs for the host data pipeline.
//
// The reference rides torch's C++ DataLoader workers for decode
// throughput; this provides the equivalent for the TPU input pipeline: a
// libpng/libjpeg decoder with a std::thread batch front-end, exposed via
// a C ABI for ctypes (no pybind11 in this image). Python fallbacks (PIL /
// cv2) remain behind sndepth_tpu/native/__init__.py.
//
// Exact-decode guarantees: PNG is lossless (byte-exact vs any compliant
// decoder); 16-bit PNG is read with the full libpng API (no simplified-
// API gamma surprises) and returned host-endian.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <csetjmp>
#include <thread>
#include <vector>

#include <png.h>
#include <jpeglib.h>

namespace {

struct JErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jerr_exit(j_common_ptr cinfo) {
  JErr* e = reinterpret_cast<JErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool is_png(const unsigned char* d, size_t n) {
  return n >= 8 && !png_sig_cmp(d, 0, 8);
}

bool is_jpeg(const unsigned char* d, size_t n) {
  return n >= 2 && d[0] == 0xFF && d[1] == 0xD8;
}

std::vector<unsigned char> slurp(const char* path) {
  std::vector<unsigned char> buf;
  FILE* f = std::fopen(path, "rb");
  if (!f) return buf;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n > 0) {
    buf.resize(static_cast<size_t>(n));
    if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) buf.clear();
  }
  std::fclose(f);
  return buf;
}

struct MemReader {
  const unsigned char* data;
  size_t size;
  size_t pos;
};

void png_mem_read(png_structp png, png_bytep out, png_size_t want) {
  MemReader* r = static_cast<MemReader*>(png_get_io_ptr(png));
  if (r->pos + want > r->size) {
    png_error(png, "short read");
    return;
  }
  std::memcpy(out, r->data + r->pos, want);
  r->pos += want;
}

// Decode PNG. out may be null (probe). When exp_h >= 0, the decoded
// dims/bits must equal (exp_h, exp_w, exp_c, exp_bits) — checked BEFORE
// any pixel is written (the caller's buffer is sized for them).
// Returns 0 ok, <0 error.
int decode_png(const unsigned char* data, size_t size, void* out,
               int* h, int* w, int* c, int* bits,
               int exp_h = -1, int exp_w = -1, int exp_c = -1,
               int exp_bits = -1) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                           nullptr, nullptr, nullptr);
  if (!png) return -2;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -2;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -3;
  }
  MemReader r{data, size, 0};
  png_set_read_fn(png, &r, png_mem_read);
  png_read_info(png, info);

  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  int depth = png_get_bit_depth(png, info);
  int ctype = png_get_color_type(png, info);

  if (ctype == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (ctype == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (depth == 16) {
#if defined(PNG_READ_SWAP_SUPPORTED)
    png_set_swap(png);   // big-endian file -> host little-endian
#endif
  }
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  int obits = png_get_bit_depth(png, info);
  *h = static_cast<int>(height);
  *w = static_cast<int>(width);
  *c = channels;
  *bits = obits;
  if (!out) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 0;
  }
  if (exp_h >= 0 && (*h != exp_h || *w != exp_w || *c != exp_c ||
                     obits != exp_bits)) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -5;   // dims changed since probe / mixed-size batch
  }
  size_t stride = static_cast<size_t>(width) * channels * (obits / 8);
  std::vector<png_bytep> rows(height);
  for (png_uint_32 i = 0; i < height; ++i)
    rows[i] = static_cast<png_bytep>(out) + i * stride;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// Decode baseline/progressive JPEG to 8-bit RGB (or gray). Dim check as
// in decode_png — before any scanline lands in the caller's buffer.
int decode_jpeg(const unsigned char* data, size_t size, unsigned char* out,
                int* h, int* w, int* c,
                int exp_h = -1, int exp_w = -1, int exp_c = -1) {
  jpeg_decompress_struct cinfo;
  JErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jerr_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  *h = static_cast<int>(cinfo.output_height);
  *w = static_cast<int>(cinfo.output_width);
  *c = cinfo.output_components;
  if (!out) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  if (exp_h >= 0 && (*h != exp_h || *w != exp_w || *c != exp_c)) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -5;
  }
  size_t stride =
      static_cast<size_t>(cinfo.output_width) * cinfo.output_components;
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // namespace

extern "C" {

// Probe dims/dtype: fills h, w, c, bits (8 or 16). 0 ok.
int snd_probe(const char* path, int* h, int* w, int* c, int* bits) {
  std::vector<unsigned char> buf = slurp(path);
  if (buf.empty()) return -1;
  if (is_png(buf.data(), buf.size()))
    return decode_png(buf.data(), buf.size(), nullptr, h, w, c, bits);
  if (is_jpeg(buf.data(), buf.size())) {
    *bits = 8;
    return decode_jpeg(buf.data(), buf.size(), nullptr, h, w, c);
  }
  return -4;
}

// Decode into caller buffer of h*w*c*(bits/8) bytes (from snd_probe).
// Dims are validated against the file BEFORE any pixel is written.
int snd_decode(const char* path, void* out, int h, int w, int c, int bits) {
  std::vector<unsigned char> buf = slurp(path);
  if (buf.empty()) return -1;
  int hh, ww, cc, bb;
  if (is_png(buf.data(), buf.size()))
    return decode_png(buf.data(), buf.size(), out, &hh, &ww, &cc, &bb,
                      h, w, c, bits);
  if (is_jpeg(buf.data(), buf.size())) {
    if (bits != 8) return -5;
    return decode_jpeg(buf.data(), buf.size(),
                       static_cast<unsigned char*>(out), &hh, &ww, &cc,
                       h, w, c);
  }
  return -4;
}

// Single-read decode: C allocates the pixel buffer (free with snd_free)
// and reports dims — avoids the probe-then-decode double file read.
int snd_decode_alloc(const char* path, void** out, int* h, int* w, int* c,
                     int* bits) {
  std::vector<unsigned char> buf = slurp(path);
  if (buf.empty()) return -1;
  int rc;
  if (is_png(buf.data(), buf.size())) {
    rc = decode_png(buf.data(), buf.size(), nullptr, h, w, c, bits);
    if (rc) return rc;
    size_t n = static_cast<size_t>(*h) * *w * *c * (*bits / 8);
    void* p = std::malloc(n);
    if (!p) return -6;
    rc = decode_png(buf.data(), buf.size(), p, h, w, c, bits);
    if (rc) {
      std::free(p);
      return rc;
    }
    *out = p;
    return 0;
  }
  if (is_jpeg(buf.data(), buf.size())) {
    *bits = 8;
    rc = decode_jpeg(buf.data(), buf.size(), nullptr, h, w, c);
    if (rc) return rc;
    size_t n = static_cast<size_t>(*h) * *w * *c;
    void* p = std::malloc(n);
    if (!p) return -6;
    rc = decode_jpeg(buf.data(), buf.size(),
                     static_cast<unsigned char*>(p), h, w, c);
    if (rc) {
      std::free(p);
      return rc;
    }
    *out = p;
    return 0;
  }
  return -4;
}

void snd_free(void* p) { std::free(p); }

// Threaded batch decode of n same-shaped images into out (n, h, w, c).
// Returns 0 if every file decoded, else -(1 + index of first failure).
int snd_decode_batch(const char** paths, int n, void* out, int h, int w,
                     int c, int bits, int nthreads) {
  if (nthreads < 1) nthreads = 1;
  if (nthreads > n) nthreads = n;
  size_t item = static_cast<size_t>(h) * w * c * (bits / 8);
  std::vector<int> rcs(static_cast<size_t>(n), 0);
  auto work = [&](int t) {
    for (int i = t; i < n; i += nthreads) {
      rcs[static_cast<size_t>(i)] = snd_decode(
          paths[i], static_cast<char*>(out) + item * i, h, w, c, bits);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < nthreads; ++t) threads.emplace_back(work, t);
  for (auto& th : threads) th.join();
  for (int i = 0; i < n; ++i)
    if (rcs[static_cast<size_t>(i)]) return -(1 + i);
  return 0;
}

}  // extern "C"
