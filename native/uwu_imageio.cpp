// uwu_imageio — native image-decoding runtime for uwudiff_tpu.
//
// GIL-free JPEG/PNG decode + aspect-preserving resize + center-crop for
// the pixel-space training path (LocalImageDataset). PIL decode in the
// Python loop stalls the train step at high throughput; this pool
// decodes and preprocesses in C++ worker threads while the device
// computes, emitting train-ready [B, H, W, 3] float32 batches in
// [-1, 1] (the `vae_image_preprocess` convention).
//
// Pipeline per image (mirrors `data/utils.py::resize_and_crop_image`):
//   decode (libjpeg / libpng) -> RGB8
//   scale = max(tw/w, th/h); bilinear resize with area prefilter on
//   minification (anti-aliased, PIL-comparable on natural images)
//   center-crop to (th, tw) -> float32 /127.5 - 1
//
// C ABI (ctypes-friendly):
//   uwu_img_probe(path, &w, &h)            -> 0 ok (dims only)
//   uwu_img_load(path, th, tw, dst)        -> one image, [th,tw,3] f32
//   uwu_imgload_start(paths, n, th, tw, bs, threads) -> ring loader
//   uwu_imgload_next(loader, dst)          -> next [bs,th,tw,3] batch
//   uwu_imgload_stop(loader)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // [h, w, 3]
};

// --- JPEG ---------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr pub;
  std::jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  std::longjmp(err->jump, 1);
}

// When the caller will aspect-fill to (th, tw), the IDCT can do the
// first (and most expensive) part of the downscale for free: libjpeg
// decodes at any M/8 scale, so pick the smallest M whose output still
// covers the resize target (n/8 >= max(tw/w0, th/h0)). th=tw=0 decodes
// at native size. Smooth-content accuracy is within the float resize's
// own filter tolerance (tests pin both vs PIL).
void set_jpeg_scale(jpeg_decompress_struct* cinfo, int th, int tw) {
  if (th <= 0 || tw <= 0) return;
  double f = std::max(double(tw) / cinfo->image_width,
                      double(th) / cinfo->image_height);
  if (f >= 1.0) return;  // magnification: decode native
  int num = std::min(8, std::max(1, int(std::ceil(8.0 * f))));
  cinfo->scale_num = num;
  cinfo->scale_denom = 8;
}

bool decode_jpeg(FILE* f, Image* out, int th = 0, int tw = 0) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  set_jpeg_scale(&cinfo, th, tw);
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// --- PNG (libpng16 simplified API) --------------------------------

bool decode_png(const char* path, Image* out) {
  png_image img;
  std::memset(&img, 0, sizeof(img));
  img.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&img, path)) return false;
  img.format = PNG_FORMAT_RGB;
  out->w = img.width;
  out->h = img.height;
  out->rgb.resize(PNG_IMAGE_SIZE(img));
  if (!png_image_finish_read(&img, nullptr, out->rgb.data(), 0, nullptr)) {
    png_image_free(&img);
    return false;
  }
  return true;
}

bool decode_image(const char* path, Image* out, int th = 0, int tw = 0) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = std::fread(magic, 1, 8, f);
  bool ok = false;
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
    std::rewind(f);
    ok = decode_jpeg(f, out, th, tw);
    std::fclose(f);
  } else if (got >= 8 && std::memcmp(magic, "\x89PNG\r\n\x1a\n", 8) == 0) {
    std::fclose(f);
    ok = decode_png(path, out);
  } else {
    std::fclose(f);
  }
  return ok;
}

// --- resize + crop + normalize ------------------------------------

// Area-prefiltered bilinear (triangle filter whose support scales with
// the minification factor — PIL-style anti-aliasing; pure bilinear on
// magnification), separable, with PRECOMPUTED normalized tap tables:
// the filter weights depend only on the output coordinate, so they are
// built once per axis and the per-pixel inner loops are pure float
// multiply-adds over contiguous taps (the previous version recomputed
// floor/abs/div in doubles for every pixel — 2-3x slower than PIL).
struct TapTable {
  int ntaps = 0;                 // taps per output sample (uniform)
  std::vector<int> start;        // [dst] first CLAMPED source index
  std::vector<float> w;          // [dst * ntaps] normalized weights
};

TapTable build_taps(int src_n, int dst_n) {
  TapTable t;
  const double s = double(src_n) / dst_n;  // source pixels per output
  const double support = std::max(1.0, s);
  // x in [floor(c - support + .5), floor(c + support + .5)] inclusive
  t.ntaps = int(2.0 * support + 1.0) + 1;
  t.start.resize(dst_n);
  t.w.assign(size_t(dst_n) * t.ntaps, 0.0f);
  for (int x = 0; x < dst_n; ++x) {
    const double c = (x + 0.5) * s - 0.5;
    const int x0 = int(std::floor(c - support + 0.5));
    const int x1 = int(std::floor(c + support + 0.5));
    // fold border-clamped taps onto the edge entries so the inner loop
    // never branches: accumulate weight per CLAMPED index
    const int s0 = std::clamp(x0, 0, src_n - 1);
    t.start[x] = s0;
    double wsum = 0.0;
    float* row = &t.w[size_t(x) * t.ntaps];
    for (int xx = x0; xx <= x1; ++xx) {
      const double wgt = std::max(0.0, 1.0 - std::abs((xx - c) / support));
      if (wgt <= 0.0) continue;
      const int xs = std::clamp(xx, 0, src_n - 1);
      row[xs - s0] += float(wgt);
      wsum += wgt;
    }
    const float inv = float(1.0 / std::max(wsum, 1e-12));
    for (int k = 0; k < t.ntaps; ++k) row[k] *= inv;
  }
  return t;
}

void resize_rgb(const Image& src, int th, int tw, std::vector<float>* out) {
  double scale = std::max(double(tw) / src.w, double(th) / src.h);
  int rw = std::max(tw, int(std::lround(src.w * scale)));
  int rh = std::max(th, int(std::lround(src.h * scale)));

  const TapTable tx = build_taps(src.w, rw);
  const TapTable ty = build_taps(src.h, rh);

  // horizontal pass: [src.h, src.w, 3] u8 -> [src.h, rw, 3] f32
  std::vector<float> tmp(size_t(rw) * src.h * 3);
  for (int y = 0; y < src.h; ++y) {
    const uint8_t* srow = &src.rgb[size_t(y) * src.w * 3];
    float* drow = &tmp[size_t(y) * rw * 3];
    for (int x = 0; x < rw; ++x) {
      const float* w = &tx.w[size_t(x) * tx.ntaps];
      const uint8_t* p = srow + size_t(tx.start[x]) * 3;
      const int kmax = std::min(tx.ntaps, src.w - tx.start[x]);
      float a0 = 0, a1 = 0, a2 = 0;
      for (int k = 0; k < kmax; ++k) {
        const float wk = w[k];
        a0 += wk * p[3 * k + 0];
        a1 += wk * p[3 * k + 1];
        a2 += wk * p[3 * k + 2];
      }
      drow[3 * x + 0] = a0;
      drow[3 * x + 1] = a1;
      drow[3 * x + 2] = a2;
    }
  }

  // vertical pass fused with center-crop + [-1, 1] normalize: only the
  // cropped rows/cols are ever produced
  const int ox = (rw - tw) / 2;
  const int oy = (rh - th) / 2;
  out->resize(size_t(th) * tw * 3);
  for (int y = 0; y < th; ++y) {
    const int ry = y + oy;
    const float* w = &ty.w[size_t(ry) * ty.ntaps];
    const int ys = ty.start[ry];
    const int kmax = std::min(ty.ntaps, src.h - ys);
    float* drow = &(*out)[size_t(y) * tw * 3];
    const float* base = &tmp[(size_t(ys) * rw + ox) * 3];
    const int n = tw * 3;
    std::memset(drow, 0, size_t(n) * sizeof(float));
    for (int k = 0; k < kmax; ++k) {  // row-major: contiguous axpy
      const float wk = w[k];
      if (wk == 0.0f) continue;
      const float* srow = base + size_t(k) * rw * 3;
      for (int i = 0; i < n; ++i) drow[i] += wk * srow[i];
    }
    for (int i = 0; i < n; ++i)  // clamp: float tap sums carry ~1e-7
      drow[i] = std::min(
          1.0f, std::max(-1.0f, drow[i] * (1.0f / 127.5f) - 1.0f));
  }
}

bool load_one(const char* path, int th, int tw, float* dst) {
  Image img;
  if (!decode_image(path, &img, th, tw)) return false;
  std::vector<float> out;
  resize_rgb(img, th, tw, &out);
  std::memcpy(dst, out.data(), out.size() * sizeof(float));
  return true;
}

// --- in-memory decode (tar-shard / webdataset members) --------------

bool decode_image_mem(const uint8_t* buf, size_t len, Image* out,
                      int th = 0, int tw = 0) {
  if (len >= 3 && buf[0] == 0xFF && buf[1] == 0xD8) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jump)) {
      jpeg_destroy_decompress(&cinfo);
      return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), (unsigned long)len);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    set_jpeg_scale(&cinfo, th, tw);
    jpeg_start_decompress(&cinfo);
    out->w = cinfo.output_width;
    out->h = cinfo.output_height;
    out->rgb.resize(size_t(out->w) * out->h * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
      uint8_t* row =
          out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
      jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return true;
  }
  if (len >= 8 && std::memcmp(buf, "\x89PNG\r\n\x1a\n", 8) == 0) {
    png_image img;
    std::memset(&img, 0, sizeof(img));
    img.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_memory(&img, buf, len)) return false;
    img.format = PNG_FORMAT_RGB;
    out->w = img.width;
    out->h = img.height;
    out->rgb.resize(PNG_IMAGE_SIZE(img));
    if (!png_image_finish_read(&img, nullptr, out->rgb.data(), 0, nullptr)) {
      png_image_free(&img);
      return false;
    }
    return true;
  }
  return false;
}

// --- threaded batch ring (same scheme as uwu_dataio's BatchLoader) --

struct ImgBatch {
  std::vector<float> data;
  bool ok = true;
};

struct ImgLoader {
  std::vector<std::string> paths;
  int th = 0, tw = 0, batch_size = 0;
  size_t img_floats() const { return size_t(th) * tw * 3; }
  size_t n_batches() const { return paths.size() / batch_size; }

  std::map<size_t, ImgBatch> ring;
  size_t ring_cap = 4;
  size_t consume_cursor = 0;
  std::mutex mu;
  std::condition_variable cv_put, cv_get;
  std::atomic<bool> stop{false};
  std::atomic<size_t> next_batch{0};
  std::vector<std::thread> workers;

  void worker() {
    while (!stop.load()) {
      size_t b = next_batch.fetch_add(1);
      if (b >= n_batches()) break;
      ImgBatch batch;
      batch.data.resize(img_floats() * batch_size);
      for (int i = 0; i < batch_size; ++i) {
        const auto& p = paths[b * batch_size + i];
        if (!load_one(p.c_str(), th, tw,
                      batch.data.data() + i * img_floats()))
          batch.ok = false;
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_put.wait(lk, [&] {
        return b < consume_cursor + ring_cap || stop.load();
      });
      if (stop.load()) break;
      ring.emplace(b, std::move(batch));
      cv_get.notify_all();
    }
  }
};

}  // namespace

extern "C" {

int uwu_img_probe(const char* path, int* w, int* h) {
  Image img;  // full decode; probe is a test/debug helper, not hot
  if (!decode_image(path, &img)) return -1;
  *w = img.w;
  *h = img.h;
  return 0;
}

int uwu_img_load(const char* path, int th, int tw, float* dst) {
  return load_one(path, th, tw, dst) ? 0 : -1;
}

// decode+preprocess from an in-memory buffer (tar members etc.)
int uwu_img_load_mem(const uint8_t* buf, int64_t len, int th, int tw,
                     float* dst) {
  Image img;
  if (!decode_image_mem(buf, size_t(len), &img, th, tw)) return -1;
  std::vector<float> out;
  resize_rgb(img, th, tw, &out);
  std::memcpy(dst, out.data(), out.size() * sizeof(float));
  return 0;
}

void* uwu_imgload_start(const char** paths, int n, int th, int tw,
                        int batch_size, int n_threads) {
  auto* il = new ImgLoader();
  il->paths.assign(paths, paths + n);
  il->th = th;
  il->tw = tw;
  il->batch_size = batch_size;
  for (int t = 0; t < n_threads; ++t)
    il->workers.emplace_back([il] { il->worker(); });
  return il;
}

// blocking pop of the NEXT batch in path order; 0 ok, 1 exhausted,
// -1 a decode in the batch failed (batch data still written)
int uwu_imgload_next(void* loader, float* dst) {
  auto* il = static_cast<ImgLoader*>(loader);
  std::unique_lock<std::mutex> lk(il->mu);
  if (il->consume_cursor >= il->n_batches()) return 1;
  size_t want = il->consume_cursor;
  il->cv_get.wait(lk, [&] {
    return il->ring.count(want) > 0 || il->stop.load();
  });
  if (il->stop.load() && il->ring.count(want) == 0) return 1;
  ImgBatch b = std::move(il->ring.at(want));
  il->ring.erase(want);
  il->consume_cursor = want + 1;
  il->cv_put.notify_all();
  lk.unlock();
  std::memcpy(dst, b.data.data(), b.data.size() * sizeof(float));
  return b.ok ? 0 : -1;
}

void uwu_imgload_stop(void* loader) {
  auto* il = static_cast<ImgLoader*>(loader);
  il->stop.store(true);
  il->cv_put.notify_all();
  il->cv_get.notify_all();
  for (auto& w : il->workers)
    if (w.joinable()) w.join();
  delete il;
}

}  // extern "C"
