// afldm_tpu native data loader.
//
// The reference feeds training with torch DataLoader worker processes
// (train.py:206-212). The TPU rebuild wants the input pipeline off the
// Python thread entirely: this C++ loader decodes JPEG/PNG, bilinearly
// resizes the short side to the target resolution, center- or
// random-crops, normalizes to [-1, 1] float32 HWC, and prefetches batches
// with a worker pool into a bounded ring buffer.
//
// Plain C ABI (ctypes-friendly; no pybind11 in this build):
//   void* dl_create(const char** paths, int n_paths, int resolution,
//                   int batch, int threads, unsigned seed, int flags);
//   int   dl_next(void* handle, float* out);       // out: batch*R*R*3
//   void  dl_destroy(void* handle);
//   int   dl_decode_one(const char* path, int resolution, int flags,
//                       float* out);               // single image, R*R*3
// flags: bit0 = random crop (else center), bit1 = random hflip.
//
// Build: g++ -O3 -shared -fPIC dataloader.cpp -o libafdata.so -ljpeg -lpng
//        -lpthread

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> data;  // HWC, 8-bit
};

// ---------------------------------------------------------------- decoding

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(FILE* f, Image* out) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_expand(png);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->data.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (got >= 8 && !png_sig_cmp(magic, 0, 8)) {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok && out->w > 0 && out->h > 0;
}

// ------------------------------------------------------ resize + crop + norm

// Anti-aliased separable triangle (linear) resize, pixel-center
// convention with kernel support scaled by the downscale ratio — the
// PIL / jax.image.resize behavior (this is an anti-aliasing framework;
// plain 2-tap bilinear would alias the training data on the way in).
void resize_axis(const std::vector<float>& src, int sw, int sh, int stride_c,
                 int tlen, bool horizontal, std::vector<float>* dst) {
  // resizes one axis; src is HWC float
  int olen = horizontal ? tlen : sh;
  int owid = horizontal ? sh : tlen;
  (void)olen;
  (void)owid;
  int in_len = horizontal ? sw : sh;
  float scale = float(in_len) / tlen;
  float support = scale > 1.0f ? scale : 1.0f;
  int out_h = horizontal ? sh : tlen;
  int out_w = horizontal ? tlen : sw;
  dst->assign(size_t(out_h) * out_w * 3, 0.0f);
  // precompute taps per output index
  std::vector<std::vector<std::pair<int, float>>> taps(tlen);
  for (int o = 0; o < tlen; ++o) {
    float center = (o + 0.5f) * scale - 0.5f;
    int lo = (int)ceilf(center - support);
    int hi = (int)floorf(center + support);
    float wsum = 0.0f;
    for (int i = lo; i <= hi; ++i) {
      float d = fabsf(i - center) / support;
      if (d >= 1.0f) continue;
      float w = 1.0f - d;
      int ic = i < 0 ? 0 : (i >= in_len ? in_len - 1 : i);
      taps[o].emplace_back(ic, w);
      wsum += w;
    }
    if (wsum > 0)
      for (auto& t : taps[o]) t.second /= wsum;
  }
  for (int y = 0; y < out_h; ++y) {
    for (int x = 0; x < out_w; ++x) {
      const auto& tp = horizontal ? taps[x] : taps[y];
      float acc[3] = {0, 0, 0};
      for (const auto& [i, w] : tp) {
        const float* s = horizontal
            ? &src[(size_t(y) * sw + i) * 3]
            : &src[(size_t(i) * sw + x) * 3];
        acc[0] += w * s[0];
        acc[1] += w * s[1];
        acc[2] += w * s[2];
      }
      float* d = &(*dst)[(size_t(y) * out_w + x) * 3];
      d[0] = acc[0];
      d[1] = acc[1];
      d[2] = acc[2];
    }
  }
  (void)stride_c;
}

void resize_bilinear(const Image& src, int tw, int th,
                     std::vector<float>* dst) {
  std::vector<float> f(src.data.begin(), src.data.end());
  std::vector<float> tmp;
  resize_axis(f, src.w, src.h, 3, tw, /*horizontal=*/true, &tmp);
  resize_axis(tmp, tw, src.h, 3, th, /*horizontal=*/false, dst);
}

// Full per-image transform into out (R*R*3 float32, [-1, 1]).
bool process(const char* path, int R, int flags, std::mt19937* rng,
             float* out) {
  Image img;
  if (!decode_file(path, &img)) return false;
  // resize short side to R
  int tw, th;
  if (img.w < img.h) {
    tw = R;
    th = (int)llroundf(float(img.h) * R / img.w);
  } else {
    th = R;
    tw = (int)llroundf(float(img.w) * R / img.h);
  }
  std::vector<float> resized;
  resize_bilinear(img, tw, th, &resized);
  // crop
  int max_x = tw - R, max_y = th - R;
  int cx = max_x / 2, cy = max_y / 2;
  bool rand_crop = flags & 1;
  bool rand_flip = flags & 2;
  bool flip = false;
  if (rng) {
    if (rand_crop && max_x >= 0 && max_y >= 0) {
      cx = max_x ? (int)((*rng)() % (max_x + 1)) : 0;
      cy = max_y ? (int)((*rng)() % (max_y + 1)) : 0;
    }
    if (rand_flip) flip = ((*rng)() & 1) != 0;
  }
  for (int y = 0; y < R; ++y) {
    for (int x = 0; x < R; ++x) {
      int sxp = flip ? (cx + R - 1 - x) : (cx + x);
      const float* src = &resized[(size_t(cy + y) * tw + sxp) * 3];
      float* dst = &out[(size_t(y) * R + x) * 3];
      for (int ch = 0; ch < 3; ++ch) dst[ch] = src[ch] / 127.5f - 1.0f;
    }
  }
  return true;
}

// ------------------------------------------------------------- prefetcher

struct Loader {
  std::vector<std::string> paths;
  int R = 256, batch = 1, flags = 0;
  unsigned seed = 0;
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::queue<std::vector<float>> ready;  // each: batch*R*R*3
  size_t max_queue = 4;
  std::atomic<bool> stop{false};
  std::atomic<uint64_t> cursor{0};

  void worker(int wid) {
    std::mt19937 rng(seed * 9176 + wid);
    const size_t img_sz = size_t(R) * R * 3;
    while (!stop.load()) {
      std::vector<float> buf(img_sz * batch);
      for (int b = 0; b < batch; ++b) {
        bool ok = false;
        while (!ok && !stop.load()) {
          uint64_t i = cursor.fetch_add(1);
          const std::string& p = paths[i % paths.size()];
          ok = process(p.c_str(), R, flags, &rng, buf.data() + b * img_sz);
        }
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] { return ready.size() < max_queue || stop; });
      if (stop) return;
      ready.push(std::move(buf));
      cv_ready.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* dl_create(const char** paths, int n_paths, int resolution, int batch,
                int threads, unsigned seed, int flags) {
  if (n_paths <= 0 || resolution <= 0 || batch <= 0) return nullptr;
  Loader* L = new Loader();
  L->paths.assign(paths, paths + n_paths);
  L->R = resolution;
  L->batch = batch;
  L->flags = flags;
  L->seed = seed;
  int t = threads > 0 ? threads : 2;
  for (int i = 0; i < t; ++i)
    L->workers.emplace_back(&Loader::worker, L, i);
  return L;
}

int dl_next(void* handle, float* out) {
  Loader* L = static_cast<Loader*>(handle);
  std::vector<float> buf;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_ready.wait(lk, [&] { return !L->ready.empty() || L->stop; });
    if (L->stop) return -1;
    buf = std::move(L->ready.front());
    L->ready.pop();
    L->cv_space.notify_one();
  }
  memcpy(out, buf.data(), buf.size() * sizeof(float));
  return 0;
}

void dl_destroy(void* handle) {
  Loader* L = static_cast<Loader*>(handle);
  L->stop = true;
  L->cv_space.notify_all();
  L->cv_ready.notify_all();
  for (auto& w : L->workers) w.join();
  delete L;
}

int dl_decode_one(const char* path, int resolution, int flags, float* out) {
  std::mt19937 rng(0);
  return process(path, resolution, flags,
                 (flags & 3) ? &rng : nullptr, out) ? 0 : -1;
}

}  // extern "C"
