// Native host-pipeline core: threaded JPEG decode + resize + float conversion.
//
// The reference consumes torch's C++ DataLoader workers + PIL for the host
// side (reference: src/dataloader/dataloaderPL.py:207-216). This library is
// the TPU build's native equivalent: it decodes LLVIP/FLIR JPEG frames with
// libjpeg, converts to float32 [0,1] HWC (the ToTensor contract,
// reference: src/dataloader/dataloader.py:62-73), optionally bilinear-resizes
// to the static dataset shape, and fans the per-image work across a thread
// pool — keeping the single-controller Python process off the critical path.
//
// C ABI only; Python binds via ctypes (hallucidet_tpu/data/native.py).
// Build: native/build.sh -> native/libhctpu_loader.so

#include <cstdio>  // jpeglib.h needs FILE declared before inclusion

#include <jpeglib.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct DecodedImage {
  std::vector<uint8_t> pixels;  // HWC
  int h = 0, w = 0, c = 0;
};

// Decode one JPEG file. gray != 0 forces single-channel output.
// Returns 0 on success.
int decode_jpeg_file(const char* path, int gray, DecodedImage* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;

  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  // libjpeg's default error handler exits the process; override fatal errors
  // with setjmp-free early bailout by checking return codes below is not
  // possible for all paths, so use a custom error_exit that longjmps.
  struct ErrMgr {
    jpeg_error_mgr pub;
    jmp_buf jb;
  };
  ErrMgr em;
  cinfo.err = jpeg_std_error(&em.pub);
  em.pub.error_exit = [](j_common_ptr ci) {
    ErrMgr* m = reinterpret_cast<ErrMgr*>(ci->err);
    longjmp(m->jb, 1);
  };
  if (setjmp(em.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 2;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  // Always decode RGB; grayscale conversion below uses PIL's integer
  // ITU-R 601-2 formula so outputs match Image.convert('L') bit-for-bit
  // (the ToTensor contract the reference relies on).
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int h = static_cast<int>(cinfo.output_height);
  const int w = static_cast<int>(cinfo.output_width);
  const int c = static_cast<int>(cinfo.output_components);
  std::vector<uint8_t> rgb(static_cast<size_t>(h) * w * c);
  const int stride = w * c;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);

  out->h = h;
  out->w = w;
  if (!gray) {
    out->c = c;
    out->pixels = std::move(rgb);
  } else {
    out->c = 1;
    out->pixels.resize(static_cast<size_t>(h) * w);
    const size_t n = static_cast<size_t>(h) * w;
    for (size_t i = 0; i < n; ++i) {
      const uint32_t r = rgb[i * 3], g = rgb[i * 3 + 1], b = rgb[i * 3 + 2];
      // PIL: L = (R*299 + G*587 + B*114) / 1000, truncating
      out->pixels[i] = static_cast<uint8_t>((r * 299 + g * 587 + b * 114) / 1000);
    }
  }
  return 0;
}

// Bilinear (half-pixel) resize + /255 float conversion, HWC.
void resize_to_f32(const DecodedImage& img, float* dst, int oh, int ow) {
  const int h = img.h, w = img.w, c = img.c;
  const float inv255 = 1.0f / 255.0f;
  if (h == oh && w == ow) {
    const size_t n = static_cast<size_t>(h) * w * c;
    // true division: bit-identical to numpy float32 `x / 255.0`
    for (size_t i = 0; i < n; ++i) dst[i] = img.pixels[i] / 255.0f;
    return;
  }
  const float sy = static_cast<float>(h) / oh;
  const float sx = static_cast<float>(w) / ow;
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float ly = fy - y0;
    int y0c = y0 < 0 ? 0 : (y0 >= h ? h - 1 : y0);
    int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= h ? h - 1 : y0 + 1);
    for (int x = 0; x < ow; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      float lx = fx - x0;
      int x0c = x0 < 0 ? 0 : (x0 >= w ? w - 1 : x0);
      int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= w ? w - 1 : x0 + 1);
      for (int ch = 0; ch < c; ++ch) {
        float v00 = img.pixels[(static_cast<size_t>(y0c) * w + x0c) * c + ch];
        float v01 = img.pixels[(static_cast<size_t>(y0c) * w + x1c) * c + ch];
        float v10 = img.pixels[(static_cast<size_t>(y1c) * w + x0c) * c + ch];
        float v11 = img.pixels[(static_cast<size_t>(y1c) * w + x1c) * c + ch];
        float top = v00 * (1 - lx) + v01 * lx;
        float bot = v10 * (1 - lx) + v11 * lx;
        dst[(static_cast<size_t>(y) * ow + x) * c + ch] =
            (top * (1 - ly) + bot * ly) * inv255;
      }
    }
  }
}

}  // namespace

extern "C" {

// Load one image: decode, (maybe) resize to (h, w), write float32 HWC [0,1]
// into `out` (size h*w*(gray?1:3)). Returns 0 on success.
int hctpu_load_image_f32(const char* path, int gray, float* out, int h, int w) {
  DecodedImage img;
  int rc = decode_jpeg_file(path, gray, &img);
  if (rc != 0) return rc;
  resize_to_f32(img, out, h, w);
  return 0;
}

// Load a batch of n images in parallel into out[n, h, w, c].
// Returns 0 if every image decoded, else the first nonzero error code.
int hctpu_load_batch_f32(const char** paths, int n, int gray, float* out,
                         int h, int w, int num_threads) {
  const int c = gray ? 1 : 3;
  const size_t img_elems = static_cast<size_t>(h) * w * c;
  std::atomic<int> err{0};
  std::atomic<int> next{0};
  int nt = num_threads > 0 ? num_threads : 1;
  if (nt > n) nt = n;
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([&]() {
      while (true) {
        int i = next.fetch_add(1);
        if (i >= n) break;
        int rc = hctpu_load_image_f32(paths[i], gray, out + i * img_elems, h, w);
        if (rc != 0) {
          int expected = 0;
          err.compare_exchange_strong(expected, rc);
        }
      }
    });
  }
  for (auto& th : threads) th.join();
  return err.load();
}

int hctpu_version() { return 1; }

}  // extern "C"
