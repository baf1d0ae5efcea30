// Threaded batch JPEG decoder for the per-spot patch caches.
//
// The reference decodes spot patches one PIL call at a time inside
// Dataset.__getitem__ (image_datasets.py:113-122); a grid array is ~3k
// JPEGs, so decode dominates the host side of image training. This codec
// decodes a whole batch with libjpeg across a thread pool directly into the
// caller's (n, p, p, 3) uint8 buffer, skipping per-image Python/PIL
// overhead. Python falls back to PIL when the toolchain or libjpeg is
// missing, or when any file is not an exact (p, p, 3) JPEG.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <thread>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void err_exit(j_common_ptr cinfo) {
  ErrMgr* e = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// Decode one JPEG file; require an exact (p x p x 3) image.
bool decode_one(const char* path, int64_t p, uint8_t* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if (static_cast<int64_t>(cinfo.output_width) != p ||
      static_cast<int64_t>(cinfo.output_height) != p ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + static_cast<int64_t>(cinfo.output_scanline) * p * 3;
    JSAMPROW rows[1] = {row};
    jpeg_read_scanlines(&cinfo, rows, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

}  // namespace

extern "C" {

// Decode n JPEG files into out (n, p, p, 3) uint8, row-major.
// n_threads <= 0 means hardware concurrency. Returns 0 on success, 1 if any
// file failed to open/decode or had unexpected dimensions (buffer contents
// are then undefined -- caller falls back to PIL).
int jpeg_decode_batch(const char** paths, int64_t n, int64_t p, uint8_t* out,
                      int n_threads) {
  if (n <= 0) return 0;
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  if (static_cast<int64_t>(n_threads) > n) n_threads = static_cast<int>(n);

  std::atomic<int64_t> next(0);
  std::atomic<int> failed(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n || failed.load(std::memory_order_relaxed)) return;
      if (!decode_one(paths[i], p, out + i * p * p * 3)) failed.store(1);
    }
  };
  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> ts;
    ts.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) ts.emplace_back(worker);
    for (auto& t : ts) t.join();
  }
  return failed.load() ? 1 : 0;
}

}  // extern "C"
