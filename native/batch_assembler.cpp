// Native batch assembler: multithreaded padded-batch construction from a
// raw uint8 image blob.
//
// The hot host-side loop of the input pipeline is "pad N variable-size
// grayscale images into one (N, H, W, 1) white-padded batch". In Python
// this is a per-image numpy slice-assign (reference pad_batch_images,
// model/utils/image.py:27-44) that single-threads at a few GB/s and stalls
// the accelerator at production batch rates. This library does the same
// assembly from a decoded-image blob (see latex_ocr_tpu/data/cache.py)
// with one worker thread per slice of the batch: memset the white
// background once, then row-copy each image into place.
//
// ABI (ctypes, see latex_ocr_tpu/data/native_batcher.py):
//   assemble_batch(blob, offsets, heights, widths, indices, n,
//                  batch_capacity, out_h, out_w, out, n_threads)
//
// All pointers are caller-owned; the function writes exactly
// batch_capacity*out_h*out_w bytes to `out`.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

void assemble_batch(const uint8_t* blob,
                    const int64_t* offsets,
                    const int32_t* heights,
                    const int32_t* widths,
                    const int32_t* indices,
                    int32_t n,
                    int32_t batch_capacity,
                    int32_t out_h,
                    int32_t out_w,
                    uint8_t* out,
                    int32_t n_threads) {
  const int64_t plane = static_cast<int64_t>(out_h) * out_w;
  std::memset(out, 255, static_cast<size_t>(batch_capacity) * plane);

  if (n_threads < 1) n_threads = 1;
  n_threads = std::min<int32_t>(n_threads, n > 0 ? n : 1);

  auto worker = [&](int32_t begin, int32_t end) {
    for (int32_t i = begin; i < end; ++i) {
      const int32_t idx = indices[i];
      const uint8_t* src = blob + offsets[idx];
      const int32_t h = std::min(heights[idx], out_h);
      const int32_t w = std::min(widths[idx], out_w);
      uint8_t* dst = out + i * plane;
      const int32_t src_w = widths[idx];
      for (int32_t r = 0; r < h; ++r) {
        std::memcpy(dst + static_cast<int64_t>(r) * out_w,
                    src + static_cast<int64_t>(r) * src_w,
                    static_cast<size_t>(w));
      }
    }
  };

  if (n_threads == 1 || n < 2) {
    worker(0, n);
    return;
  }
  std::vector<std::thread> threads;
  const int32_t chunk = (n + n_threads - 1) / n_threads;
  for (int32_t t = 0; t < n_threads; ++t) {
    const int32_t begin = t * chunk;
    const int32_t end = std::min(n, begin + chunk);
    if (begin >= end) break;
    threads.emplace_back(worker, begin, end);
  }
  for (auto& th : threads) th.join();
}

// Luma greyscale for interleaved RGB inputs: out = .299R + .587G + .114B.
// Kept native for the serving path where PIL conversion dominates.
void greyscale_rgb(const uint8_t* rgb, int64_t n_pixels, uint8_t* out) {
  for (int64_t i = 0; i < n_pixels; ++i) {
    const uint8_t r = rgb[3 * i], g = rgb[3 * i + 1], b = rgb[3 * i + 2];
    out[i] = static_cast<uint8_t>((299 * r + 587 * g + 114 * b) / 1000);
  }
}

}  // extern "C"
