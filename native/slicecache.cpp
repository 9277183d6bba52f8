// Native slice-cache batch assembler.
//
// The TPU input pipeline needs to assemble thousands of normalized,
// center-cropped complex64 slices per second — Python/h5py tops out far
// below HBM feed rates because of per-slice Python overhead and the h5py
// GIL. This library serves batches out of a memory-mapped contiguous cache
// file (written by data/native_cache.py) with OpenMP-parallel assembly:
//
//   cache file layout:
//     [int64 magic][int64 n_slices][int64 C][int64 H][int64 W]
//     [float32 data: n_slices * C * H * W]   (already normalized to [0,1])
//
//   assemble_batch(): for each requested slice index, center-crop-or-pad
//   to (crop_h, crop_w) and write interleaved complex64 (imag = 0, the
//   live DICOM data is real-valued) into the caller's batch buffer.
//
// Exposed with a plain C ABI for ctypes (no pybind11 dependency).
//
// Replaces the per-item h5py reads of the reference input path
// (paired_dataset.py:55-73) for the high-throughput training case.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr int64_t kMagic = 0x53414e43414348ll;  // "SANCACH"

struct Cache {
  int fd = -1;
  size_t bytes = 0;
  const char* base = nullptr;
  int64_t n = 0, c = 0, h = 0, w = 0;
  const float* data = nullptr;
};

}  // namespace

extern "C" {

void* cache_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  const int64_t* hdr = static_cast<const int64_t*>(base);
  if (hdr[0] != kMagic) {
    munmap(base, st.st_size);
    ::close(fd);
    return nullptr;
  }
  // a truncated copy keeps a valid header (it sits at byte 0) but maps
  // fewer data pages than the header promises; reading past the mapping
  // is SIGBUS inside the OpenMP loop — reject it here instead. The dim
  // product is computed with overflow checks: a corrupted header with
  // huge dims would otherwise wrap `need` negative and slip past the
  // size comparison, resurrecting the SIGBUS this guard prevents.
  bool bad = hdr[1] <= 0 || hdr[2] <= 0 || hdr[3] <= 0 || hdr[4] <= 0;
  int64_t elems = 1;
  for (int i = 1; i <= 4 && !bad; ++i)
    bad = __builtin_mul_overflow(elems, hdr[i], &elems);
  int64_t need = 0;
  bad = bad ||
        __builtin_mul_overflow(elems, static_cast<int64_t>(sizeof(float)),
                               &need) ||
        __builtin_add_overflow(need,
                               static_cast<int64_t>(5 * sizeof(int64_t)),
                               &need);
  if (bad || st.st_size < need) {
    munmap(base, st.st_size);
    ::close(fd);
    return nullptr;
  }
  Cache* cache = new Cache();
  cache->fd = fd;
  cache->bytes = st.st_size;
  cache->base = static_cast<const char*>(base);
  cache->n = hdr[1];
  cache->c = hdr[2];
  cache->h = hdr[3];
  cache->w = hdr[4];
  cache->data = reinterpret_cast<const float*>(cache->base + 5 * sizeof(int64_t));
  return cache;
}

int64_t cache_num_slices(void* handle) {
  return handle ? static_cast<Cache*>(handle)->n : -1;
}

void cache_shape(void* handle, int64_t* chw) {
  Cache* cache = static_cast<Cache*>(handle);
  chw[0] = cache->c;
  chw[1] = cache->h;
  chw[2] = cache->w;
}

// out: [batch, C, crop_h, crop_w] complex64 (float32 pairs, imag zeroed).
// Returns 0 on success.
int cache_assemble_batch(void* handle, const int64_t* indices, int64_t batch,
                         int64_t crop_h, int64_t crop_w, float* out) {
  Cache* cache = static_cast<Cache*>(handle);
  if (!cache) return 1;
  const int64_t C = cache->c, H = cache->h, W = cache->w;
  const int64_t out_plane = crop_h * crop_w;
  const int64_t out_slice = C * out_plane;

  // center crop-or-pad bounds (reference paired_dataset.py:8-29 semantics)
  const int64_t src_h0 = crop_h <= H ? (H - crop_h) / 2 : 0;
  const int64_t dst_h0 = crop_h <= H ? 0 : (crop_h - H) / 2;
  const int64_t copy_h = crop_h <= H ? crop_h : H;
  const int64_t src_w0 = crop_w <= W ? (W - crop_w) / 2 : 0;
  const int64_t dst_w0 = crop_w <= W ? 0 : (crop_w - W) / 2;
  const int64_t copy_w = crop_w <= W ? crop_w : W;

  int bad = 0;
#pragma omp parallel for schedule(dynamic) reduction(| : bad)
  for (int64_t b = 0; b < batch; ++b) {
    const int64_t idx = indices[b];
    if (idx < 0 || idx >= cache->n) {
      bad |= 1;
      continue;
    }
    const float* src = cache->data + idx * C * H * W;
    float* dst = out + b * out_slice * 2;  // *2: complex64 interleave
    std::memset(dst, 0, sizeof(float) * out_slice * 2);
    for (int64_t ch = 0; ch < C; ++ch) {
      const float* splane = src + ch * H * W;
      float* dplane = dst + ch * out_plane * 2;
      for (int64_t r = 0; r < copy_h; ++r) {
        const float* srow = splane + (src_h0 + r) * W + src_w0;
        float* drow = dplane + ((dst_h0 + r) * crop_w + dst_w0) * 2;
        for (int64_t col = 0; col < copy_w; ++col) {
          drow[col * 2] = srow[col];  // real; imag stays 0
        }
      }
    }
  }
  return bad;
}

void cache_close(void* handle) {
  Cache* cache = static_cast<Cache*>(handle);
  if (!cache) return;
  munmap(const_cast<char*>(cache->base), cache->bytes);
  ::close(cache->fd);
  delete cache;
}

}  // extern "C"
