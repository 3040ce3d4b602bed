// Native image encoding with a C ABI for ctypes.
//
// Counterpart of the reference's writePPM (Image.cpp:11-31) and its
// ffmpeg shell-out for PNG conversion (RaytracingEngine.cpp:317-318):
// a P6 PPM writer with the identical byte layout, and an in-process PNG
// (RGB8) encoder using zlib — no subprocess.

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

inline void put_u32_be(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back(static_cast<uint8_t>(v >> 24));
  out.push_back(static_cast<uint8_t>(v >> 16));
  out.push_back(static_cast<uint8_t>(v >> 8));
  out.push_back(static_cast<uint8_t>(v));
}

void put_chunk(std::vector<uint8_t>& out, const char tag[4],
               const uint8_t* payload, size_t n) {
  put_u32_be(out, static_cast<uint32_t>(n));
  size_t tag_pos = out.size();
  out.insert(out.end(), tag, tag + 4);
  out.insert(out.end(), payload, payload + n);
  uLong crc = crc32(0L, Z_NULL, 0);
  crc = crc32(crc, out.data() + tag_pos, static_cast<uInt>(4 + n));
  put_u32_be(out, static_cast<uint32_t>(crc));
}

}  // namespace

extern "C" {

// Write a binary P6 PPM: header "P6\n{w} {h}\n255\n" + raw RGB bytes
// (byte-identical to Image.cpp:18-22). Returns 0 on success.
int rte_write_ppm(const char* path, const uint8_t* rgb, int32_t w, int32_t h) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;
  std::fprintf(f, "P6\n%d %d\n255\n", w, h);
  size_t n = static_cast<size_t>(w) * h * 3;
  size_t written = std::fwrite(rgb, 1, n, f);
  int rc = std::fclose(f);
  return (written == n && rc == 0) ? 0 : 2;
}

// Encode RGB8 -> PNG (filter 0, one IDAT). Returns a malloc'd buffer the
// caller frees with rte_free; *out_len receives the size. NULL on error.
uint8_t* rte_encode_png(const uint8_t* rgb, int32_t w, int32_t h,
                        int32_t compress_level, int64_t* out_len) {
  const size_t stride = static_cast<size_t>(w) * 3;
  std::vector<uint8_t> raw;
  raw.reserve((stride + 1) * h);
  for (int32_t y = 0; y < h; ++y) {
    raw.push_back(0);  // filter: None
    raw.insert(raw.end(), rgb + y * stride, rgb + (y + 1) * stride);
  }
  uLongf comp_bound = compressBound(static_cast<uLong>(raw.size()));
  std::vector<uint8_t> comp(comp_bound);
  if (compress2(comp.data(), &comp_bound, raw.data(),
                static_cast<uLong>(raw.size()), compress_level) != Z_OK) {
    return nullptr;
  }
  comp.resize(comp_bound);

  std::vector<uint8_t> png;
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  png.insert(png.end(), sig, sig + 8);
  uint8_t ihdr[13];
  ihdr[0] = static_cast<uint8_t>(w >> 24);
  ihdr[1] = static_cast<uint8_t>(w >> 16);
  ihdr[2] = static_cast<uint8_t>(w >> 8);
  ihdr[3] = static_cast<uint8_t>(w);
  ihdr[4] = static_cast<uint8_t>(h >> 24);
  ihdr[5] = static_cast<uint8_t>(h >> 16);
  ihdr[6] = static_cast<uint8_t>(h >> 8);
  ihdr[7] = static_cast<uint8_t>(h);
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type RGB
  ihdr[10] = 0;  // compression
  ihdr[11] = 0;  // filter
  ihdr[12] = 0;  // interlace
  put_chunk(png, "IHDR", ihdr, sizeof(ihdr));
  put_chunk(png, "IDAT", comp.data(), comp.size());
  put_chunk(png, "IEND", nullptr, 0);

  uint8_t* out = static_cast<uint8_t*>(std::malloc(png.size()));
  if (!out) return nullptr;
  std::memcpy(out, png.data(), png.size());
  *out_len = static_cast<int64_t>(png.size());
  return out;
}

void rte_free(void* p) { std::free(p); }

}  // extern "C"
