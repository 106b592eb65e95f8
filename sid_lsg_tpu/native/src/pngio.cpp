// Native PNG writer: the disk-side hot path of 30k-image eval generation.
//
// Role of the per-image PIL encode/save loop in the reference
// (generate_onestep.py:300-309): PIL re-enters Python per scanline filter and
// holds the GIL; this writer streams RGB8 rows through zlib in C++ and is
// called via ctypes from the generation CLIs.  Format: minimal standards-
// compliant PNG — IHDR (8-bit, colortype 2/RGB or 0/gray), one IDAT with
// filter-0 scanlines, IEND.  CRCs via zlib crc32.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>
#include <zlib.h>

namespace {

void put_be32(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back((v >> 24) & 0xff);
  out.push_back((v >> 16) & 0xff);
  out.push_back((v >> 8) & 0xff);
  out.push_back(v & 0xff);
}

void write_chunk(FILE* f, const char type[4], const uint8_t* data, size_t len) {
  uint8_t hdr[8];
  hdr[0] = (len >> 24) & 0xff;
  hdr[1] = (len >> 16) & 0xff;
  hdr[2] = (len >> 8) & 0xff;
  hdr[3] = len & 0xff;
  std::memcpy(hdr + 4, type, 4);
  std::fwrite(hdr, 1, 8, f);
  if (len) std::fwrite(data, 1, len, f);
  uint32_t crc = crc32(0L, Z_NULL, 0);
  crc = crc32(crc, reinterpret_cast<const Bytef*>(type), 4);
  if (len) crc = crc32(crc, data, static_cast<uInt>(len));
  uint8_t crcb[4] = {static_cast<uint8_t>((crc >> 24) & 0xff),
                     static_cast<uint8_t>((crc >> 16) & 0xff),
                     static_cast<uint8_t>((crc >> 8) & 0xff),
                     static_cast<uint8_t>(crc & 0xff)};
  std::fwrite(crcb, 1, 4, f);
}

}  // namespace

extern "C" {

// data: HxWxC row-major uint8.  channels: 1 (gray) or 3 (RGB).
// compress_level: 0-9 (1 = fast, the eval-loop default).
// Returns 0 on success, negative error codes otherwise.
int sid_write_png(const char* path, const uint8_t* data, int height, int width,
                  int channels, int compress_level) {
  if (!path || !data || height <= 0 || width <= 0 ||
      (channels != 1 && channels != 3)) {
    return -1;
  }
  const size_t stride = static_cast<size_t>(width) * channels;
  // Filter-0 prefixed scanlines.
  std::vector<uint8_t> raw((stride + 1) * height);
  for (int y = 0; y < height; ++y) {
    raw[y * (stride + 1)] = 0;
    std::memcpy(&raw[y * (stride + 1) + 1], data + y * stride, stride);
  }
  uLongf bound = compressBound(raw.size());
  std::vector<uint8_t> compressed(bound);
  if (compress2(compressed.data(), &bound, raw.data(), raw.size(),
                compress_level) != Z_OK) {
    return -2;
  }
  FILE* f = std::fopen(path, "wb");
  if (!f) return -3;
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  std::fwrite(sig, 1, 8, f);
  std::vector<uint8_t> ihdr;
  put_be32(ihdr, static_cast<uint32_t>(width));
  put_be32(ihdr, static_cast<uint32_t>(height));
  ihdr.push_back(8);                               // bit depth
  ihdr.push_back(channels == 3 ? 2 : 0);           // color type
  ihdr.push_back(0);                               // compression
  ihdr.push_back(0);                               // filter
  ihdr.push_back(0);                               // interlace
  write_chunk(f, "IHDR", ihdr.data(), ihdr.size());
  write_chunk(f, "IDAT", compressed.data(), bound);
  write_chunk(f, "IEND", nullptr, 0);
  std::fclose(f);
  return 0;
}

// Batch variant: n images of identical shape, written to n paths.
// paths: array of n C strings.  Returns number written (== n on success).
int sid_write_png_batch(const char** paths, const uint8_t* data, int n,
                        int height, int width, int channels,
                        int compress_level) {
  const size_t img = static_cast<size_t>(height) * width * channels;
  int ok = 0;
  for (int i = 0; i < n; ++i) {
    if (sid_write_png(paths[i], data + i * img, height, width, channels,
                      compress_level) == 0) {
      ++ok;
    }
  }
  return ok;
}

}  // extern "C"
