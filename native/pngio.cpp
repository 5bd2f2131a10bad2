// Minimal PNG writer (RGBA8) on system zlib.
//
// Native frame-export path replacing the reference's `image` crate usage
// (reference src/main.rs:180-181 saves decoded frames; Cargo.toml:21).
// Write-only: decoding falls back to PIL on the Python side.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>
#include <zlib.h>

namespace {

uint32_t crc_table_val(uint32_t c) {
    for (int k = 0; k < 8; ++k)
        c = (c & 1) ? 0xedb88320u ^ (c >> 1) : c >> 1;
    return c;
}

uint32_t crc32_of(const uint8_t* buf, size_t len, uint32_t crc = 0xffffffffu) {
    static uint32_t table[256];
    static bool init = false;
    if (!init) {
        for (uint32_t i = 0; i < 256; ++i) table[i] = crc_table_val(i);
        init = true;
    }
    for (size_t i = 0; i < len; ++i)
        crc = table[(crc ^ buf[i]) & 0xff] ^ (crc >> 8);
    return crc;
}

void put_be32(std::vector<uint8_t>& v, uint32_t x) {
    v.push_back(x >> 24); v.push_back(x >> 16);
    v.push_back(x >> 8); v.push_back(x);
}

void chunk(std::vector<uint8_t>& out, const char type[4],
           const uint8_t* data, size_t len) {
    put_be32(out, static_cast<uint32_t>(len));
    const size_t start = out.size();
    out.insert(out.end(), type, type + 4);
    if (len) out.insert(out.end(), data, data + len);
    const uint32_t crc =
        crc32_of(out.data() + start, out.size() - start) ^ 0xffffffffu;
    put_be32(out, crc);
}

}  // namespace

extern "C" {

// rgba: u8[height*width*4] row-major. Returns 0 on success.
int32_t png_write_rgba(const char* path, const uint8_t* rgba,
                       int32_t width, int32_t height) {
    // filtered scanlines: filter byte 0 + raw row
    const size_t stride = static_cast<size_t>(width) * 4;
    std::vector<uint8_t> raw((stride + 1) * height);
    for (int32_t y = 0; y < height; ++y) {
        raw[y * (stride + 1)] = 0;
        std::memcpy(&raw[y * (stride + 1) + 1], rgba + y * stride, stride);
    }

    uLongf zcap = compressBound(raw.size());
    std::vector<uint8_t> z(zcap);
    if (compress2(z.data(), &zcap, raw.data(), raw.size(), 6) != Z_OK)
        return 1;
    z.resize(zcap);

    std::vector<uint8_t> out;
    const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    out.insert(out.end(), sig, sig + 8);

    uint8_t ihdr[13];
    ihdr[0] = width >> 24; ihdr[1] = width >> 16;
    ihdr[2] = width >> 8; ihdr[3] = width;
    ihdr[4] = height >> 24; ihdr[5] = height >> 16;
    ihdr[6] = height >> 8; ihdr[7] = height;
    ihdr[8] = 8;   // bit depth
    ihdr[9] = 6;   // color type RGBA
    ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
    chunk(out, "IHDR", ihdr, 13);
    chunk(out, "IDAT", z.data(), z.size());
    chunk(out, "IEND", nullptr, 0);

    FILE* f = std::fopen(path, "wb");
    if (!f) return 2;
    const size_t written = std::fwrite(out.data(), 1, out.size(), f);
    std::fclose(f);
    return written == out.size() ? 0 : 3;
}

}  // extern "C"
