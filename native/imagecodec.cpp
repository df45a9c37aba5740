// Native image codec: HDR float -> gamma-mapped RGB8 -> PNG bytes.
//
// The runtime component of the display path (the reference's equivalent is
// the browser compositor reading the WebGL framebuffer).  Rendering stays on
// the TPU; this accelerates the host-side image writeback for large frames:
// tone-map + gamma via a 4096-entry LUT and PNG encode through zlib, both
// several times faster than the pure-NumPy/zlib fallback in
// sail_tpu/utils/imageio.py (which remains as the no-build fallback).
//
// Build: make -C native   (g++ -O3 -shared -fPIC imagecodec.cpp -lz)
// Python binding: ctypes (sail_tpu/utils/native.py).
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>
#include <zlib.h>

namespace {

uint32_t crc_table_val(uint32_t n) {
    uint32_t c = n;
    for (int k = 0; k < 8; k++)
        c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
    return c;
}

uint32_t crc32_png(const uint8_t* data, size_t len, uint32_t crc = 0xFFFFFFFFu) {
    static uint32_t table[256];
    static bool init = false;
    if (!init) {
        for (uint32_t n = 0; n < 256; n++) table[n] = crc_table_val(n);
        init = true;
    }
    for (size_t i = 0; i < len; i++)
        crc = table[(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
    return crc;
}

void put_be32(std::vector<uint8_t>& v, uint32_t x) {
    v.push_back((x >> 24) & 0xFF);
    v.push_back((x >> 16) & 0xFF);
    v.push_back((x >> 8) & 0xFF);
    v.push_back(x & 0xFF);
}

void chunk(std::vector<uint8_t>& out, const char tag[4],
           const uint8_t* data, size_t len) {
    put_be32(out, (uint32_t)len);
    size_t start = out.size();
    out.insert(out.end(), tag, tag + 4);
    out.insert(out.end(), data, data + len);
    uint32_t crc = crc32_png(out.data() + start, out.size() - start) ^ 0xFFFFFFFFu;
    put_be32(out, crc);
}

}  // namespace

extern "C" {

// HDR float RGB (h*w*3) -> RGB8 with clamp + gamma, via LUT.
void tonemap_u8(const float* hdr, int h, int w, float gamma_value,
                uint8_t* out) {
    // LUT indexed in sqrt-domain: the gamma curve is steep near zero, so a
    // linear-domain table loses dark-end precision; sqrt indexing gives
    // quadratically finer resolution where it matters.
    constexpr int N = 4096;
    static thread_local uint8_t lut[N + 1];
    static thread_local float last_gamma = -1.0f;
    if (last_gamma != gamma_value) {
        for (int i = 0; i <= N; i++) {
            float s = (float)i / N;
            lut[i] = (uint8_t)(powf(s * s, 1.0f / gamma_value) * 255.0f + 0.5f);
        }
        last_gamma = gamma_value;
    }
    const size_t n = (size_t)h * w * 3;
    for (size_t i = 0; i < n; i++) {
        float x = hdr[i];
        x = x < 0.0f ? 0.0f : (x > 1.0f ? 1.0f : x);
        out[i] = lut[(int)(sqrtf(x) * N + 0.5f)];
    }
}

// RGB8 (h*w*3) -> PNG bytes. Returns encoded size, or -1 if out_cap too
// small, -2 on zlib error.
long encode_png(const uint8_t* rgb, int h, int w, uint8_t* out,
                long out_cap) {
    // filter bytes: one 0x00 per row
    std::vector<uint8_t> raw((size_t)h * (w * 3 + 1));
    for (int y = 0; y < h; y++) {
        raw[(size_t)y * (w * 3 + 1)] = 0;
        memcpy(&raw[(size_t)y * (w * 3 + 1) + 1], rgb + (size_t)y * w * 3,
               (size_t)w * 3);
    }
    uLongf comp_cap = compressBound(raw.size());
    std::vector<uint8_t> comp(comp_cap);
    if (compress2(comp.data(), &comp_cap, raw.data(), raw.size(), 6) != Z_OK)
        return -2;

    std::vector<uint8_t> png;
    png.reserve(comp_cap + 128);
    const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n'};
    png.insert(png.end(), sig, sig + 8);
    uint8_t ihdr[13];
    ihdr[0] = (w >> 24) & 0xFF; ihdr[1] = (w >> 16) & 0xFF;
    ihdr[2] = (w >> 8) & 0xFF;  ihdr[3] = w & 0xFF;
    ihdr[4] = (h >> 24) & 0xFF; ihdr[5] = (h >> 16) & 0xFF;
    ihdr[6] = (h >> 8) & 0xFF;  ihdr[7] = h & 0xFF;
    ihdr[8] = 8;   // bit depth
    ihdr[9] = 2;   // color type RGB
    ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
    chunk(png, "IHDR", ihdr, 13);
    chunk(png, "IDAT", comp.data(), comp_cap);
    chunk(png, "IEND", nullptr, 0);

    if ((long)png.size() > out_cap) return -1;
    memcpy(out, png.data(), png.size());
    return (long)png.size();
}

}  // extern "C"
