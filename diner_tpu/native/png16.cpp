// 16-bit grayscale PNG codec for the depth-prior IO hot path.
//
// Role in the framework: every training/eval sample decodes several uint16
// depth/confidence PNGs (<stem>_TransMVSNet.png contract — reference
// deps/TransMVSNet/train.py:173-175 writes them, src/data/dtu.py:90-124
// reads them). The generic Python imaging stack spends most of its time in
// per-row Python/NumPy glue; this decoder is a single zlib inflate plus a
// tight defilter loop, called through ctypes with the NumPy buffer written
// in place (diner_tpu/data/codecs.py falls back to imageio when the shared
// library is unavailable).
//
// Scope: PNG8/PNG16 grayscale (color type 0), bit depth 16, no interlace —
// exactly the subset the depth contract uses. The encoder emits filter-0
// rows with a single zlib stream (level 6), byte-compatible with any PNG
// reader.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <vector>
#include <zlib.h>

namespace {

const uint8_t PNG_SIG[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};

uint32_t be32(const uint8_t* p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
           (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

void put_be32(std::vector<uint8_t>& out, uint32_t v) {
    out.push_back(uint8_t(v >> 24));
    out.push_back(uint8_t(v >> 16));
    out.push_back(uint8_t(v >> 8));
    out.push_back(uint8_t(v));
}

void put_chunk(std::vector<uint8_t>& out, const char type[4],
               const uint8_t* data, size_t n) {
    put_be32(out, uint32_t(n));
    size_t start = out.size();
    out.insert(out.end(), type, type + 4);
    if (n) out.insert(out.end(), data, data + n);
    uint32_t crc = crc32(0L, Z_NULL, 0);
    crc = crc32(crc, out.data() + start, uInt(n + 4));
    put_be32(out, crc);
}

int paeth(int a, int b, int c) {
    int p = a + b - c;
    int pa = p > a ? p - a : a - p;
    int pb = p > b ? p - b : b - p;
    int pc = p > c ? p - c : c - p;
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

}  // namespace

extern "C" {

// Parse header only: returns 0 and fills (w, h, bit_depth) when the file is
// a supported grayscale non-interlaced PNG; nonzero error code otherwise.
int png16_probe(const uint8_t* buf, int64_t n, int64_t* w, int64_t* h,
                int64_t* bit_depth) {
    if (n < 33 || memcmp(buf, PNG_SIG, 8) != 0) return 1;
    if (memcmp(buf + 12, "IHDR", 4) != 0) return 2;
    *w = be32(buf + 16);
    *h = be32(buf + 20);
    *bit_depth = buf[24];
    uint8_t color = buf[25], interlace = buf[28];
    if (color != 0 || interlace != 0) return 3;           // grayscale only
    if (*bit_depth != 8 && *bit_depth != 16) return 4;
    return 0;
}

// Decode into out (row-major uint16[h*w], host byte order). Returns 0 on
// success. 8-bit inputs widen to uint16 without scaling.
int png16_decode(const uint8_t* buf, int64_t n, uint16_t* out) {
    int64_t w, h, depth;
    int rc = png16_probe(buf, n, &w, &h, &depth);
    if (rc) return rc;

    // concatenate IDAT payloads
    std::vector<uint8_t> idat;
    int64_t off = 8;
    while (off + 12 <= n) {
        uint32_t len = be32(buf + off);
        const uint8_t* type = buf + off + 4;
        if (memcmp(type, "IDAT", 4) == 0) {
            if (off + 8 + len > uint64_t(n)) return 5;
            idat.insert(idat.end(), buf + off + 8, buf + off + 8 + len);
        } else if (memcmp(type, "IEND", 4) == 0) {
            break;
        }
        off += 8 + int64_t(len) + 4;
    }
    if (idat.empty()) return 6;

    const int64_t bpp = depth / 8;            // bytes per pixel (1 or 2)
    const int64_t stride = w * bpp;           // filtered row payload
    std::vector<uint8_t> raw((stride + 1) * h);
    uLongf raw_len = uLongf(raw.size());
    if (uncompress(raw.data(), &raw_len, idat.data(), uLong(idat.size()))
            != Z_OK || int64_t(raw_len) != int64_t(raw.size()))
        return 7;

    std::vector<uint8_t> prev(stride, 0), cur(stride);
    for (int64_t y = 0; y < h; ++y) {
        const uint8_t* row = raw.data() + y * (stride + 1);
        uint8_t filter = row[0];
        const uint8_t* src = row + 1;
        switch (filter) {
            case 0:
                memcpy(cur.data(), src, stride);
                break;
            case 1:
                for (int64_t i = 0; i < stride; ++i)
                    cur[i] = uint8_t(src[i] + (i >= bpp ? cur[i - bpp] : 0));
                break;
            case 2:
                for (int64_t i = 0; i < stride; ++i)
                    cur[i] = uint8_t(src[i] + prev[i]);
                break;
            case 3:
                for (int64_t i = 0; i < stride; ++i) {
                    int a = i >= bpp ? cur[i - bpp] : 0;
                    cur[i] = uint8_t(src[i] + ((a + prev[i]) >> 1));
                }
                break;
            case 4:
                for (int64_t i = 0; i < stride; ++i) {
                    int a = i >= bpp ? cur[i - bpp] : 0;
                    int c = i >= bpp ? prev[i - bpp] : 0;
                    cur[i] = uint8_t(src[i] + paeth(a, prev[i], c));
                }
                break;
            default:
                return 8;
        }
        uint16_t* dst = out + y * w;
        if (bpp == 2) {
            for (int64_t x = 0; x < w; ++x)
                dst[x] = uint16_t((cur[2 * x] << 8) | cur[2 * x + 1]);
        } else {
            for (int64_t x = 0; x < w; ++x) dst[x] = cur[x];
        }
        std::swap(prev, cur);
    }
    return 0;
}

// Encode uint16[h*w] as a 16-bit grayscale PNG. Writes up to cap bytes into
// out; returns the byte count, or -1 when cap is too small / zlib fails.
int64_t png16_encode(const uint16_t* img, int64_t h, int64_t w,
                     uint8_t* out, int64_t cap) {
    const int64_t stride = w * 2;
    std::vector<uint8_t> raw((stride + 1) * h);
    for (int64_t y = 0; y < h; ++y) {
        uint8_t* row = raw.data() + y * (stride + 1);
        row[0] = 0;  // filter: none
        const uint16_t* src = img + y * w;
        for (int64_t x = 0; x < w; ++x) {
            row[1 + 2 * x] = uint8_t(src[x] >> 8);
            row[2 + 2 * x] = uint8_t(src[x]);
        }
    }
    uLongf zcap = compressBound(uLong(raw.size()));
    std::vector<uint8_t> z(zcap);
    if (compress2(z.data(), &zcap, raw.data(), uLong(raw.size()), 6) != Z_OK)
        return -1;

    std::vector<uint8_t> png;
    png.reserve(zcap + 128);
    png.insert(png.end(), PNG_SIG, PNG_SIG + 8);
    uint8_t ihdr[13];
    ihdr[0] = uint8_t(uint32_t(w) >> 24); ihdr[1] = uint8_t(uint32_t(w) >> 16);
    ihdr[2] = uint8_t(uint32_t(w) >> 8);  ihdr[3] = uint8_t(w);
    ihdr[4] = uint8_t(uint32_t(h) >> 24); ihdr[5] = uint8_t(uint32_t(h) >> 16);
    ihdr[6] = uint8_t(uint32_t(h) >> 8);  ihdr[7] = uint8_t(h);
    ihdr[8] = 16;  // bit depth
    ihdr[9] = 0;   // grayscale
    ihdr[10] = ihdr[11] = ihdr[12] = 0;  // deflate / adaptive / no interlace
    put_chunk(png, "IHDR", ihdr, 13);
    put_chunk(png, "IDAT", z.data(), zcap);
    put_chunk(png, "IEND", nullptr, 0);

    if (int64_t(png.size()) > cap) return -1;
    memcpy(out, png.data(), png.size());
    return int64_t(png.size());
}

}  // extern "C"
