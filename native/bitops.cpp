// bitops — native host-side bit-grid utilities for voxelengine_tpu.
//
// Covers the reference's host C++ responsibilities with a C ABI for ctypes:
//   * bit_pack / bit_unpack: dense bytes <-> packed uint32 words (the
//     BitArray storage contract: bit i -> word i>>5, bit i&31)
//   * popcount over packed words
//   * build_brickmap_host: multithreaded CPU brickmap construction from a
//     packed dense grid — the native counterpart of the reference's
//     std::thread fan-out builder (GenerateLowresVoxelBuffer), used for
//     hosts without an accelerator and as an independent cross-check of the
//     XLA builder.  Output arrays use the same packed meta word layout as
//     voxelengine_tpu.core.brickmap (6x5-bit tight bounds + occupancy bit
//     30) and linear (x-fastest) chunk/brick indexing.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline bool get_bit(const uint32_t* words, uint64_t idx) {
    return (words[idx >> 5] >> (idx & 31)) & 1u;
}

inline void set_bit(uint32_t* words, uint64_t idx) {
    words[idx >> 5] |= (1u << (idx & 31));
}

}  // namespace

extern "C" {

// dense bool bytes (0/1) -> packed LSB-first uint32 words
void bit_pack(const uint8_t* dense, uint64_t n, uint32_t* words) {
    std::memset(words, 0, ((n + 31) / 32) * sizeof(uint32_t));
    for (uint64_t i = 0; i < n; i++)
        if (dense[i]) set_bit(words, i);
}

void bit_unpack(const uint32_t* words, uint64_t n, uint8_t* dense) {
    for (uint64_t i = 0; i < n; i++) dense[i] = get_bit(words, i);
}

uint64_t bit_popcount(const uint32_t* words, uint64_t num_words) {
    uint64_t total = 0;
    for (uint64_t i = 0; i < num_words; i++)
        total += __builtin_popcount(words[i]);
    return total;
}

// Build a brickmap from a packed dense grid.
//
// dense: packed words of an [Z, Y, X] grid in *linear x-fastest* bit order
//        (bit = x + y*X + z*X*Y).
// X, Y, Z: world dims (multiples of factor).
// factor: chunk edge length (<= 32).
// Outputs (caller-allocated, linear chunk order cx + cy*gx + cz*gx*gy):
//   meta:      int32[gx*gy*gz] packed occupancy+bounds
//   bricks:    uint32[gx*gy*gz * wpb] brick words, *linear* in-brick order
//              (bit = lx + ly*f + lz*f*f), wpb = max(1, f^3/32)
//   threads:   worker count (0 = hardware_concurrency)
void build_brickmap_host(const uint32_t* dense, int64_t X, int64_t Y, int64_t Z,
                         int factor, int32_t* meta, uint32_t* bricks,
                         int threads) {
    const int64_t gx = X / factor, gy = Y / factor, gz = Z / factor;
    const int64_t nchunks = gx * gy * gz;
    const int f = factor;
    const int64_t wpb = std::max<int64_t>(1, (int64_t)f * f * f / 32);
    int nt = threads > 0 ? threads : (int)std::thread::hardware_concurrency();
    nt = std::max(1, nt);
    std::atomic<int64_t> next{0};

    auto work = [&]() {
        for (;;) {
            int64_t ci = next.fetch_add(1);
            if (ci >= nchunks) return;
            int64_t cx = ci % gx, cy = (ci / gx) % gy, cz = ci / (gx * gy);
            uint32_t* bw = bricks + ci * wpb;
            std::memset(bw, 0, wpb * sizeof(uint32_t));
            int mnx = f, mny = f, mnz = f, mxx = -1, mxy = -1, mxz = -1;
            bool any = false;
            for (int lz = 0; lz < f; lz++) {
                int64_t wz = cz * f + lz;
                for (int ly = 0; ly < f; ly++) {
                    int64_t wy = cy * f + ly;
                    int64_t base = wz * X * Y + wy * X + cx * f;
                    for (int lx = 0; lx < f; lx++) {
                        if (!get_bit(dense, base + lx)) continue;
                        any = true;
                        set_bit(bw, (uint64_t)(lx + ly * f + lz * f * f));
                        mnx = std::min(mnx, lx); mxx = std::max(mxx, lx);
                        mny = std::min(mny, ly); mxy = std::max(mxy, ly);
                        mnz = std::min(mnz, lz); mxz = std::max(mxz, lz);
                    }
                }
            }
            int32_t m = 0;
            if (any) {
                m = mnx | (mny << 5) | (mnz << 10) | (mxx << 15) | (mxy << 20) |
                    (mxz << 25) | (1 << 30);
            }
            meta[ci] = m;
        }
    };

    std::vector<std::thread> pool;
    for (int i = 0; i < nt; i++) pool.emplace_back(work);
    for (auto& t : pool) t.join();
}

}  // extern "C"
