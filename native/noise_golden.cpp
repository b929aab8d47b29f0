// Golden-value generator for the voxelengine_tpu noise library.
//
// NOT an independent implementation: the formulas below (hash rounds,
// gradient table, Perlin corner evaluation, fBm repeater loop) are a
// deliberate C++ transliteration of the reference noise semantics
// (/root/reference/VoxelRT/cuda_noise.cuh:44-71,565-629) with the CUDA
// decorations stripped -- bit-exactness against the reference formulas is
// the whole point of a golden generator, so the statement order and
// constants are kept verbatim.  It exists only as a cross-toolchain check:
// the production implementation (voxelengine_tpu/ops/noise.py) is a
// vectorized JAX redesign, and tests assert it matches these golden values
// bit-for-bit (tests/test_noise.py).  Float->integer conversions use
// explicit CUDA-style saturation (cvt.rzi semantics) so behavior is defined
// and matches the GPU reference on the positive-range inputs the engine
// uses.
//
// Usage: noise_golden > golden.json   (emits JSON test vectors)

#include <cmath>
#include <cstdint>
#include <cstdio>

static uint32_t hash_u32(uint32_t s) {
    s = (s + 0x7ed55d16u) + (s << 12);
    s = (s ^ 0xc761c23cu) ^ (s >> 19);
    s = (s + 0x165667b1u) + (s << 5);
    s = (s + 0xd3a2646cu) ^ (s << 9);
    s = (s + 0xfd7046c5u) + (s << 3);
    s = (s ^ 0xb55a4f09u) ^ (s >> 16);
    return s;
}

static uint32_t f32_to_u32_sat(float x) {
    if (std::isnan(x) || x <= 0.0f) return 0u;
    if (x >= 4294967295.0f) return 0xffffffffu;
    return (uint32_t)x;
}

static float random_float(uint32_t seed) {
    return (float)hash_u32(seed) / (float)0xffffffffu;
}

static uint32_t random_int_grid(float x, float y, float z, float seed) {
    return hash_u32(f32_to_u32_sat(x * 1723.0f + y * 93241.0f + z * 149812.0f + 3824.0f + seed));
}

static float fade(float t) { return t * t * t * (t * (t * 6.0f - 15.0f) + 10.0f); }
static float lerpf(float a, float b, float r) { return a * (1.0f - r) + b * r; }

// gradient selection table, hash & 0xF (including the duplicate entries for
// 0xC..0xF the CUDA original carries)
static const float GCX[16] = {1, -1, 1, -1, 1, -1, 1, -1, 0, 0, 0, 0, 1, 0, -1, 0};
static const float GCY[16] = {1, 1, -1, -1, 0, 0, 0, 0, 1, -1, 1, -1, 1, -1, 1, -1};
static const float GCZ[16] = {0, 0, 0, 0, 1, 1, -1, -1, 1, 1, -1, -1, 0, 1, 0, -1};

static float grad(uint32_t h, float x, float y, float z) {
    int i = (int)(h & 0xF);
    return GCX[i] * x + GCY[i] * y + GCZ[i] * z;
}

static float perlin(float px, float py, float pz, float scale, int32_t seed) {
    float fseed = (float)seed;
    px *= scale; py *= scale; pz *= scale;
    float ix = std::floor(px), iy = std::floor(py), iz = std::floor(pz);
    float x = px - ix, y = py - iy, z = pz - iz;
    float u = fade(x), v = fade(y), w = fade(z);
    float i000 = grad(random_int_grid(ix, iy, iz, fseed), x, y, z);
    float i100 = grad(random_int_grid(ix + 1.0f, iy, iz, fseed), x - 1.0f, y, z);
    float i010 = grad(random_int_grid(ix, iy + 1.0f, iz, fseed), x, y - 1.0f, z);
    float i110 = grad(random_int_grid(ix + 1.0f, iy + 1.0f, iz, fseed), x - 1.0f, y - 1.0f, z);
    float i001 = grad(random_int_grid(ix, iy, iz + 1.0f, fseed), x, y, z - 1.0f);
    float i101 = grad(random_int_grid(ix + 1.0f, iy, iz + 1.0f, fseed), x - 1.0f, y, z - 1.0f);
    float i011 = grad(random_int_grid(ix, iy + 1.0f, iz + 1.0f, fseed), x, y - 1.0f, z - 1.0f);
    float i111 = grad(random_int_grid(ix + 1.0f, iy + 1.0f, iz + 1.0f, fseed), x - 1.0f, y - 1.0f, z - 1.0f);
    float x00 = lerpf(i000, i100, u), x10 = lerpf(i010, i110, u);
    float x01 = lerpf(i001, i101, u), x11 = lerpf(i011, i111, u);
    return lerpf(lerpf(x00, x10, v), lerpf(x01, x11, v), w);
}

static float repeater_perlin(float px, float py, float pz, float scale, int n,
                             float lacunarity, float decay) {
    float acc = 0.0f, amp = 1.0f;
    for (int i = 0; i < n; i++) {
        acc += perlin(px * scale, py * scale, pz * scale, 1.0f, (i + 38) * 27389482) * amp;
        scale *= lacunarity;
        amp *= decay;
    }
    return acc;
}

static float terrain_t(int x, int y, int z, int octaves) {
    float s = 0.005f;
    float t = repeater_perlin(x * s, y * s, z * s, 1.0f, octaves, 2.0f, 0.5f) * 1000.0f;
    return t > 0.0f ? t : 0.0f;
}

int main() {
    std::printf("{\n");

    std::printf("  \"hash\": [");
    uint32_t hseeds[] = {0u, 1u, 42u, 0x71889283u, 0xffffffffu, 123456789u};
    for (int i = 0; i < 6; i++)
        std::printf("%s%u", i ? ", " : "", hash_u32(hseeds[i]));
    std::printf("],\n");

    std::printf("  \"random_float\": [");
    for (int i = 0; i < 6; i++)
        std::printf("%s%.9g", i ? ", " : "", random_float(hseeds[i]));
    std::printf("],\n");

    std::printf("  \"perlin\": [");
    float coords[5][3] = {{0.1f, 0.2f, 0.3f}, {1.5f, 2.5f, 3.5f}, {10.f, 20.f, 30.f},
                          {0.005f, 0.0f, 0.0f}, {100.7f, 3.3f, 77.77f}};
    for (int i = 0; i < 5; i++)
        std::printf("%s%.9g", i ? ", " : "",
                    perlin(coords[i][0], coords[i][1], coords[i][2], 1.0f, 1040580316));
    std::printf("],\n");

    std::printf("  \"repeater_perlin\": [");
    for (int i = 0; i < 5; i++)
        std::printf("%s%.9g", i ? ", " : "",
                    repeater_perlin(coords[i][0], coords[i][1], coords[i][2], 1.0f, 32, 2.0f, 0.5f));
    std::printf("],\n");

    // terrain threshold + solidity on a 4x4x4 sample lattice at stride 37
    std::printf("  \"terrain_t\": [");
    bool first = true;
    for (int z = 0; z < 4; z++)
        for (int y = 0; y < 4; y++)
            for (int x = 0; x < 4; x++) {
                std::printf("%s%.9g", first ? "" : ", ", terrain_t(x * 37, y * 37, z * 37, 32));
                first = false;
            }
    std::printf("]\n}\n");
    return 0;
}
