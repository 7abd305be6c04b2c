// Host-side native runtime: batched bigint <-> limb conversion and
// Montgomery transforms for <= 384-bit prime fields.
//
// Role: the reference delegates its native hot path to arkworks (Rust);
// here the TPU owns the compute path and this library owns the host data
// plane — packing canonical little-endian byte vectors into the planar
// 16-bit-limb uint32 arrays the TPU kernels consume (and back), plus the
// host-side Montgomery domain transforms. These were per-element Python
// loops (openzl_tpu/fields/limb.py pack/unpack) and dominate host time for
// 2^20-element MSM/witness arrays.
//
// C ABI only (loaded via ctypes; no pybind11 in the image).
//
// Layout contracts (must match openzl_tpu/fields/{spec,limb}.py):
//   * canonical bytes: little-endian, `stride` bytes per element
//   * limb arrays: uint32 planar (n16, count): limb axis first,
//     16 bits per limb, little-endian limb order
//   * Montgomery radix R = 2^(16 * n16)

#include "mont_core.h"

using namespace ozl;

namespace {

inline void store_limb16(const u64* v, int n64, u32* out, int64_t idx,
                         int64_t count, int n16) {
  for (int l = 0; l < n16; ++l) {
    int w = l / 4, s = (l % 4) * 16;
    u64 word = w < n64 ? v[w] : 0;
    out[(int64_t)l * count + idx] = (u32)((word >> s) & 0xFFFF);
  }
}

inline void load_limb16(const u32* in, int64_t idx, int64_t count, int n16,
                        u64* out, int n64) {
  std::memset(out, 0, sizeof(u64) * n64);
  for (int l = 0; l < n16; ++l) {
    int w = l / 4, s = (l % 4) * 16;
    if (w < n64) out[w] |= (u64)(in[(int64_t)l * count + idx] & 0xFFFF) << s;
  }
}

}  // namespace

extern "C" {

// canonical LE bytes -> Montgomery-form planar 16-bit limbs
void ozl_to_mont_limbs16(const uint8_t* in, int64_t count, int stride,
                         const u64* mod, const u64* r2, u64 n0inv, int n64,
                         u32* out, int n16) {
  Ctx c;
  std::memcpy(c.mod, mod, sizeof(u64) * n64);
  std::memcpy(c.r2, r2, sizeof(u64) * n64);
  c.n0inv = n0inv;
  c.n64 = n64;
  c.n16 = n16;
  for (int64_t i = 0; i < count; ++i) {
    u64 v[MAXL], m[MAXL];
    bytes_to_u64(in + i * stride, stride, v, n64);
    mont_mul(c, v, c.r2, m);  // to Montgomery: v * R^2 * R^{-1} = v R
    store_limb16(m, n64, out, i, count, n16);
  }
}

// Montgomery-form planar limbs -> canonical LE bytes
void ozl_from_mont_limbs16(const u32* in, int64_t count, const u64* mod,
                           u64 n0inv, int n64, int n16, uint8_t* out,
                           int stride) {
  Ctx c;
  std::memcpy(c.mod, mod, sizeof(u64) * n64);
  c.n0inv = n0inv;
  c.n64 = n64;
  c.n16 = n16;
  u64 one[MAXL] = {0};
  one[0] = 1;
  for (int64_t i = 0; i < count; ++i) {
    u64 v[MAXL], m[MAXL];
    load_limb16(in, i, count, n16, v, n64);
    mont_mul(c, v, one, m);  // from Montgomery: v * R^{-1}
    u64_to_bytes(m, n64, out + i * stride, stride);
  }
}

// canonical LE bytes -> canonical planar 16-bit limbs (no Montgomery)
void ozl_pack_limbs16(const uint8_t* in, int64_t count, int stride, u32* out,
                      int n16) {
  for (int64_t i = 0; i < count; ++i) {
    u64 v[MAXL];
    bytes_to_u64(in + i * stride, stride, v, MAXL);
    store_limb16(v, MAXL, out, i, count, n16);
  }
}

// canonical planar limbs -> canonical LE bytes
void ozl_unpack_limbs16(const u32* in, int64_t count, int n16, uint8_t* out,
                        int stride) {
  for (int64_t i = 0; i < count; ++i) {
    u64 v[MAXL];
    load_limb16(in, i, count, n16, v, MAXL);
    u64_to_bytes(v, MAXL, out + i * stride, stride);
  }
}

}  // extern "C"
