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

#include <cstdint>
#include <cstring>

using u32 = uint32_t;
using u64 = uint64_t;
using u128 = unsigned __int128;

namespace {

constexpr int MAXL = 6;  // 64-bit limbs: up to 384-bit fields

struct Ctx {
  u64 mod[MAXL];
  u64 r2[MAXL];    // R^2 mod p, R = 2^(64*n64)... see note below
  u64 n0inv;       // -p^{-1} mod 2^64
  int n64;
  int n16;
};

// NOTE on radices: python-side R_py = 2^(16*n16). For n16 = 16 (254-bit
// fields) that is 2^256 = 2^(64*4) = R here; for n16 = 24 (BLS12-381 Fq,
// 381-bit) R_py = 2^384 = 2^(64*6). The caller passes n64 = ceil(n16/4)
// and an r2 computed for R = 2^(64*n64), so the two radices agree.

inline void add_nc(const u64* a, const u64* b, u64* out, int n) {
  u128 carry = 0;
  for (int i = 0; i < n; ++i) {
    u128 t = (u128)a[i] + b[i] + carry;
    out[i] = (u64)t;
    carry = t >> 64;
  }
}

inline bool sub_borrow(const u64* a, const u64* b, u64* out, int n) {
  u128 borrow = 0;
  for (int i = 0; i < n; ++i) {
    u128 t = (u128)a[i] - b[i] - borrow;
    out[i] = (u64)t;
    borrow = (t >> 64) & 1;
  }
  return borrow != 0;
}

inline bool geq(const u64* a, const u64* b, int n) {
  for (int i = n - 1; i >= 0; --i) {
    if (a[i] != b[i]) return a[i] > b[i];
  }
  return true;
}

inline void cond_sub_mod(u64* a, const Ctx& c) {
  if (geq(a, c.mod, c.n64)) {
    u64 t[MAXL];
    sub_borrow(a, c.mod, t, c.n64);
    std::memcpy(a, t, sizeof(u64) * c.n64);
  }
}

// CIOS Montgomery multiply: out = a*b*R^{-1} mod p
void mont_mul(const Ctx& c, const u64* a, const u64* b, u64* out) {
  const int n = c.n64;
  u64 t[MAXL + 2] = {0};
  for (int i = 0; i < n; ++i) {
    u128 carry = 0;
    for (int j = 0; j < n; ++j) {
      u128 cur = (u128)t[j] + (u128)a[i] * b[j] + carry;
      t[j] = (u64)cur;
      carry = cur >> 64;
    }
    u128 cur = (u128)t[n] + carry;
    t[n] = (u64)cur;
    t[n + 1] = (u64)(cur >> 64);

    u64 m = t[0] * c.n0inv;
    carry = ((u128)t[0] + (u128)m * c.mod[0]) >> 64;
    for (int j = 1; j < n; ++j) {
      u128 cur2 = (u128)t[j] + (u128)m * c.mod[j] + carry;
      t[j - 1] = (u64)cur2;
      carry = cur2 >> 64;
    }
    u128 cur3 = (u128)t[n] + carry;
    t[n - 1] = (u64)cur3;
    t[n] = t[n + 1] + (u64)(cur3 >> 64);
    t[n + 1] = 0;
  }
  std::memcpy(out, t, sizeof(u64) * n);
  cond_sub_mod(out, c);
}

inline void bytes_to_u64(const uint8_t* in, int stride, u64* out, int n64) {
  std::memset(out, 0, sizeof(u64) * n64);
  std::memcpy(out, in, stride < n64 * 8 ? stride : n64 * 8);
}

inline void u64_to_bytes(const u64* in, int n64, uint8_t* out, int stride) {
  std::memset(out, 0, stride);
  int nb = n64 * 8 < stride ? n64 * 8 : stride;
  std::memcpy(out, in, nb);
}

// planar limb16 store: out[(l, idx)] with leading limb axis
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
