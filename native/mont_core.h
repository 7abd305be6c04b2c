// Shared u64-limb Montgomery arithmetic core for <= 384-bit prime fields.
// Used by field256.cpp (host data plane) and pairing.cpp (native pairing).
//
// Conventions: little-endian u64 limb arrays of fixed MAXL capacity with an
// active length n64 carried in Ctx; Montgomery radix R = 2^(64 * n64).
#pragma once

#include <cstdint>
#include <cstring>

namespace ozl {

using u32 = uint32_t;
using u64 = uint64_t;
using u128 = unsigned __int128;

constexpr int MAXL = 6;  // 64-bit limbs: up to 384-bit fields

struct Ctx {
  u64 mod[MAXL];
  u64 r2[MAXL];  // R^2 mod p
  u64 n0inv;     // -p^{-1} mod 2^64
  int n64;
  int n16;
};

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
inline void mont_mul(const Ctx& c, const u64* a, const u64* b, u64* out) {
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

// modular add/sub on canonical residues
inline void mod_add(const Ctx& c, const u64* a, const u64* b, u64* out) {
  add_nc(a, b, out, c.n64);  // 2p < 2^(64 n): top carry impossible for our p
  cond_sub_mod(out, c);
}

inline void mod_sub(const Ctx& c, const u64* a, const u64* b, u64* out) {
  u64 t[MAXL];
  if (sub_borrow(a, b, t, c.n64)) {
    add_nc(t, c.mod, out, c.n64);
  } else {
    std::memcpy(out, t, sizeof(u64) * c.n64);
  }
}

// out = a^e mod p (Montgomery in/out); e given as LE bytes
inline void mont_pow(const Ctx& c, const u64* a, const uint8_t* e, int e_len,
                     const u64* one_m, u64* out) {
  u64 acc[MAXL];
  std::memcpy(acc, one_m, sizeof(u64) * c.n64);
  // MSB-first square-and-multiply
  int top = e_len - 1;
  while (top >= 0 && e[top] == 0) --top;
  if (top < 0) {
    std::memcpy(out, one_m, sizeof(u64) * c.n64);
    return;
  }
  int started = 0;
  for (int byte = top; byte >= 0; --byte) {
    for (int bit = 7; bit >= 0; --bit) {
      if (started) mont_mul(c, acc, acc, acc);
      if ((e[byte] >> bit) & 1) {
        if (started) {
          mont_mul(c, acc, a, acc);
        } else {
          std::memcpy(acc, a, sizeof(u64) * c.n64);
          started = 1;
        }
      }
    }
  }
  std::memcpy(out, acc, sizeof(u64) * c.n64);
}

}  // namespace ozl
