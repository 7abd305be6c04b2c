// Native witness-tape evaluator: replays the R1CS hint tape recorded by
// openzl_tpu/eclair/compilers.py (see openzl_tpu/eclair/witness.py for the
// flattened format) to derive the full Groth16 assignment from leaf values.
// This is the native runtime's answer to re-running arkworks circuit
// synthesis per proof (reference plugins/arkworks/src/constraint/mod.rs:
// 179-197): one sequential pass of Montgomery ops instead of a Python
// gadget re-trace.
//
// Op row layout (8 x int32, matching witness.py):
//   [op, a_start, a_end, b_start, b_end, out_col, n_out, aux]
// ops: 0=MUL  z[out] = <A,z> * <B,z>
//      1=INV  z[out] = <A,z>^-1           (error 2 on zero)
//      2=ISZERO  z[out] = [<A,z>==0], z[out+1] = 0 or <A,z>^-1
//      3=BITS    z[out+i] = bit i of canonical <A,z>, i < n_out
//      4=DIVMOD  (z[out], z[out+1]) = divmod(canonical <A,z>, moduli[aux])
//
// All state is kept in the Montgomery domain; the z buffer is canonical LE
// bytes on entry (preset columns) and exit (every column).

#include "mont_core.h"

#include <cstdlib>

namespace {

using namespace ozl;

// r = (r << 1) | bit
inline void shl1_or(u64* r, int n, u64 bit) {
  u64 carry = bit;
  for (int i = 0; i < n; ++i) {
    u64 nc = r[i] >> 63;
    r[i] = (r[i] << 1) | carry;
    carry = nc;
  }
}

// canonical restoring division: (q, rem) = divmod(a, m), all n-limb
inline void div_rem(const u64* a, const u64* m, int n, u64* q, u64* rem) {
  std::memset(q, 0, sizeof(u64) * n);
  std::memset(rem, 0, sizeof(u64) * n);
  for (int i = n * 64 - 1; i >= 0; --i) {
    shl1_or(rem, n, (a[i / 64] >> (i % 64)) & 1);
    if (geq(rem, m, n)) {
      u64 t[MAXL];
      sub_borrow(rem, m, t, n);
      std::memcpy(rem, t, sizeof(u64) * n);
      q[i / 64] |= 1ull << (i % 64);
    }
  }
}

inline bool is_zero(const u64* a, int n) {
  for (int i = 0; i < n; ++i)
    if (a[i]) return false;
  return true;
}

}  // namespace

extern "C" int ozl_witness_eval(
    const uint8_t* mod_b, const uint8_t* r2_b, uint64_t n0inv, int n64,
    const uint8_t* inv_exp, int inv_exp_len,  // p-2, LE bytes
    int64_t n_vars,
    const int32_t* preset_cols, int64_t n_preset,
    const int32_t* ops, int64_t n_ops,
    const int32_t* lc_cols,
    const uint8_t* lc_coeffs_mont,  // stride n64*8, Montgomery form
    const uint8_t* moduli,          // stride n64*8, canonical
    uint8_t* z_bytes) {             // in/out, stride n64*8, canonical
  Ctx c;
  std::memset(&c, 0, sizeof(c));
  bytes_to_u64(mod_b, n64 * 8, c.mod, n64);
  bytes_to_u64(r2_b, n64 * 8, c.r2, n64);
  c.n0inv = n0inv;
  c.n64 = n64;
  const int stride = n64 * 8;

  u64 one_raw[MAXL] = {1, 0, 0, 0, 0, 0};
  u64 one_m[MAXL];
  mont_mul(c, c.r2, one_raw, one_m);  // R mod p

  u64* z = (u64*)std::calloc((size_t)n_vars * n64, sizeof(u64));
  if (!z) return 1;

  // preset columns: canonical bytes -> Montgomery
  for (int64_t i = 0; i < n_preset; ++i) {
    int64_t col = preset_cols[i];
    u64 v[MAXL];
    bytes_to_u64(z_bytes + col * stride, stride, v, n64);
    mont_mul(c, v, c.r2, z + col * n64);
  }

  const u64* coeffs = (const u64*)lc_coeffs_mont;
  u64 a_val[MAXL], b_val[MAXL], t[MAXL], can[MAXL];

  auto eval_lc = [&](int32_t s, int32_t e, u64* out) {
    std::memset(out, 0, sizeof(u64) * n64);
    for (int32_t i = s; i < e; ++i) {
      mont_mul(c, coeffs + (size_t)i * n64, z + (size_t)lc_cols[i] * n64, t);
      mod_add(c, out, t, out);
    }
  };

  int rc = 0;
  for (int64_t i = 0; i < n_ops && rc == 0; ++i) {
    const int32_t* r = ops + i * 8;
    const int32_t op = r[0];
    const int64_t out = r[5];
    eval_lc(r[1], r[2], a_val);
    switch (op) {
      case 0:  // MUL
        eval_lc(r[3], r[4], b_val);
        mont_mul(c, a_val, b_val, z + out * n64);
        break;
      case 1:  // INV
        if (is_zero(a_val, n64)) {
          rc = 2;
          break;
        }
        mont_pow(c, a_val, inv_exp, inv_exp_len, one_m, z + out * n64);
        break;
      case 2:  // ISZERO
        if (is_zero(a_val, n64)) {
          std::memcpy(z + out * n64, one_m, sizeof(u64) * n64);
          std::memset(z + (out + 1) * n64, 0, sizeof(u64) * n64);
        } else {
          std::memset(z + out * n64, 0, sizeof(u64) * n64);
          mont_pow(c, a_val, inv_exp, inv_exp_len, one_m,
                   z + (out + 1) * n64);
        }
        break;
      case 3: {  // BITS
        mont_mul(c, a_val, one_raw, can);  // -> canonical
        for (int32_t k = 0; k < r[6]; ++k) {
          u64 bit = (can[k / 64] >> (k % 64)) & 1;
          if (bit)
            std::memcpy(z + (out + k) * n64, one_m, sizeof(u64) * n64);
          else
            std::memset(z + (out + k) * n64, 0, sizeof(u64) * n64);
        }
        break;
      }
      case 4: {  // DIVMOD
        mont_mul(c, a_val, one_raw, can);
        u64 m[MAXL], q[MAXL], rem[MAXL];
        bytes_to_u64(moduli + (size_t)r[7] * stride, stride, m, n64);
        div_rem(can, m, n64, q, rem);
        mont_mul(c, q, c.r2, z + out * n64);
        mont_mul(c, rem, c.r2, z + (out + 1) * n64);
        break;
      }
      default:
        rc = 3;
    }
  }

  if (rc == 0) {
    // every column back to canonical bytes
    for (int64_t col = 0; col < n_vars; ++col) {
      mont_mul(c, z + col * n64, one_raw, can);
      u64_to_bytes(can, n64, z_bytes + col * stride, stride);
    }
  }
  std::free(z);
  return rc;
}
