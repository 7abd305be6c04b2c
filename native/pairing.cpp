// Native ate pairing over BN254 / BLS12-381 / BLS12-377 (host-side O(1)
// verify path).
//
// Same auditable construction as the pure-Python oracle
// (openzl_tpu/ref/pairing.py, which replaces the reference's ark-ec
// PairingEngine — SURVEY.md sections 2.5, 3.3): untwist Q into E(Fp12) and
// run an affine Miller loop with loop count t-1 (classic ate; negative BLS
// x handled by conjugation). Two engineering upgrades over the oracle:
//   * one lambda (so one inversion) per Miller step, shared by the line
//     evaluation and the point update;
//   * staged final exponentiation — easy part (p^6-1)(p^2+1) via
//     conjugate/inverse/Frobenius, hard part (p^4-p^2+1)/r by
//     square-and-multiply — instead of a direct (p^12-1)/r power.
//
// All curve constants (Montgomery parameters, xi, ate loop, exponent bytes,
// the p^2-Frobenius scalar gamma_w = xi^((p^2-1)/6) in Fq) are computed by
// the Python wrapper (openzl_tpu/native) and passed in; nothing here is
// curve-specific. C ABI only (ctypes; no pybind11 in the image).

#include "mont_core.h"

namespace {

using namespace ozl;
using u8 = uint8_t;

struct PCtx {
  Ctx fq;
  u64 one[MAXL];  // R mod p (Montgomery 1)
  int beta_abs;   // Fq2: u^2 = -beta_abs
  const u8* inv_exp;  // p - 2, LE bytes (Fermat inversion)
  int inv_exp_len;
};

struct Fq {
  u64 v[MAXL];
};
struct Fq2 {
  Fq c[2];
};
struct Fq6 {
  Fq2 c[3];
};  // basis 1, v, v^2 with v^3 = xi
struct Fq12 {
  Fq6 c[2];
};  // basis 1, w with w^2 = v

// ---- Fq ------------------------------------------------------------------

inline void fq_add(const PCtx& P, const Fq& a, const Fq& b, Fq& o) {
  mod_add(P.fq, a.v, b.v, o.v);
}
inline void fq_sub(const PCtx& P, const Fq& a, const Fq& b, Fq& o) {
  mod_sub(P.fq, a.v, b.v, o.v);
}
inline void fq_mul(const PCtx& P, const Fq& a, const Fq& b, Fq& o) {
  mont_mul(P.fq, a.v, b.v, o.v);
}
inline void fq_zero(Fq& o) { std::memset(o.v, 0, sizeof(o.v)); }
inline void fq_one(const PCtx& P, Fq& o) {
  fq_zero(o);
  std::memcpy(o.v, P.one, sizeof(u64) * P.fq.n64);
}
inline void fq_neg(const PCtx& P, const Fq& a, Fq& o) {
  Fq z;
  fq_zero(z);
  fq_sub(P, z, a, o);
}
inline bool fq_eq(const PCtx& P, const Fq& a, const Fq& b) {
  return std::memcmp(a.v, b.v, sizeof(u64) * P.fq.n64) == 0;
}
inline void fq_inv(const PCtx& P, const Fq& a, Fq& o) {
  mont_pow(P.fq, a.v, P.inv_exp, P.inv_exp_len, P.one, o.v);
}
// o = k * a for tiny static k (doubling chain)
inline void fq_small(const PCtx& P, const Fq& a, int k, Fq& o) {
  Fq bit = a, acc;
  bool has = false;
  while (k) {
    if (k & 1) {
      if (has) {
        fq_add(P, acc, bit, acc);
      } else {
        acc = bit;
        has = true;
      }
    }
    k >>= 1;
    if (k) fq_add(P, bit, bit, bit);
  }
  if (!has) fq_zero(acc);
  o = acc;
}

// ---- Fq2 (u^2 = -beta_abs) ------------------------------------------------

inline void f2_add(const PCtx& P, const Fq2& a, const Fq2& b, Fq2& o) {
  fq_add(P, a.c[0], b.c[0], o.c[0]);
  fq_add(P, a.c[1], b.c[1], o.c[1]);
}
inline void f2_sub(const PCtx& P, const Fq2& a, const Fq2& b, Fq2& o) {
  fq_sub(P, a.c[0], b.c[0], o.c[0]);
  fq_sub(P, a.c[1], b.c[1], o.c[1]);
}
inline void f2_neg(const PCtx& P, const Fq2& a, Fq2& o) {
  fq_neg(P, a.c[0], o.c[0]);
  fq_neg(P, a.c[1], o.c[1]);
}
inline void f2_mul(const PCtx& P, const Fq2& a, const Fq2& b, Fq2& o) {
  Fq m0, m1, m2, s0, s1, t;
  fq_mul(P, a.c[0], b.c[0], m0);
  fq_mul(P, a.c[1], b.c[1], m1);
  fq_add(P, a.c[0], a.c[1], s0);
  fq_add(P, b.c[0], b.c[1], s1);
  fq_mul(P, s0, s1, m2);
  fq_small(P, m1, P.beta_abs, t);  // |beta| * a1 b1
  fq_sub(P, m0, t, o.c[0]);        // a0b0 + beta a1b1
  fq_sub(P, m2, m0, t);
  fq_sub(P, t, m1, o.c[1]);
}
inline void f2_sqr(const PCtx& P, const Fq2& a, Fq2& o) { f2_mul(P, a, a, o); }
inline void f2_inv(const PCtx& P, const Fq2& a, Fq2& o) {
  Fq n0, n1, norm, ninv;
  fq_mul(P, a.c[0], a.c[0], n0);
  fq_mul(P, a.c[1], a.c[1], n1);
  fq_small(P, n1, P.beta_abs, n1);
  fq_add(P, n0, n1, norm);  // a0^2 + |beta| a1^2
  fq_inv(P, norm, ninv);
  fq_mul(P, a.c[0], ninv, o.c[0]);
  Fq t;
  fq_mul(P, a.c[1], ninv, t);
  fq_neg(P, t, o.c[1]);
}
inline void f2_zero(Fq2& o) {
  fq_zero(o.c[0]);
  fq_zero(o.c[1]);
}
inline void f2_scale_fq(const PCtx& P, const Fq2& a, const Fq& s, Fq2& o) {
  fq_mul(P, a.c[0], s, o.c[0]);
  fq_mul(P, a.c[1], s, o.c[1]);
}

// ---- Fq6 (v^3 = xi) --------------------------------------------------------

struct TCtx {  // tower context: PCtx + xi
  PCtx P;
  Fq2 xi;
};

inline void f2_mul_xi(const TCtx& T, const Fq2& a, Fq2& o) {
  f2_mul(T.P, a, T.xi, o);
}

inline void f6_add(const TCtx& T, const Fq6& a, const Fq6& b, Fq6& o) {
  for (int i = 0; i < 3; ++i) f2_add(T.P, a.c[i], b.c[i], o.c[i]);
}
inline void f6_sub(const TCtx& T, const Fq6& a, const Fq6& b, Fq6& o) {
  for (int i = 0; i < 3; ++i) f2_sub(T.P, a.c[i], b.c[i], o.c[i]);
}
inline void f6_neg(const TCtx& T, const Fq6& a, Fq6& o) {
  for (int i = 0; i < 3; ++i) f2_neg(T.P, a.c[i], o.c[i]);
}
inline void f6_zero(Fq6& o) {
  for (int i = 0; i < 3; ++i) f2_zero(o.c[i]);
}

inline void f6_mul(const TCtx& T, const Fq6& a, const Fq6& b, Fq6& o) {
  const PCtx& P = T.P;
  Fq2 m0, m1, m2, t0, t1, t2, s0, s1;
  f2_mul(P, a.c[0], b.c[0], m0);
  f2_mul(P, a.c[1], b.c[1], m1);
  f2_mul(P, a.c[2], b.c[2], m2);
  // c0 = m0 + xi ((a1+a2)(b1+b2) - m1 - m2)
  f2_add(P, a.c[1], a.c[2], s0);
  f2_add(P, b.c[1], b.c[2], s1);
  f2_mul(P, s0, s1, t0);
  f2_sub(P, t0, m1, t0);
  f2_sub(P, t0, m2, t0);
  f2_mul_xi(T, t0, t0);
  // c1 = (a0+a1)(b0+b1) - m0 - m1 + xi m2
  f2_add(P, a.c[0], a.c[1], s0);
  f2_add(P, b.c[0], b.c[1], s1);
  f2_mul(P, s0, s1, t1);
  f2_sub(P, t1, m0, t1);
  f2_sub(P, t1, m1, t1);
  Fq2 xm2;
  f2_mul_xi(T, m2, xm2);
  f2_add(P, t1, xm2, t1);
  // c2 = (a0+a2)(b0+b2) - m0 - m2 + m1
  f2_add(P, a.c[0], a.c[2], s0);
  f2_add(P, b.c[0], b.c[2], s1);
  f2_mul(P, s0, s1, t2);
  f2_sub(P, t2, m0, t2);
  f2_sub(P, t2, m2, t2);
  f2_add(P, t2, m1, t2);
  f2_add(P, t0, m0, o.c[0]);
  o.c[1] = t1;
  o.c[2] = t2;
}

inline void f6_inv(const TCtx& T, const Fq6& a, Fq6& o) {
  const PCtx& P = T.P;
  Fq2 t0, t1, t2, s, tmp, denom;
  // t0 = a0^2 - xi a1 a2 ; t1 = xi a2^2 - a0 a1 ; t2 = a1^2 - a0 a2
  f2_sqr(P, a.c[0], t0);
  f2_mul(P, a.c[1], a.c[2], tmp);
  f2_mul_xi(T, tmp, tmp);
  f2_sub(P, t0, tmp, t0);
  f2_sqr(P, a.c[2], t1);
  f2_mul_xi(T, t1, t1);
  f2_mul(P, a.c[0], a.c[1], tmp);
  f2_sub(P, t1, tmp, t1);
  f2_sqr(P, a.c[1], t2);
  f2_mul(P, a.c[0], a.c[2], tmp);
  f2_sub(P, t2, tmp, t2);
  // denom = a0 t0 + xi (a2 t1 + a1 t2)
  f2_mul(P, a.c[2], t1, s);
  f2_mul(P, a.c[1], t2, tmp);
  f2_add(P, s, tmp, s);
  f2_mul_xi(T, s, s);
  f2_mul(P, a.c[0], t0, tmp);
  f2_add(P, s, tmp, denom);
  Fq2 dinv;
  f2_inv(P, denom, dinv);
  f2_mul(P, t0, dinv, o.c[0]);
  f2_mul(P, t1, dinv, o.c[1]);
  f2_mul(P, t2, dinv, o.c[2]);
}

inline void f6_mul_by_v(const TCtx& T, const Fq6& a, Fq6& o) {
  Fq2 t;
  f2_mul_xi(T, a.c[2], t);
  Fq2 a0 = a.c[0], a1 = a.c[1];
  o.c[0] = t;
  o.c[1] = a0;
  o.c[2] = a1;
}

// ---- Fq12 (w^2 = v) --------------------------------------------------------

inline void f12_zero(Fq12& o) {
  f6_zero(o.c[0]);
  f6_zero(o.c[1]);
}
inline void f12_one(const TCtx& T, Fq12& o) {
  f12_zero(o);
  fq_one(T.P, o.c[0].c[0].c[0]);
}
inline bool f12_eq(const TCtx& T, const Fq12& a, const Fq12& b) {
  const int n = T.P.fq.n64;
  for (int h = 0; h < 2; ++h)
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 2; ++j)
        if (std::memcmp(a.c[h].c[i].c[j].v, b.c[h].c[i].c[j].v,
                        sizeof(u64) * n) != 0)
          return false;
  return true;
}
inline void f12_add(const TCtx& T, const Fq12& a, const Fq12& b, Fq12& o) {
  f6_add(T, a.c[0], b.c[0], o.c[0]);
  f6_add(T, a.c[1], b.c[1], o.c[1]);
}
inline void f12_sub(const TCtx& T, const Fq12& a, const Fq12& b, Fq12& o) {
  f6_sub(T, a.c[0], b.c[0], o.c[0]);
  f6_sub(T, a.c[1], b.c[1], o.c[1]);
}
inline void f12_mul(const TCtx& T, const Fq12& a, const Fq12& b, Fq12& o) {
  Fq6 m0, m1, s0, s1, t;
  f6_mul(T, a.c[0], b.c[0], m0);
  f6_mul(T, a.c[1], b.c[1], m1);
  f6_add(T, a.c[0], a.c[1], s0);
  f6_add(T, b.c[0], b.c[1], s1);
  f6_mul(T, s0, s1, t);
  f6_sub(T, t, m0, t);
  f6_sub(T, t, m1, t);  // cross term
  Fq6 vm1;
  f6_mul_by_v(T, m1, vm1);
  f6_add(T, m0, vm1, o.c[0]);
  o.c[1] = t;
}
inline void f12_sqr(const TCtx& T, const Fq12& a, Fq12& o) {
  f12_mul(T, a, a, o);
}
inline void f12_conj(const TCtx& T, const Fq12& a, Fq12& o) {
  o.c[0] = a.c[0];
  f6_neg(T, a.c[1], o.c[1]);
}
inline void f12_inv(const TCtx& T, const Fq12& a, Fq12& o) {
  // 1/(a0 + a1 w) = (a0 - a1 w) / (a0^2 - v a1^2)
  Fq6 s0, s1, denom, dinv;
  f6_mul(T, a.c[0], a.c[0], s0);
  f6_mul(T, a.c[1], a.c[1], s1);
  f6_mul_by_v(T, s1, s1);
  f6_sub(T, s0, s1, denom);
  f6_inv(T, denom, dinv);
  f6_mul(T, a.c[0], dinv, o.c[0]);
  Fq6 t;
  f6_mul(T, a.c[1], dinv, t);
  f6_neg(T, t, o.c[1]);
}
// out = a^e, e LE bytes (square-and-multiply, MSB-first)
inline void f12_pow(const TCtx& T, const Fq12& a, const u8* e, int e_len,
                    Fq12& out) {
  Fq12 acc;
  f12_one(T, acc);
  int top = e_len - 1;
  while (top >= 0 && e[top] == 0) --top;
  bool started = false;
  for (int byte = top; byte >= 0; --byte) {
    for (int bit = 7; bit >= 0; --bit) {
      if (started) f12_sqr(T, acc, acc);
      if ((e[byte] >> bit) & 1) {
        if (started) {
          f12_mul(T, acc, a, acc);
        } else {
          acc = a;
          started = true;
        }
      }
    }
  }
  out = acc;
}
// p^2-Frobenius: coefficient of v^i w^j scales by gw^(2i + j), gw in Fq
inline void f12_frob_p2(const TCtx& T, const Fq12& a, const Fq& gw, Fq12& o) {
  Fq pw[6];
  fq_one(T.P, pw[0]);
  for (int k = 1; k < 6; ++k) fq_mul(T.P, pw[k - 1], gw, pw[k]);
  for (int j = 0; j < 2; ++j)
    for (int i = 0; i < 3; ++i)
      f2_scale_fq(T.P, a.c[j].c[i], pw[2 * i + j], o.c[j].c[i]);
}

// ---- E(Fp12) affine Miller loop (mirrors ref/pairing.py) -------------------

struct Pt12 {
  Fq12 x, y;
  bool inf;
};

// One Miller step vs point B: computes the line through (A, B) at (xp, yp)
// AND the sum A + B, sharing a single lambda (one Fq12 inversion).
// Vertical case (B = -A): line = xp - xA, sum = infinity.
inline void step(const TCtx& T, const Pt12& A, const Pt12& B, const Fq12& xp,
                 const Fq12& yp, Fq12& line, Pt12& sum) {
  Fq12 num, den, lam, t;
  bool same_x = f12_eq(T, A.x, B.x);
  if (same_x && !f12_eq(T, A.y, B.y)) {
    f12_sub(T, xp, A.x, line);
    sum.inf = true;
    return;
  }
  if (same_x) {
    // tangent: lam = 3 x^2 / 2 y
    Fq12 x2;
    f12_sqr(T, A.x, x2);
    f12_add(T, x2, x2, num);
    f12_add(T, num, x2, num);  // 3 x^2
    f12_add(T, A.y, A.y, den);
  } else {
    f12_sub(T, B.y, A.y, num);
    f12_sub(T, B.x, A.x, den);
  }
  f12_inv(T, den, t);
  f12_mul(T, num, t, lam);
  // line = yp - yA - lam (xp - xA)
  Fq12 u;
  f12_sub(T, xp, A.x, u);
  f12_mul(T, lam, u, u);
  f12_sub(T, yp, A.y, line);
  f12_sub(T, line, u, line);
  // sum: x3 = lam^2 - xA - xB ; y3 = lam (xA - x3) - yA
  Fq12 x3, y3;
  f12_sqr(T, lam, x3);
  f12_sub(T, x3, A.x, x3);
  f12_sub(T, x3, B.x, x3);
  f12_sub(T, A.x, x3, y3);
  f12_mul(T, lam, y3, y3);
  f12_sub(T, y3, A.y, y3);
  sum.x = x3;
  sum.y = y3;
  sum.inf = false;
}

}  // namespace

extern "C" {

// Returns 1 if prod e(P_i, Q_i) == 1, 0 otherwise, -1 on bad parameters.
// All field elements are canonical little-endian byte strings of
// stride = n64*8 bytes. Per pair layout: P.x, P.y, Q.x.c0, Q.x.c1,
// Q.y.c0, Q.y.c1 (6 strides). Infinite P/Q pairs must be pre-filtered by
// the caller.
int ozl_pairing_product_is_one(
    const uint8_t* mod_b, const uint8_t* r2_b, u64 n0inv, int n64,
    int beta_abs, const uint8_t* xi_b, int twist_d, const uint8_t* ate_b,
    int ate_len, int ate_negative, const uint8_t* inv_exp, int inv_exp_len,
    const uint8_t* hard_exp, int hard_len, const uint8_t* gw_b,
    const uint8_t* pairs, int n_pairs) {
  if (n64 > MAXL || n64 < 1) return -1;
  const int stride = n64 * 8;

  TCtx T;
  std::memset(&T, 0, sizeof(T));
  PCtx& P = T.P;
  bytes_to_u64(mod_b, stride, P.fq.mod, n64);
  bytes_to_u64(r2_b, stride, P.fq.r2, n64);
  P.fq.n0inv = n0inv;
  P.fq.n64 = n64;
  P.beta_abs = beta_abs;
  P.inv_exp = inv_exp;
  P.inv_exp_len = inv_exp_len;
  // one = R mod p = mont(1): mont_mul(1, R^2) = R
  u64 raw1[MAXL] = {1};
  mont_mul(P.fq, raw1, P.fq.r2, P.one);

  auto load_fq = [&](const u8* b, Fq& o) {
    u64 raw[MAXL];
    bytes_to_u64(b, stride, raw, n64);
    mont_mul(P.fq, raw, P.fq.r2, o.v);  // to Montgomery
  };
  load_fq(xi_b, T.xi.c[0]);
  load_fq(xi_b + stride, T.xi.c[1]);
  Fq gw;
  load_fq(gw_b, gw);

  // ate loop bits, MSB-first, skipping the leading 1
  int top_byte = ate_len - 1;
  while (top_byte >= 0 && ate_b[top_byte] == 0) --top_byte;
  if (top_byte < 0) return -1;
  int top_bit = 7;
  while (!((ate_b[top_byte] >> top_bit) & 1)) --top_bit;

  Fq2 xi_inv;
  if (!twist_d) f2_inv(P, T.xi, xi_inv);

  Fq12 acc;
  f12_one(T, acc);

  for (int pair = 0; pair < n_pairs; ++pair) {
    const u8* base = pairs + (size_t)pair * 6 * stride;
    Fq xp_fq, yp_fq;
    load_fq(base, xp_fq);
    load_fq(base + stride, yp_fq);
    Fq2 qx, qy;
    load_fq(base + 2 * stride, qx.c[0]);
    load_fq(base + 3 * stride, qx.c[1]);
    load_fq(base + 4 * stride, qy.c[0]);
    load_fq(base + 5 * stride, qy.c[1]);

    Fq12 xp, yp;
    f12_zero(xp);
    xp.c[0].c[0].c[0] = xp_fq;
    f12_zero(yp);
    yp.c[0].c[0].c[0] = yp_fq;

    // untwist (ref/pairing.py _untwist): D: (x v, y v w); M: (x v^2 / xi,
    // y v w / xi)
    Pt12 Q;
    Q.inf = false;
    f12_zero(Q.x);
    f12_zero(Q.y);
    if (twist_d) {
      Q.x.c[0].c[1] = qx;  // x * v
      Q.y.c[1].c[1] = qy;  // y * v * w
    } else {
      Fq2 t;
      f2_mul(P, qx, xi_inv, t);
      Q.x.c[0].c[2] = t;  // x v^2 / xi
      f2_mul(P, qy, xi_inv, t);
      Q.y.c[1].c[1] = t;  // y v w / xi
    }

    Fq12 f;
    f12_one(T, f);
    Pt12 R = Q;
    // walk bits below the MSB
    int byte = top_byte, bit = top_bit;
    for (;;) {
      --bit;
      if (bit < 0) {
        --byte;
        if (byte < 0) break;
        bit = 7;
      }
      Fq12 line;
      Pt12 Rn;
      f12_sqr(T, f, f);
      step(T, R, R, xp, yp, line, Rn);
      f12_mul(T, f, line, f);
      R = Rn;
      if (R.inf) return -1;  // unreachable for valid subgroup inputs
      if ((ate_b[byte] >> bit) & 1) {
        step(T, R, Q, xp, yp, line, Rn);
        f12_mul(T, f, line, f);
        R = Rn;
        if (R.inf) return -1;
      }
    }
    if (ate_negative) f12_conj(T, f, f);
    f12_mul(T, acc, f, acc);
  }

  // final exponentiation: easy (p^6-1)(p^2+1), then hard (p^4-p^2+1)/r
  Fq12 g, t;
  f12_conj(T, acc, g);
  f12_inv(T, acc, t);
  f12_mul(T, g, t, g);  // ^(p^6 - 1)
  f12_frob_p2(T, g, gw, t);
  f12_mul(T, t, g, g);  // ^(p^2 + 1)
  Fq12 out;
  f12_pow(T, g, hard_exp, hard_len, out);

  Fq12 one;
  f12_one(T, one);
  return f12_eq(T, out, one) ? 1 : 0;
}

}  // extern "C"
