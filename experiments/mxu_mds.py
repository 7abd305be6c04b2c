"""Experiment: Poseidon MDS layer + Montgomery reduction on the MXU.

Per round, the MDS multiply of the whole state by a CONSTANT matrix is a
limb-space convolution -> one bf16 matmul (8-bit limb splits keep every
product exact; f32 accumulations stay < 2^24). The Montgomery reduction of
the resulting lazy columns is two more constant matmuls (M = Xl*N' mod R,
then M*p) plus VPU carry chains. S-boxes stay on the VPU.
"""
import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from openzl_tpu.crypto.poseidon.permutation import Poseidon
from openzl_tpu.fields.spec import BN254_FR as spec, LIMB_BITS
from openzl_tpu.fields import limb as limbmod
from openzl_tpu.ops.poseidon_kernel import _k_mont_mul, _k_add, _k_pow5
from openzl_tpu.ref import poseidon as refp

perm = Poseidon.create(spec, arity=2)
W = perm.width          # 3
N16 = spec.n_limbs      # 16
N8 = 2 * N16            # 32
p_int = spec.modulus
n0inv8 = (-pow(p_int, -1, 1 << 8)) % (1 << 8)   # per-8-bit-limb factor

def to8(x, n8):
    return [(x >> (8*i)) & 0xFF for i in range(n8)]

# ---- constant matrices (host) ----
# MDS conv: A8 concat of W lanes (each N8 8-bit limbs); out cols8 per lane 2*N8
# Wmat[(out_lane o, col k)][(in_lane j, limb i)] = mds8[o][j][k - i]
mds_ints = limbmod.unpack_mont(spec, perm.mds)  # canonical? unpack_mont gives canonical ints of Montgomery-form... careful:
# perm.mds is Montgomery-form limbs; conv must use the MONTGOMERY representative
# (montmul(state, mds_mont) = state*mds*R^{-1}*R = state*mds in mont domain).
mds_mont_ints = limbmod.unpack(spec, perm.mds)  # raw integers of the Montgomery form
Wmat = np.zeros((W * 2 * N8, W * N8), dtype=np.float32)
for o in range(W):
    for j in range(W):
        m8 = to8(int(mds_mont_ints[o, j]), N8)
        for i in range(N8):
            for l in range(N8):
                Wmat[o * 2 * N8 + i + l, j * N8 + i] = m8[l]
# reduction matrices (8-bit radix):
# C1: M = (Xl * N') mod 2^(8*N8): C1[k][i] = N'8[k-i] for k >= i, k < N8
Npr = (-pow(p_int, -1, 1 << (8 * N8))) % (1 << (8 * N8))
Np8 = to8(Npr, N8)
C1 = np.zeros((N8, N8), dtype=np.float32)
for i in range(N8):
    for l in range(N8 - i):
        C1[i + l, i] = Np8[l]
# C2: MP = M * p (full 2*N8 cols)
P8 = to8(p_int, N8)
C2 = np.zeros((2 * N8, N8), dtype=np.float32)
for i in range(N8):
    for l in range(N8):
        C2[i + l, i] = P8[l]

MASK8 = np.uint32(0xFF)

def split8(v16):
    # (N16, S, L) u32 16-bit limbs -> (N8, S, L) 8-bit limbs
    lo = v16 & MASK8
    hi = (v16 >> 8) & MASK8
    return jnp.stack([lo, hi], axis=1).reshape((N8,) + v16.shape[1:])

def join16(v8):
    # (N8, S, L) 8-bit limbs (exact) -> (N16, S, L)
    v = v8.reshape((N16, 2) + v8.shape[1:])
    return v[:, 0] + (v[:, 1] << 8)

def chain8(cols, n_out):
    # carry-propagate 8-bit-radix u32 cols -> n_out exact 8-bit limbs + carry
    outs = []
    carry = jnp.zeros_like(cols[0])
    for i in range(n_out):
        c = (cols[i] if i < cols.shape[0] else jnp.zeros_like(cols[0])) + carry
        outs.append(c & MASK8)
        carry = c >> 8
    return jnp.stack(outs), carry

def _to_bf16(u32_small):
    # u32 -> bf16 unsupported directly in Mosaic; small ints are exact via i32/f32
    return u32_small.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def _to_u32(f32_int):
    return f32_int.astype(jnp.int32).astype(jnp.uint32)


def matmul_cols(Wc, x8_f):  # Wc (rows, K) f32 const; x8_f (K, B2) bf16
    return jax.lax.dot_general(
        Wc.astype(jnp.bfloat16), x8_f,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

def reduce_cols8(c1_ref, c2_ref, cols8):
    """cols8: (2*N8, S, L) u32 lazy 8-bit-radix columns -> (N16,S,L) in [0,2p)."""
    S, L = cols8.shape[1], cols8.shape[2]
    B2 = S * L
    # normalize low N8 cols
    low, c_lo = chain8(cols8[:N8], N8)       # (N8,S,L) exact + carry into col N8
    lowf = _to_bf16(low).reshape(N8, B2)
    M = matmul_cols(c1_ref[:], lowf)          # (N8, B2) f32
    M8, _ = chain8(_to_u32(M).reshape(N8, S, L), N8)  # mod 2^256 (drop carry)
    MP = matmul_cols(c2_ref[:], _to_bf16(M8).reshape(N8, B2))
    MP = _to_u32(MP).reshape(2 * N8, S, L)
    # low half of (low + MP) is divisible by 2^256; compute its carry-out
    low_sum = low + MP[:N8]
    _, c_mid = chain8(low_sum, N8)
    # high half: X_high + MP_high + carries
    high = cols8[N8:]
    total = high + MP[N8:]
    t0 = total[0] + c_lo + c_mid
    total = jnp.concatenate([t0[None], total[1:]], axis=0)
    hi8, c_top = chain8(total, N8)           # c_top must be 0 (< 2p < 2^256... actually (X+MP)/R < 2p fits)
    return join16(hi8)

def _kernel(pref, c1_ref, c2_ref, wref, keys_ref, *refs):
    in_refs = refs[:W]
    out_refs = refs[W:]
    p16 = pref[:]
    n0inv = np.uint32(spec.n0inv)
    half = perm.full_rounds // 2
    mid = half + perm.partial_rounds
    S, L = in_refs[0].shape[2], in_refs[0].shape[3]
    B2 = S * L

    def mds_mxu(xs):
        x8 = jnp.concatenate([split8(x) for x in xs], axis=0)  # (W*N8, S, L)
        x8f = _to_bf16(x8).reshape(W * N8, B2)
        cols = matmul_cols(wref[:], x8f)                       # (W*2N8, B2)
        cols = _to_u32(cols).reshape(W * 2 * N8, S, L)
        return [reduce_cols8(c1_ref, c2_ref, cols[o*2*N8:(o+1)*2*N8]) for o in range(W)]

    def full_round(r, st):
        kr = keys_ref[r]
        xs = [_k_pow5(p16, n0inv, _k_add(p16, st[w], kr[w])) for w in range(W)]
        return tuple(mds_mxu(xs))

    def partial_round(r, st):
        kr = keys_ref[r]
        xs = [_k_add(p16, st[w], kr[w]) for w in range(W)]
        xs[0] = _k_pow5(p16, n0inv, xs[0])
        return tuple(mds_mxu(xs))

    st = tuple(ref[0] for ref in in_refs)
    st = lax.fori_loop(0, half, full_round, st)
    st = lax.fori_loop(half, mid, partial_round, st)
    st = lax.fori_loop(mid, perm.rounds, full_round, st)
    for w in range(W):
        out_refs[w][0] = st[w]

def run(S=32, L=128, B=1<<16):
    tile = S * L
    nb = B // tile
    keys = jnp.swapaxes(jnp.asarray(perm.round_keys), 1, 2)[..., None, None]
    p16 = jnp.asarray(spec.p_limbs)[:, None, None]
    rngs = np.random.RandomState(0)
    lanes = [rngs.randint(0, 1 << 14, size=(nb, N16, S, L)).astype(np.uint32) for _ in range(W)]
    small = pl.BlockSpec(memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((1, N16, S, L), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    f = jax.jit(pl.pallas_call(
        _kernel,
        out_shape=[jax.ShapeDtypeStruct((nb, N16, S, L), jnp.uint32)]*W,
        grid=(nb,),
        in_specs=[small]*5 + [lane_spec]*W,
        out_specs=[lane_spec]*W,
    ))
    args = (p16, jnp.asarray(C1), jnp.asarray(C2), jnp.asarray(Wmat), keys, *[jnp.asarray(l) for l in lanes])
    t0 = time.time()
    o = f(*args)
    _ = np.asarray(o[0][0, 0, 0, 0])
    print("compile+run", round(time.time()-t0, 1), flush=True)
    # correctness vs python oracle on element 0
    params = refp.PoseidonParams.generate(spec, 3, 8, 55)
    R = spec.R
    vals = []
    for l in range(W):
        v = int(limbmod.limbs_to_int(np.asarray(lanes[l])[0, :, 0, 0]))
        vals.append(v * pow(R, -1, p_int) % p_int)
    want = refp.permute(params, vals)
    got = []
    for l in range(W):
        v = int(limbmod.limbs_to_int(np.asarray(o[l])[0, :, 0, 0])) % p_int
        got.append(v * pow(R, -1, p_int) % p_int)
    print("correct:", got == want, flush=True)
    if got != want:
        print("got ", got, flush=True)
        print("want", want, flush=True)
        return
    # throughput: chained in one jit
    @jax.jit
    def chained(ls):
        def body(i, cur):
            out = f(*args[:5], *cur)
            return tuple(out)
        return lax.fori_loop(0, 20, body, ls)
    o2 = chained(tuple(jnp.asarray(l) for l in lanes))
    _ = np.asarray(o2[0][0,0,0,0])
    t0 = time.time()
    o2 = chained(tuple(jnp.asarray(l) for l in lanes))
    _ = np.asarray(o2[0][0,0,0,0])
    dt = (time.time()-t0)/20
    print(f"MXU-MDS perm: {B/dt/1e6:.2f} M perms/s ({dt*1e3:.1f} ms/batch)", flush=True)

if __name__ == "__main__":
    run()
