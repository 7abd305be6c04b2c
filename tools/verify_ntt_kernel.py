"""Drive the fused Pallas NTT butterfly path on the real TPU chip.

Checks (axon backend, kernel path active):
  1. forward NTT at 2^8 vs the naive host DFT (bit-exact)
  2. coset NTT at 2^8 vs the naive host DFT on g*H
  3. intt(ntt(x)) == x at 2^12
  4. warm latency at 2^18 (same protocol as tools/bench_scale.py)

Run serially (one JAX process): python tools/verify_ntt_kernel.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BLS12_381_FR
from openzl_tpu.ops import ntt as nttmod

assert jax.default_backend() == "tpu", jax.default_backend()

spec = BLS12_381_FR
p = spec.modulus
rng = np.random.default_rng(7)


def naive_dft(coeffs, w, offset=1):
    outs = []
    for j in range(len(coeffs)):
        x = offset * pow(w, j, p) % p
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % p
        outs.append(acc)
    return outs


# 1+2: bit-exactness vs naive DFT at 2^8, standard and coset domain
log_n = 8
n = 1 << log_n
coeffs = [int.from_bytes(rng.bytes(40), "little") % p for _ in range(n)]
packed = jax.numpy.asarray(limb.pack_mont(spec, np.array(coeffs, dtype=object)))
w = nttmod.group_gen(spec, log_n)

got = [int(v) for v in limb.unpack_mont(spec, np.asarray(nttmod.ntt(spec, packed)))]
assert got == naive_dft(coeffs, w), "TPU kernel NTT != naive DFT"
print("ntt 2^8 vs naive DFT: OK", flush=True)

got = [
    int(v)
    for v in limb.unpack_mont(spec, np.asarray(nttmod.coset_ntt(spec, packed)))
]
assert got == naive_dft(coeffs, w, offset=nttmod.GENERATORS[spec.name]), (
    "TPU kernel coset NTT != naive DFT"
)
print("coset_ntt 2^8 vs naive DFT: OK", flush=True)

# 3: round trip at 2^12
x = rng.integers(0, 1 << 16, size=(spec.n_limbs, 1 << 12), dtype=np.uint32)
x[-1] &= 0x3FFF
xd = jax.device_put(x)
back = np.asarray(nttmod.intt(spec, nttmod.ntt(spec, xd)))
assert (back == x).all(), "round trip failed at 2^12"
print("intt(ntt(x)) == x at 2^12: OK", flush=True)

# 4: four-step vs per-stage path at 2^16 (both on device, bit-exact)
x = rng.integers(0, 1 << 16, size=(spec.n_limbs, 1 << 16), dtype=np.uint32)
x[-1] &= 0x3FFF
xd = jax.device_put(x)
t0 = time.perf_counter()
got4 = np.asarray(nttmod.fourstep_transform(spec, xd, False))
print(f"fourstep 2^16 compile+run {time.perf_counter() - t0:.1f}s", flush=True)
legacy = np.asarray(nttmod._ntt_core(spec, xd, False))
assert (got4 == legacy).all(), "fourstep != per-stage path at 2^16"
print("fourstep == per-stage at 2^16: OK", flush=True)
goti = np.asarray(nttmod.fourstep_transform(spec, jax.device_put(got4), True))
assert (goti == x).all(), "fourstep round trip failed at 2^16"
print("fourstep round trip at 2^16: OK", flush=True)

# 5: warm latency (four-step is the dispatch default at these sizes)
for log_n in (18, 20):
    x = rng.integers(0, 1 << 16, size=(spec.n_limbs, 1 << log_n), dtype=np.uint32)
    x[-1] &= 0x3FFF
    xd = jax.device_put(x)
    back = np.asarray(nttmod.intt(spec, nttmod.ntt(spec, xd)))
    assert (back == x).all(), f"round trip failed at 2^{log_n}"
    y = nttmod.ntt(spec, xd)
    np.asarray(y[0, :1])
    t0 = time.perf_counter()
    y = nttmod.ntt(spec, xd)
    np.asarray(y[0, :1])
    dt = time.perf_counter() - t0
    print(f"ntt 2^{log_n} warm: {dt * 1e3:.1f} ms "
          f"(per-stage jnp path was 145.8 ms at 2^18)", flush=True)
