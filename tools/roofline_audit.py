"""Per-kernel roofline audit on the real TPU chip (BASELINE.md "kernel
efficiency" row): measured montmul throughput of every Pallas kernel vs the
chip's measured limb-multiply speed-of-light.

Ceiling: a bare elementwise Montgomery-multiply kernel at the best batch
tile IS the speed-of-light for this workload — every kernel below does the
same limb arithmetic plus its algorithm-specific data movement, so
"fraction of mont ceiling" is the honest efficiency number.

Timing protocol: K iterations chained through `lax.scan` inside one jit,
fenced by readback (a single axon dispatch costs ~35 ms and
block_until_ready does not fence; see docs/performance.md).

Run serially: python tools/roofline_audit.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/openzl_tpu_jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
from jax import lax

from openzl_tpu.fields import limb
from openzl_tpu.fields.spec import BLS12_381_FQ, BLS12_381_FR, BN254_FR
from openzl_tpu.ops import ntt as nttmod
from openzl_tpu.ops import ntt_kernel

K = 32
ROWS = []


def scan_time(fn, x, iters=K):
    @jax.jit
    def chain(v):
        out, _ = lax.scan(lambda c, _: (fn(c), None), v, None, length=iters)
        return out

    out = chain(x)
    np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    out = chain(x)
    np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / iters


def report(name, montmuls, secs, note=""):
    rate = montmuls / secs / 1e6
    ROWS.append((name, montmuls, secs * 1e3, rate, note))
    print(f"{name:34s} {secs*1e3:8.2f} ms  {rate:9.1f} M montmul/s  {note}",
          flush=True)


def main():
    rng = np.random.default_rng(11)

    # --- ceiling: bare mont_mul kernel, 16 limbs (Fr) ------------------
    spec = BLS12_381_FR
    N = 1 << 20
    a = rng.integers(0, 1 << 16, size=(spec.n_limbs, N), dtype=np.uint32)
    a[-1] &= 0x3FFF
    ad = jax.device_put(a)
    dt = scan_time(lambda v: ntt_kernel.mont_mul(spec, v, v), ad)
    ceil16 = N / dt
    report("mont_mul 16-limb (ceiling)", N, dt)

    # --- ceiling: 24 limbs (Fq, EC kernels) ----------------------------
    fq = BLS12_381_FQ
    aq = rng.integers(0, 1 << 16, size=(fq.n_limbs, N), dtype=np.uint32)
    aq[-1] &= 0x3FF
    aqd = jax.device_put(aq)
    dtq = scan_time(lambda v: ntt_kernel.mont_mul(fq, v, v), aqd)
    ceil24 = N / dtq
    report("mont_mul 24-limb (ceiling)", N, dtq)

    # --- fused NTT kernel: montmuls = N/2 * log2(M) per pass -----------
    for log_n in (18, 20):
        n = 1 << log_n
        x = rng.integers(0, 1 << 16, size=(spec.n_limbs, n), dtype=np.uint32)
        x[-1] &= 0x3FFF
        xd = jax.device_put(x)
        tables = nttmod._fourstep_tables(
            spec, log_n, False, ntt_kernel._M_MAX, 1
        )
        dt = scan_time(
            lambda v: nttmod._fourstep_core(spec, v, tables, False), xd
        )
        # butterfly montmuls + one twiddle mul per non-base level
        mm = n // 2 * log_n
        eff = (mm / dt) / ceil16
        report(
            f"four-step NTT 2^{log_n}", mm, dt,
            f"({eff:.0%} of 16-limb ceiling, butterflies only)",
        )

    # --- Poseidon2 kernel (headline) -----------------------------------
    from openzl_tpu.crypto.poseidon2 import Poseidon2
    from openzl_tpu.ops import poseidon2_kernel

    p2spec = BN254_FR
    p2 = Poseidon2.create(p2spec, 2)
    batch = 1 << 16
    st = rng.integers(0, 1 << 16, size=(p2spec.n_limbs, 3, batch), dtype=np.uint32)
    st[-1] &= 0x3FFF
    std = jax.device_put(st)
    dt = scan_time(lambda v: poseidon2_kernel.permute(p2, v), std)
    # S-boxes only: (8 full rounds * 3 + 56 partial * 1) pow5 = 2 muls each
    mm = batch * (8 * 3 + 56) * 2
    report(
        f"poseidon2 batch 2^16", mm, dt,
        f"({batch/dt/1e6:.2f} M perms/s; S-box montmuls only)",
    )

    # --- EC add kernel (24-limb): 11M+5S = 16 montmuls per add ---------
    from openzl_tpu.curves import BLS12_381_G1
    from openzl_tpu.ops import ec_kernel

    nb = 1 << 17
    coords = []
    for _ in range(6):
        c = rng.integers(0, 1 << 16, size=(fq.n_limbs, nb), dtype=np.uint32)
        c[-1] &= 0x3FF
        coords.append(jax.device_put(c))

    def ec_add(v):
        x3, y3, z3 = ec_kernel.ec_op(
            fq, "add", v, coords[1], coords[2], coords[3], coords[4], coords[5]
        )
        return x3

    dt = scan_time(ec_add, coords[0])
    mm = nb * 16  # add-2007-bl 11M+5S; masked double path shares the pass
    eff = (mm / dt) / ceil24
    report(
        f"EC add kernel 2^17 pts", mm, dt,
        f"({eff:.0%} of 24-limb ceiling; formula montmuls only)",
    )

    # --- full MSM pipeline (sort+fold+scan overheads included) ----------
    from openzl_tpu.fields import limb as limbmod
    from openzl_tpu.ops import msm as msmmod

    curve = BLS12_381_G1
    log_n = 18
    nm = 1 << log_n
    d = rng.integers(1, 1 << 63, size=nm, dtype=np.uint64)
    pts = msmmod.fixed_base_msm(
        curve, jnp.asarray(limbmod.pack(curve.scalar, d.astype(object))),
        n_bits=64,
    )
    np.asarray(pts.x[0, :1])
    import random as pyrandom

    pyr = pyrandom.Random(5)
    rmod = curve.scalar.modulus
    sv = [pyr.randrange(rmod) for _ in range(nm)]
    sk = jax.device_put(
        jnp.asarray(limbmod.pack(curve.scalar, np.array(sv, dtype=object)))
    )
    out = msmmod.msm(curve, sk, pts)
    np.asarray(out.x[:1])
    t0 = time.perf_counter()
    for _ in range(3):
        out = msmmod.msm(curve, sk, pts)
        np.asarray(out.x[:1])
    dtm = (time.perf_counter() - t0) / 3
    cw = msmmod._default_window_bits(nm, 255)
    windows = -(-255 // cw)
    # mixed adds ~11 montmuls; dense adds ~16; sum over the pipeline stages:
    # per window n mixed folds + ~3*2^c dense (lifted scan + 2 weighted
    # scans at bucket width, log-depth counted as ~2x width)
    mm = windows * (nm * 11 + 3 * (1 << cw) * 16)
    eff = (mm / dtm) / ceil24
    report(
        f"full MSM 2^{log_n} (c={cw})", mm, dtm,
        f"({eff:.0%} of 24-limb ceiling incl. sort/gather/launch overhead)",
    )

    # XLA's own accounting of the full MSM executable
    try:
        lowered = msmmod._msm_jit.lower(curve, np.asarray(sk), pts, None, None)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        if ca:
            print(
                f"msm cost_analysis: flops={ca.get('flops', 0):.3e} "
                f"bytes={ca.get('bytes accessed', 0):.3e}",
                flush=True,
            )
    except Exception as e:  # cost_analysis is best-effort across jax versions
        print(f"cost_analysis unavailable: {e}", flush=True)

    out = {
        "rows": [
            {"kernel": r[0], "montmuls": r[1], "ms": round(r[2], 2),
             "M_montmul_per_s": round(r[3], 1), "note": r[4]}
            for r in ROWS
        ],
        "ceiling_16limb_M_per_s": round(ceil16 / 1e6, 1),
        "ceiling_24limb_M_per_s": round(ceil24 / 1e6, 1),
    }
    path = pathlib.Path(__file__).parent.parent / "ROOFLINE.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
