"""Generate tests/vectors/ark_interop.json — arkworks-convention fixtures.

Live arkworks-generated artifacts are not producible in this environment
(no Rust toolchain, no network egress), so these fixtures are computed by an
INDEPENDENT pure-int reimplementation of the published arkworks conventions,
written here from the spec — deliberately sharing no code with
`openzl_tpu.utils.codec` / `openzl_tpu.ops.ntt` so the test is a genuine
two-implementation cross-check:

  * ark-ff Fr configs      — GENERATOR / TWO_ADICITY / TWO_ADIC_ROOT_OF_UNITY
    (arkworks curves bn254/bls12_381 `fr.rs` config constants; the root is
    defined as g^((r-1)/2^s) mod r)
  * ark-poly Radix2EvaluationDomain — fft evaluations, here via the naive
    O(n^2) DFT evals[i] = sum_j coeffs[j] * w^(i*j)
  * ark-serialize SW point compression — little-endian x with flags in the
    top bits of the FINAL byte: infinity = 1<<6, largest-y = 1<<7; Fq2
    ordered (c0, c1) with flags on c1's final byte; "largest" compares c1
    then c0 (reference plugins/arkworks/src/serialize.rs:21-141 wraps this)

This module intentionally imports NOTHING from openzl_tpu.
"""

import json
import pathlib

# -- published field/curve constants (arkworks curve configs) ---------------
BN254_FR = 0x30644E72E131A029B85045B68181585D2833E84879B9709143E1F593F0000001
BN254_FQ = 0x30644E72E131A029B85045B68181585D97816A916871CA8D3C208C16D87CFD47
BLS_FR = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
BLS_FQ = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB

FR_CONFIG = {
    "bn254_fr": {"modulus": BN254_FR, "generator": 5},
    "bls12_381_fr": {"modulus": BLS_FR, "generator": 7},
}

G1_GENS = {
    "bn254_g1": (BN254_FQ, 1, 2),
    "bls12_381_g1": (
        BLS_FQ,
        0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB,
        0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1,
    ),
}

BLS_G2_GEN = (
    (
        0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8,
        0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E,
    ),
    (
        0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801,
        0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE,
    ),
)


def n_bytes(modulus: int) -> int:
    """ark-serialize field size: 64-bit limb granularity."""
    return -(-modulus.bit_length() // 64) * 8


def fe_bytes(modulus: int, x: int) -> bytes:
    return x.to_bytes(n_bytes(modulus), "little")


INFINITY = 1 << 6
LARGEST_Y = 1 << 7


def g1_compressed(modulus: int, pt) -> bytes:
    if pt is None:
        raw = bytearray(fe_bytes(modulus, 0))
        raw[-1] |= INFINITY
        return bytes(raw)
    x, y = pt
    raw = bytearray(fe_bytes(modulus, x))
    if y > (modulus - 1) // 2:
        raw[-1] |= LARGEST_Y
    return bytes(raw)


def g1_uncompressed(modulus: int, pt) -> bytes:
    if pt is None:
        raw = bytearray(fe_bytes(modulus, 0) * 2)
        raw[-1] |= INFINITY
        return bytes(raw)
    x, y = pt
    return fe_bytes(modulus, x) + fe_bytes(modulus, y)


def fq2_largest(modulus: int, c) -> bool:
    c0, c1 = c
    half = (modulus - 1) // 2
    if c1 != 0:
        return c1 > half
    return c0 > half


def g2_compressed(modulus: int, pt) -> bytes:
    if pt is None:
        raw = bytearray(fe_bytes(modulus, 0) * 2)
        raw[-1] |= INFINITY
        return bytes(raw)
    (x0, x1), y = pt
    raw = bytearray(fe_bytes(modulus, x0) + fe_bytes(modulus, x1))
    if fq2_largest(modulus, y):
        raw[-1] |= LARGEST_Y
    return bytes(raw)


def naive_dft(modulus: int, root: int, coeffs):
    n = len(coeffs)
    return [
        sum(c * pow(root, i * j, modulus) for j, c in enumerate(coeffs))
        % modulus
        for i in range(n)
    ]


def main():
    out = {}

    # 1. Fr domain config: generator, two-adicity, two-adic root of unity
    fr = {}
    for name, cfg in FR_CONFIG.items():
        r, g = cfg["modulus"], cfg["generator"]
        s, m = 0, r - 1
        while m % 2 == 0:
            m //= 2
            s += 1
        root = pow(g, (r - 1) >> s, r)
        fr[name] = {
            "generator": g,
            "two_adicity": s,
            "two_adic_root_of_unity": str(root),
        }
    out["fr_configs"] = fr

    # 2. ark-poly Radix2 domain evaluations (size 8 and 16, BLS12-381 Fr)
    ntt = {}
    for log_n in (3, 4):
        n = 1 << log_n
        r = BLS_FR
        cfg = fr["bls12_381_fr"]
        w = pow(
            int(cfg["two_adic_root_of_unity"]),
            1 << (cfg["two_adicity"] - log_n),
            r,
        )
        coeffs = [(1234567 + 89 * j * j * j) % r for j in range(n)]
        ntt[f"bls12_381_fr_2^{log_n}"] = {
            "root_of_unity": str(w),
            "coeffs": [str(c) for c in coeffs],
            "evals": [str(e) for e in naive_dft(r, w, coeffs)],
        }
    out["ntt"] = ntt

    # 3. ark-serialize point encodings (generators + identity)
    pts = {}
    for name, (q, gx, gy) in G1_GENS.items():
        pts[name] = {
            "generator_compressed": g1_compressed(q, (gx, gy)).hex(),
            "generator_uncompressed": g1_uncompressed(q, (gx, gy)).hex(),
            "identity_compressed": g1_compressed(q, None).hex(),
            "neg_generator_compressed": g1_compressed(
                q, (gx, q - gy)
            ).hex(),
        }
    x2, y2 = BLS_G2_GEN
    pts["bls12_381_g2"] = {
        "generator_compressed": g2_compressed(BLS_FQ, (x2, y2)).hex(),
        "identity_compressed": g2_compressed(BLS_FQ, None).hex(),
        "neg_generator_compressed": g2_compressed(
            BLS_FQ, (x2, (BLS_FQ - y2[0], BLS_FQ - y2[1]))
        ).hex(),
    }
    out["points"] = pts

    # 4. ark Vec<Fr> layout: u64 LE length prefix then elements
    vals = [3, 1, 4, 1, 5]
    blob = len(vals).to_bytes(8, "little") + b"".join(
        fe_bytes(BN254_FR, v) for v in vals
    )
    out["vec_fr_bn254"] = {"values": [str(v) for v in vals], "bytes": blob.hex()}

    path = pathlib.Path(__file__).parent.parent / "tests/vectors/ark_interop.json"
    path.write_text(json.dumps(out, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
