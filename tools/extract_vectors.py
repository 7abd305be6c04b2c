"""Extract golden-vector *data* from the reference repo into JSON fixtures.

Run once (requires /root/reference mounted). The extracted artifacts are pure
conformance data (decimal field-element strings produced originally by sage
scripts), stored under tests/vectors/.

Sources (reference file provenance recorded in each JSON):
  - plugins/arkworks/src/poseidon/parameters_hardcoded_test/lfsr_values
  - plugins/arkworks/src/poseidon/mds_hardcoded_tests/width{2..12}
  - plugins/arkworks/src/poseidon/permutation_hardcoded_test/width3
"""

import json
import re
import os

REF = "/root/reference/plugins/arkworks/src/poseidon"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "vectors")

NUM = re.compile(r'"(\d+)"')


def extract(path):
    with open(path) as f:
        return NUM.findall(f.read())


def main():
    os.makedirs(OUT, exist_ok=True)

    lfsr = extract(f"{REF}/parameters_hardcoded_test/lfsr_values")
    with open(f"{OUT}/poseidon_lfsr_bls381.json", "w") as f:
        json.dump(
            {
                "description": "Grain LFSR sampled field elements, modulus_bits=255 "
                "width=3 R_F=8 R_P=55, BLS12-381 Fr (sage golden)",
                "source": "plugins/arkworks/src/poseidon/parameters_hardcoded_test/lfsr_values",
                "values": lfsr,
            },
            f,
            indent=1,
        )

    mds = {}
    for w in range(2, 13):
        vals = extract(f"{REF}/mds_hardcoded_tests/width{w}")
        assert len(vals) == w * w, (w, len(vals))
        mds[str(w)] = vals
    with open(f"{OUT}/poseidon_mds_bls381.json", "w") as f:
        json.dump(
            {
                "description": "Cauchy MDS matrices (row major) widths 2-12 over "
                "BLS12-381 Fr (sage golden)",
                "source": "plugins/arkworks/src/poseidon/mds_hardcoded_tests/width{2..12}",
                "matrices": mds,
            },
            f,
            indent=1,
        )

    perm = extract(f"{REF}/permutation_hardcoded_test/width3")
    assert len(perm) == 3
    with open(f"{OUT}/poseidon_perm_width3_bls381.json", "w") as f:
        json.dump(
            {
                "description": "Poseidon width-3 permutation of state [3,1,2] over "
                "BLS12-381 Fr (sage golden)",
                "source": "plugins/arkworks/src/poseidon/permutation_hardcoded_test/width3",
                "input": ["3", "1", "2"],
                "output": perm,
            },
            f,
            indent=1,
        )
    print("lfsr:", len(lfsr), "mds widths:", list(mds), "perm:", len(perm))


if __name__ == "__main__":
    main()
