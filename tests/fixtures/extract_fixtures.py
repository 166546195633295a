"""Extract the reference's embedded golden test vectors into .npy fixtures.

decryption_test.cu carries a serialized ciphertext (`c_host`, 24576 u64 =
2 * r * n with n=4096, r=3) and NTT-domain secret key (`sk_host`, 8192 u64 =
(r-1) * n) as source literals (decryption_test.cu:348,355), produced by a
prior keygen+encrypt run of the reference itself.  These are *data*, the
reference's only cross-run reproducibility anchor, and our primary
bit-exactness target (BASELINE.json).

Run from the repo root:  python tests/fixtures/extract_fixtures.py
"""

import re
import sys
from pathlib import Path

import numpy as np

REF = Path("/root/reference/BFV_Scheme/decryption_test.cu")
OUT = Path(__file__).parent


def extract_array(src: str, name: str) -> np.ndarray:
    m = re.search(rf"unsigned long long {name}\[\] = \{{([^}}]*)\}};", src)
    if not m:
        sys.exit(f"array {name} not found")
    vals = [int(v) for v in m.group(1).split(",")]
    return np.array(vals, dtype=np.uint64)


def main() -> None:
    src = REF.read_text()
    c = extract_array(src, "c_host")
    sk = extract_array(src, "sk_host")
    n, r = 4096, 3
    assert c.shape == (2 * r * n,), c.shape
    assert sk.shape == ((r - 1) * n,), sk.shape
    # Layout (bfv_decryption.cuh:61-75): c0 residues 0..r-2, padding,
    # c1 residues 0..r-2, padding.
    c0 = c[: (r - 1) * n].reshape(r - 1, n)
    c1 = c[r * n : r * n + (r - 1) * n].reshape(r - 1, n)
    sk2 = sk.reshape(r - 1, n)
    np.save(OUT / "dec4k_c0.npy", c0)
    np.save(OUT / "dec4k_c1.npy", c1)
    np.save(OUT / "dec4k_sk_ntt.npy", sk2)
    print("saved:", c0.shape, c1.shape, sk2.shape)


if __name__ == "__main__":
    main()
