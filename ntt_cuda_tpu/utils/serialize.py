"""Key / ciphertext serialization (.npz).

The reference's only persistence mechanism is ciphertext + secret key
embedded as C source literals (decryption_test.cu:348,355) — its
"checkpoint" for cross-run reproducibility.  This module is the proper
equivalent: keys and ciphertexts round-trip through .npz archives carrying
enough parameter identity (n, t, moduli) to reject mismatched loads.
"""

from __future__ import annotations

import numpy as np

FORMAT_VERSION = 1


def _params_meta(params) -> dict:
    return {
        "format_version": np.int64(FORMAT_VERSION),
        "n": np.int64(params.n),
        "t": np.int64(params.t),
        "q": np.asarray(params.q, dtype=np.uint64),
    }


def _check_meta(data, params, path) -> None:
    if int(data["format_version"]) != FORMAT_VERSION:
        raise ValueError(f"{path}: unsupported format version "
                         f"{int(data['format_version'])}")
    if int(data["n"]) != params.n or int(data["t"]) != params.t or \
            not np.array_equal(data["q"], np.asarray(params.q, np.uint64)):
        raise ValueError(f"{path}: parameter mismatch (file has n={int(data['n'])}, "
                         f"t={int(data['t'])}, r={data['q'].size}; expected "
                         f"n={params.n}, t={params.t}, r={params.r})")


def save_keypair(path, params, sk, pk) -> None:
    """sk (r, n) and pk (2, r, n), both NTT-domain (the reference keeps keys
    in the NTT domain forever — bfv_keygen.cuh:129,145)."""
    np.savez(path, kind="keypair", sk=np.asarray(sk, np.uint64),
             pk=np.asarray(pk, np.uint64), **_params_meta(params))


def load_keypair(path, params):
    with np.load(path, allow_pickle=False) as data:
        if str(data["kind"]) != "keypair":
            raise ValueError(f"{path}: not a keypair file")
        _check_meta(data, params, path)
        return data["sk"], data["pk"]


def save_ciphertext(path, params, ct) -> None:
    """ct (2, r-1, n), coefficient domain, last modulus dropped."""
    np.savez(path, kind="ciphertext", ct=np.asarray(ct, np.uint64),
             **_params_meta(params))


def load_ciphertext(path, params):
    with np.load(path, allow_pickle=False) as data:
        if str(data["kind"]) != "ciphertext":
            raise ValueError(f"{path}: not a ciphertext file")
        _check_meta(data, params, path)
        return data["ct"]
