"""CLI driver + serialization tests (the reference's per-driver binaries,
SURVEY.md §4, as subcommands)."""

import numpy as np
import pytest

from ntt_cuda_tpu import cli, get_bfv_params
from ntt_cuda_tpu.utils import serialize


def test_ntt_test_driver(capsys):
    assert cli.main(["ntt-test", "--n", "2048"]) == 0
    assert "PASS" in capsys.readouterr().out


def test_decryption_test_driver(capsys):
    assert cli.main(["decryption-test"]) == 0
    assert "PASS" in capsys.readouterr().out


def test_keygen_test_driver(capsys):
    assert cli.main(["keygen-test", "--samples", str(1 << 18)]) == 0
    assert "PASS" in capsys.readouterr().out


def test_demo_driver(capsys):
    assert cli.main(["demo"]) == 0
    assert "PASS" in capsys.readouterr().out


def test_keys_encrypt_decrypt_flow(tmp_path, capsys):
    keys = str(tmp_path / "keys.npz")
    ct = str(tmp_path / "ct.npz")
    assert cli.main(["keys", "--out", keys]) == 0
    assert cli.main(["encrypt", "--keys", keys, "--out", ct]) == 0
    assert cli.main(["decrypt", "--keys", keys, "--ct", ct]) == 0
    out = capsys.readouterr().out
    # ramp message: plaintext head is 0..15
    assert "[decrypt] plaintext head: " + str(list(range(16))) in out


def test_serialize_rejects_mismatched_params(tmp_path):
    p3 = get_bfv_params("4k_3q")
    p4 = get_bfv_params("8k_4q")
    path = tmp_path / "keys.npz"
    sk = np.zeros((p3.r, p3.n), dtype=np.uint64)
    pk = np.zeros((2, p3.r, p3.n), dtype=np.uint64)
    serialize.save_keypair(path, p3, sk, pk)
    with pytest.raises(ValueError, match="parameter mismatch"):
        serialize.load_keypair(path, p4)
    with pytest.raises(ValueError, match="not a ciphertext"):
        serialize.load_ciphertext(path, p3)


def test_ntt_test_30bit_family():
    from ntt_cuda_tpu import cli
    assert cli.main(["ntt-test", "--n", "2048", "--family", "30bit"]) == 0


@pytest.mark.slow
def test_padded_ciphertext_serialization(tmp_path, rng):
    """SPMD padded (2, r, n) ciphertexts round-trip through .npz and
    convert between layouts; a zero-padded slot decrypts identically
    (the dropped-modulus slot is never consumed)."""
    import jax
    import jax.numpy as jnp
    from ntt_cuda_tpu.models import bfv
    from ntt_cuda_tpu.parallel import spmd
    from ntt_cuda_tpu.params import get_bfv_params
    from ntt_cuda_tpu.utils import serialize

    p = get_bfv_params("4k_3q")
    sctx = spmd.SpmdBFVContext.build(p, devices=jax.devices()[:1])
    sk, pk = sctx.keygen()
    m = np.arange(p.n, dtype=np.uint64) % p.t
    ct = np.asarray(sctx.encrypt(pk, jnp.asarray(m)))   # (2, r, n) padded

    f = tmp_path / "ct_padded.npz"
    serialize.save_ciphertext(f, p, ct)
    back = serialize.load_ciphertext(f, p)
    np.testing.assert_array_equal(back, ct)
    dropped = serialize.load_ciphertext(f, p, layout="dropped")
    assert dropped.shape == (2, p.r - 1, p.n)
    # dropped layout decrypts on the single-chip context
    ctx = bfv.BFVContext.build(p, backend="xla")
    out = np.asarray(ctx.decrypt(sk, jnp.asarray(dropped)))
    np.testing.assert_array_equal(out, m)
    # zero-padded layout decrypts on the SPMD context
    repad = serialize.load_ciphertext(f, p, layout="padded")
    out2 = np.asarray(sctx.decrypt(sk, jnp.asarray(repad)))
    np.testing.assert_array_equal(out2, m)
    # re-saving the dropped form and padding it back also decrypts
    f2 = tmp_path / "ct_dropped.npz"
    serialize.save_ciphertext(f2, p, dropped)
    repad2 = serialize.load_ciphertext(f2, p, layout="padded")
    out3 = np.asarray(sctx.decrypt(sk, jnp.asarray(repad2)))
    np.testing.assert_array_equal(out3, m)


def test_serialize_eval_keys_roundtrip(tmp_path):
    p = get_bfv_params("4k_3q")
    want = (2, p.r - 1, p.r, p.n)
    rng = np.random.default_rng(1)
    rlk = rng.integers(0, 1 << 40, want, dtype=np.uint64)
    path = tmp_path / "rlk.npz"
    serialize.save_relin_keys(path, p, rlk)
    np.testing.assert_array_equal(serialize.load_relin_keys(path, p), rlk)

    gks = {3: rng.integers(0, 1 << 40, want, dtype=np.uint64),
           2 * p.n - 1: rng.integers(0, 1 << 40, want, dtype=np.uint64)}
    gpath = tmp_path / "gks.npz"
    serialize.save_galois_keys(gpath, p, gks)
    got = serialize.load_galois_keys(gpath, p)
    assert sorted(got) == sorted(gks)
    for g in gks:
        np.testing.assert_array_equal(got[g], gks[g])
    with pytest.raises(ValueError, match="not a relin-keys"):
        serialize.load_relin_keys(gpath, p)
    with pytest.raises(ValueError, match="parameter mismatch"):
        serialize.load_galois_keys(gpath, get_bfv_params("8k_4q"))
