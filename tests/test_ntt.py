"""Differential tests: JAX RS codec vs the pure-Python golden model."""

import numpy as np
import pytest

from ligero_prover_tpu.field import bn254 as F
from ligero_prover_tpu.field import golden
from ligero_prover_tpu.field.limbs import ints_to_limbs, limbs_to_ints
from ligero_prover_tpu.ops.ntt import RSCodec, ntt_forward, ntt_inverse

K, N = 64, 256


@pytest.fixture(scope="module")
def codec():
    return RSCodec(K, N)


def _rows_to_limbs(rows):
    out = np.zeros((len(rows), len(rows[0]), 8), np.uint32)
    for i, r in enumerate(rows):
        ints_to_limbs(r, out[i])
    return out


def _limbs_to_rows(arr):
    return [limbs_to_ints(np.asarray(a)) for a in arr]


def test_ntt_roundtrip_vs_golden(codec, rng):
    w_k, _, _ = F.generate_omegas(K, N)
    rows = [[rng.randrange(F.MODULUS) for _ in range(K)] for _ in range(3)]
    x = _rows_to_limbs(rows)
    fwd = _limbs_to_rows(ntt_forward(x, codec.dom_k))
    for r, g in zip(fwd, rows):
        assert r == golden.ntt(g, w_k)
    inv = _limbs_to_rows(ntt_inverse(x, codec.dom_k))
    for r, g in zip(inv, rows):
        assert r == golden.intt(g, w_k)


def test_encode_vs_golden(codec, rng):
    w_k, w_2k, w_n = F.generate_omegas(K, N)
    rows = [[rng.randrange(F.MODULUS) for _ in range(K)] for _ in range(2)]
    got = _limbs_to_rows(codec.encode(_rows_to_limbs(rows)))
    for r, g in zip(got, rows):
        assert r == golden.encode(g, K, N, w_k, w_n)

    masks = [[rng.randrange(F.MODULUS) for _ in range(2 * K)]
             for _ in range(2)]
    got2 = _limbs_to_rows(codec.encode_2k(_rows_to_limbs(masks)))
    for r, g in zip(got2, masks):
        assert r == golden.encode_2k(g, K, N, w_2k, w_n)


def test_decode_vs_golden(codec, rng):
    w_k, _, w_n = F.generate_omegas(K, N)
    rows = [[rng.randrange(F.MODULUS) for _ in range(K)] for _ in range(2)]
    cws = [golden.encode(g, K, N, w_k, w_n) for g in rows]
    got = _limbs_to_rows(codec.decode(_rows_to_limbs(cws)))
    for d, g, row in zip(got, cws, rows):
        expect = golden.decode(g, K, N, w_k, w_n)
        assert d == expect
        # first k slots recover the row; tail coefficients are zero
        assert d[:K] == row
        assert all(v == 0 for v in d[K:])
