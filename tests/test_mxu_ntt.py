"""Differential tests for the MXU (int8-matmul) NTT encode path.

The MXU path must agree bit-for-bit with the constant-geometry VPU path
(``ops/ntt.py``) and the golden model: proofs are byte-compared against
fixtures, so any disagreement is a protocol break.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ligero_prover_tpu.field import bn254 as F
from ligero_prover_tpu.field import golden
from ligero_prover_tpu.field.limbs import limbs_to_ints, ints_to_limbs
from ligero_prover_tpu.ops import ntt as jntt
from ligero_prover_tpu.ops import mxu_ntt

K, N = 256, 1024


@pytest.fixture(scope="module")
def tables():
    w_k, w_2k, w_n = F.generate_omegas(K, N)
    return {
        "k": mxu_ntt.build_codec_tables(K, N, w_k, w_n),
        "2k": mxu_ntt.build_codec_tables(2 * K, N, w_2k, w_n),
        "w": (w_k, w_2k, w_n),
    }


def _rand_rows(b, width, seed=0):
    rng = np.random.default_rng(seed)
    vals = [[int.from_bytes(rng.bytes(32), "little") % F.MODULUS
             for _ in range(width)] for _ in range(b)]
    rows = np.zeros((b, width, 8), np.uint32)
    for i, r in enumerate(vals):
        ints_to_limbs(r, rows[i])
    return rows, vals


def test_encode_matches_golden(tables):
    w_k, _, w_n = tables["w"]
    rows, vals = _rand_rows(3, K)
    out = np.asarray(mxu_ntt.encode_rows_mxu(
        jnp.asarray(rows), tables["k"], N, use_pallas=False))
    for i, v in enumerate(vals):
        expect = golden.encode(v, K, N, w_k, w_n)
        got = limbs_to_ints(out[i])
        assert got == expect


def test_encode_matches_vpu_path(tables):
    rows, _ = _rand_rows(4, K, seed=1)
    codec = jntt.RSCodec(K, N)
    ref = np.asarray(jntt.encode_rows_cg(jnp.asarray(rows), codec.dom_k,
                                         codec.dom_n, N))
    got = np.asarray(mxu_ntt.encode_rows_mxu(
        jnp.asarray(rows), tables["k"], N, use_pallas=False))
    np.testing.assert_array_equal(got, ref)


def test_encode_2k_matches_vpu_path(tables):
    rows, _ = _rand_rows(2, 2 * K, seed=2)
    codec = jntt.RSCodec(K, N)
    ref = np.asarray(jntt.encode_rows_cg(jnp.asarray(rows), codec.dom_2k,
                                         codec.dom_n, N))
    got = np.asarray(mxu_ntt.encode_rows_mxu(
        jnp.asarray(rows), tables["2k"], N, use_pallas=False))
    np.testing.assert_array_equal(got, ref)


def test_edge_values(tables):
    """All-zero, all-(p-1), and single-element rows."""
    rows = np.zeros((3, K, 8), np.uint32)
    ints_to_limbs([F.MODULUS - 1] * K, rows[1])
    ints_to_limbs([0] * (K - 1) + [12345], rows[2])
    codec = jntt.RSCodec(K, N)
    ref = np.asarray(jntt.encode_rows_cg(jnp.asarray(rows), codec.dom_k,
                                         codec.dom_n, N))
    got = np.asarray(mxu_ntt.encode_rows_mxu(
        jnp.asarray(rows), tables["k"], N, use_pallas=False))
    np.testing.assert_array_equal(got, ref)


def test_executor_steps_match_vpu_path(tables):
    """commit/check/open stage bodies must be bit-identical with the MXU
    engine on and off: proofs are byte-compared against fixtures, so the
    two NTT engines must be interchangeable mid-protocol.  (Eager calls:
    jitting these 10k-eqn graphs takes minutes on XLA:CPU.)"""
    from ligero_prover_tpu.zkp import executor as ex

    codec = jntt.RSCodec(K, N)
    rows = jnp.asarray(_rand_rows(4, K, seed=3)[0])
    rands = jnp.asarray(_rand_rows(4, K, seed=4)[0])
    code_rs = jnp.asarray(_rand_rows(4, 1, seed=5)[0][:, 0, :])
    tri_idx = jnp.array([[0, 1, 2], [1, 2, 3], [0, 0, 0], [0, 0, 0]],
                        jnp.int32)
    tri_r = np.asarray(_rand_rows(4, 1, seed=6)[0])[:, 0, :]
    tri_r[2:] = 0
    pair_idx = jnp.array([[0, 1], [0, 0], [0, 0], [0, 0]], jnp.int32)
    pair_r = np.asarray(_rand_rows(4, 1, seed=7)[0])[:, 0, :]
    pair_r[1:] = 0
    idx = jnp.asarray(np.sort(np.random.default_rng(8)
                              .choice(N, 12, replace=False)).astype(np.int32))
    z = jnp.zeros((N, 8), jnp.uint32)
    vc = jnp.asarray(4, jnp.int32)

    results = {}
    for flag in (False, True):
        tabs = tables["k"] if flag else None
        state, pending, hp = (ex.jsha.initial_state(N),
                              jnp.zeros((N, 8), jnp.uint32),
                              jnp.asarray(False))
        st = ex._commit_body(state, pending, hp, rows, vc, codec.dom_k,
                             codec.dom_n, N, False, tabs, flag)
        accs = ex._check_body(z, z, z, rows, rands, code_rs, tri_idx,
                              jnp.asarray(tri_r), pair_idx,
                              jnp.asarray(pair_r), codec.dom_k,
                              codec.dom_n, N, False, tabs, flag)
        opened = ex._open_body(rows, idx, codec.dom_k, codec.dom_n, N,
                               False, tabs, flag)
        results[flag] = (np.asarray(st[0]), np.asarray(st[1]),
                         [np.asarray(a) for a in accs], np.asarray(opened))

    a, b = results[False], results[True]
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    for x, y in zip(a[2], b[2]):
        np.testing.assert_array_equal(x, y)
    np.testing.assert_array_equal(a[3], b[3])
