"""Differential tests for the Pallas performance core.

Every kernel in ``ops/pallas/fieldmul.py`` is run in interpret mode on CPU
(``FORCE_INTERPRET=True``) against the ``field.bn254`` Python-int golden
model — the same discipline as the reference's CPU golden NTT
(``include/ntt/ntt_radix2.hpp``) vs its WGSL shaders
(``tests/webgpu/test_powmod.cpp:21-80``).  The planar encode pipeline is
additionally checked end-to-end against the AoS XLA pipeline with
``USE_PLANAR`` forced on.
"""

import random

import numpy as np
import pytest

# Interpret-mode Pallas on CPU is ~10 min for this module alone; the same
# math is covered fast by the golden-model tests (test_field/test_ntt/
# test_mxu_ntt), so the differential layer runs in the nightly tier.
pytestmark = pytest.mark.slow

from ligero_prover_tpu.field import bn254 as F
from ligero_prover_tpu.field.limbs import ints_to_limbs, limbs_to_ints
from ligero_prover_tpu.ops import ntt
from ligero_prover_tpu.ops.pallas import fieldmul as fm

N_ELEMS = 1024  # exactly one (8, 8, 128) kernel tile


@pytest.fixture(autouse=True)
def _interpret_mode():
    fm.FORCE_INTERPRET = True
    yield
    fm.FORCE_INTERPRET = None


def _rand_elems(rng, n):
    return [rng.randrange(F.MODULUS) for _ in range(n)]


def _planar(xs):
    return np.ascontiguousarray(ints_to_limbs(xs).T)  # (8, N)


def _ints(planar):
    return limbs_to_ints(np.asarray(planar).T)


def test_mont_mul_planar(rng):
    xs = _rand_elems(rng, N_ELEMS)
    ys = _rand_elems(rng, N_ELEMS)
    out = _ints(fm.mont_mul_planar(_planar(xs), _planar(ys)))
    for o, x, y in zip(out, xs, ys):
        assert o == F.mont_mul(x, y)


def test_mont_mul_planar_edge_cases(rng):
    edge = [0, 1, F.MODULUS - 1, F.R % F.MODULUS, (F.R - 1) % F.MODULUS,
            F.MODULUS // 2, (1 << 255) % F.MODULUS, (1 << 128) - 1]
    xs = (edge * ((N_ELEMS // len(edge)) + 1))[:N_ELEMS]
    ys = list(reversed(xs))
    out = _ints(fm.mont_mul_planar(_planar(xs), _planar(ys)))
    for o, x, y in zip(out, xs, ys):
        assert o == F.mont_mul(x, y)


def test_mulmod_planar(rng):
    xs = _rand_elems(rng, N_ELEMS)
    ys = _rand_elems(rng, N_ELEMS)
    out = _ints(fm.mulmod_planar(_planar(xs), _planar(ys)))
    for o, x, y in zip(out, xs, ys):
        assert o == F.mulmod(x, y)


def test_mont_mul_scalar_planar(rng):
    xs = _rand_elems(rng, N_ELEMS)
    s = rng.randrange(F.MODULUS)
    out = _ints(fm.mont_mul_scalar_planar(_planar(xs), ints_to_limbs([s])[0]))
    for o, x in zip(out, xs):
        assert o == F.mont_mul(x, s)


def test_mulmod_fma_planar(rng):
    accs = _rand_elems(rng, N_ELEMS)
    xs = _rand_elems(rng, N_ELEMS)
    ys = _rand_elems(rng, N_ELEMS)
    out = _ints(fm.mulmod_fma_planar(_planar(accs), _planar(xs), _planar(ys)))
    for o, a, x, y in zip(out, accs, xs, ys):
        assert o == F.addmod(a, F.mulmod(x, y))


def test_butterfly_dit(rng):
    a = _rand_elems(rng, N_ELEMS)
    b = _rand_elems(rng, N_ELEMS)
    w = _rand_elems(rng, N_ELEMS)  # Montgomery-form twiddles
    s, d = fm.butterfly_dit(_planar(a), _planar(b), _planar(w))
    s, d = _ints(s), _ints(d)
    for i in range(N_ELEMS):
        wb = F.mont_mul(b[i], w[i])
        assert s[i] == F.addmod(a[i], wb)
        assert d[i] == F.submod(a[i], wb)


def test_butterfly_dif(rng):
    a = _rand_elems(rng, N_ELEMS)
    b = _rand_elems(rng, N_ELEMS)
    w = _rand_elems(rng, N_ELEMS)
    s, d = fm.butterfly_dif(_planar(a), _planar(b), _planar(w))
    s, d = _ints(s), _ints(d)
    for i in range(N_ELEMS):
        assert s[i] == F.addmod(a[i], b[i])
        assert d[i] == F.mont_mul(F.submod(a[i], b[i]), w[i])


def test_kernel_padding_partial_tile(rng):
    """Sub-tile inputs are zero-padded and sliced back correctly."""
    n = 37
    xs = _rand_elems(rng, n)
    ys = _rand_elems(rng, n)
    out = _ints(fm.mulmod_planar(_planar(xs), _planar(ys)))
    assert len(out) == n
    for o, x, y in zip(out, xs, ys):
        assert o == F.mulmod(x, y)


def test_encode_rows_planar_matches_aos(rng):
    """End-to-end planar encode pipeline == AoS XLA pipeline (USE_PLANAR
    forced on, Pallas in interpret mode)."""
    import jax.numpy as jnp

    k, n, batch = 64, 256, 2
    w_k, _, w_n = F.generate_omegas(k, n)
    dom_k = ntt.build_domain_tables(k, w_k)
    dom_n = ntt.build_domain_tables(n, w_n)

    rows = np.stack([ints_to_limbs(_rand_elems(rng, k)) for _ in range(batch)])
    aos = np.asarray(ntt._encode_rows_aos(jnp.asarray(rows), dom_k, dom_n, n))
    planar = np.asarray(ntt.encode_rows_planar(
        jnp.asarray(rows), dom_k, dom_n, n))
    assert (aos == planar).all()


def test_commit_body_planar_matches_aos(rng):
    """Full planar stage-1 commit pipeline (planar encode + planar SHA
    absorb) produces the identical sha state/pending as the AoS path."""
    import jax.numpy as jnp
    from ligero_prover_tpu.zkp import executor as ex
    from ligero_prover_tpu.ops import sha256 as jsha

    k, n, batch = 64, 256, 5   # odd valid_count exercises pending carry
    w_k, _, w_n = F.generate_omegas(k, n)
    dom_k = ntt.build_domain_tables(k, w_k)
    dom_n = ntt.build_domain_tables(n, w_n)

    rows = np.stack([ints_to_limbs(_rand_elems(rng, k))
                     for _ in range(batch)])
    state = jnp.broadcast_to(jnp.asarray(jsha.INIT_STATE)[:, None], (8, n))
    pending = jnp.zeros((n, 8), jnp.uint32)
    hp = jnp.asarray(False)
    vc = jnp.asarray(batch, jnp.int32)

    a = ex._commit_body(state, pending, hp, jnp.asarray(rows), vc,
                        dom_k, dom_n, n, use_planar=False)
    b = ex._commit_body(state, pending, hp, jnp.asarray(rows), vc,
                        dom_k, dom_n, n, use_planar=True)
    for x, y in zip(a, b):
        assert (np.asarray(x) == np.asarray(y)).all()


def test_check_body_planar_matches_aos(rng):
    """Planar stage-2 pipeline (FMA-kernel accumulators) == AoS path."""
    import jax.numpy as jnp
    from ligero_prover_tpu.zkp import executor as ex

    k, n, batch = 64, 256, 4
    w_k, _, w_n = F.generate_omegas(k, n)
    dom_k = ntt.build_domain_tables(k, w_k)
    dom_n = ntt.build_domain_tables(n, w_n)

    rows = np.stack([ints_to_limbs(_rand_elems(rng, k))
                     for _ in range(batch)])
    rands = np.stack([ints_to_limbs(_rand_elems(rng, k))
                      for _ in range(batch)])
    code_rs = ints_to_limbs(_rand_elems(rng, batch))
    tri_idx = np.array([[0, 1, 2], [1, 2, 3]], np.int32)
    tri_r = ints_to_limbs(_rand_elems(rng, 2))
    pair_idx = np.array([[0, 3]], np.int32)
    pair_r = ints_to_limbs(_rand_elems(rng, 1))
    z = jnp.asarray(np.stack([ints_to_limbs(_rand_elems(rng, n))
                              for _ in range(3)]))

    args = (z[0], z[1], z[2], jnp.asarray(rows), jnp.asarray(rands),
            jnp.asarray(code_rs), jnp.asarray(tri_idx), jnp.asarray(tri_r),
            jnp.asarray(pair_idx), jnp.asarray(pair_r), dom_k, dom_n, n)
    a = ex._check_body(*args, use_planar=False)
    b = ex._check_body(*args, use_planar=True)
    for x, y in zip(a, b):
        assert (np.asarray(x) == np.asarray(y)).all()


def test_decode_rows_planar_matches_aos(rng):
    import jax.numpy as jnp

    k, n, batch = 64, 256, 2
    w_k, _, w_n = F.generate_omegas(k, n)
    dom_k = ntt.build_domain_tables(k, w_k)
    dom_n = ntt.build_domain_tables(n, w_n)
    rows = np.stack([ints_to_limbs(_rand_elems(rng, k))
                     for _ in range(batch)])
    cws = ntt.encode_rows_cg(jnp.asarray(rows), dom_k, dom_n, n)
    a = np.asarray(ntt.decode_rows_cg(cws, dom_k, dom_n, k))
    b = np.asarray(ntt.decode_rows_cg_planar(cws, dom_k, dom_n, k))
    assert (a == b).all()


def test_encode_rows_planar_matches_golden(rng):
    """Planar encode == golden-model polynomial evaluation over the
    codeword domain (``field.golden`` contract)."""
    import jax.numpy as jnp
    from ligero_prover_tpu.field import golden

    k, n = 64, 256
    w_k, _, w_n = F.generate_omegas(k, n)
    dom_k = ntt.build_domain_tables(k, w_k)
    dom_n = ntt.build_domain_tables(n, w_n)

    row = _rand_elems(rng, k)
    out = np.asarray(ntt.encode_rows_planar(
        jnp.asarray(ints_to_limbs(row)[None]), dom_k, dom_n, n))[0]
    expect = golden.encode(row, k, n, w_k, w_n)
    assert limbs_to_ints(out) == expect
