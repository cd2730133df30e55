"""Field layer: golden scalar ops, limb packing, JAX limb kernels."""

import numpy as np
import jax
import jax.numpy as jnp

from ligero_prover_tpu.field import bn254 as F
from ligero_prover_tpu.field import golden
from ligero_prover_tpu.field.limbs import (
    int_to_limbs, limbs_to_int, ints_to_limbs, limbs_to_ints)
from ligero_prover_tpu.ops import fieldops as fo


def rand_elems(rng, n):
    return [rng.randrange(F.MODULUS) for _ in range(n)]


def test_constants():
    assert F.MODULUS % 2 == 1
    assert pow(7, (F.MODULUS - 1) // 2, F.MODULUS) != 1  # 7 is a generator
    # ROOT1/ROOT2 generate the order-2^28 subgroup
    assert pow(F.ROOT1, 1 << 28, F.MODULUS) == 1
    assert pow(F.ROOT1, 1 << 27, F.MODULUS) != 1
    assert pow(F.ROOT2, 1 << 28, F.MODULUS) == 1
    assert pow(F.ROOT2, 1 << 27, F.MODULUS) != 1
    # primitive 2^28 subgroup membership via generate_omegas
    w_k, w_2k, w_n = F.generate_omegas(8192, 32768)
    assert pow(w_k, 8192, F.MODULUS) == 1
    assert pow(w_k, 4096, F.MODULUS) != 1
    assert pow(w_2k, 16384, F.MODULUS) == 1
    assert pow(w_n, 32768, F.MODULUS) == 1
    assert pow(w_n, 16384, F.MODULUS) != 1
    assert w_2k * w_2k % F.MODULUS == pow(w_k, 1, F.MODULUS)


def test_scalar_ops(rng):
    for _ in range(50):
        x, y = rng.randrange(F.MODULUS), rng.randrange(F.MODULUS)
        assert F.addmod(x, y) == (x + y) % F.MODULUS
        assert F.submod(x, y) == (x - y) % F.MODULUS
        assert F.mulmod(x, y) == x * y % F.MODULUS
        assert F.barrett_mul(x, y) == x * y % F.MODULUS
        assert F.mont_mul(F.to_mont(x), y) == x * y % F.MODULUS
        if y:
            assert F.divmod_(x, y) * y % F.MODULUS == x


def test_limb_roundtrip(rng):
    xs = rand_elems(rng, 17)
    arr = ints_to_limbs(xs)
    assert limbs_to_ints(arr) == xs
    assert limbs_to_int(int_to_limbs(xs[0])) == xs[0]


def test_jax_addsub(rng):
    xs, ys = rand_elems(rng, 64), rand_elems(rng, 64)
    X, Y = jnp.asarray(ints_to_limbs(xs)), jnp.asarray(ints_to_limbs(ys))
    assert limbs_to_ints(jax.jit(fo.addmod)(X, Y)) == [F.addmod(a, b) for a, b in zip(xs, ys)]
    assert limbs_to_ints(jax.jit(fo.submod)(X, Y)) == [F.submod(a, b) for a, b in zip(xs, ys)]
    assert limbs_to_ints(jax.jit(fo.negmod)(X)) == [F.negate(a) for a in xs]


def test_jax_mont_mul(rng):
    xs, ys = rand_elems(rng, 64), rand_elems(rng, 64)
    X, Y = jnp.asarray(ints_to_limbs(xs)), jnp.asarray(ints_to_limbs(ys))
    got = limbs_to_ints(jax.jit(fo.mont_mul)(X, Y))
    want = [F.mont_mul(a, b) for a, b in zip(xs, ys)]
    assert got == want
    # edge cases: 0, 1, p-1
    es = [0, 1, F.MODULUS - 1, F.MODULUS - 2, (1 << 254) % F.MODULUS]
    E = jnp.asarray(ints_to_limbs(es))
    got = limbs_to_ints(jax.jit(fo.mont_mul)(E, E))
    assert got == [F.mont_mul(a, a) for a in es]


def test_jax_mulmod(rng):
    xs, ys = rand_elems(rng, 32), rand_elems(rng, 32)
    X, Y = jnp.asarray(ints_to_limbs(xs)), jnp.asarray(ints_to_limbs(ys))
    assert limbs_to_ints(jax.jit(fo.mulmod)(X, Y)) == [a * b % F.MODULUS for a, b in zip(xs, ys)]


def test_golden_ntt_roundtrip(rng):
    k, n = 16, 64
    w_k, w_2k, w_n = F.generate_omegas(k, n)
    row = rand_elems(rng, k)
    assert golden.intt(golden.ntt(row, w_k), w_k) == row
    # matches the O(N^2) definition
    small = rand_elems(rng, 8)
    w8 = pow(w_k, k // 8, F.MODULUS)
    direct = [sum(small[i] * pow(w8, i * j, F.MODULUS) for i in range(8)) % F.MODULUS
              for j in range(8)]
    assert golden.ntt(small, w8) == direct


def test_golden_codec(rng):
    k, n = 16, 64
    w_k, w_2k, w_n = F.generate_omegas(k, n)
    row = rand_elems(rng, k)
    cw = golden.encode(row, k, n, w_k, w_n)
    dec = golden.decode(cw, k, n, w_k, w_n)
    assert dec[:k] == row
    assert all(v == 0 for v in dec[k:])
    # 2k mask: decodes to evaluations at even positions of the 2k domain
    mask = rand_elems(rng, 2 * k)
    cw2 = golden.encode_2k(mask, k, n, w_2k, w_n)
    dec2 = golden.decode(cw2, k, n, w_k, w_n)
    assert dec2[:k] == mask[::2]  # k-domain points are the even 2k points
    assert all(v == 0 for v in dec2[2 * k:])  # degree < 2k


def test_jax_codec_matches_golden(rng):
    from ligero_prover_tpu.ops.ntt import RSCodec
    k, n = 16, 64
    w_k, w_2k, w_n = F.generate_omegas(k, n)
    codec = RSCodec(k, n)
    rows = [rand_elems(rng, k) for _ in range(3)]
    cw = codec.encode(jnp.asarray(np.stack([ints_to_limbs(r) for r in rows])))
    for i, r in enumerate(rows):
        assert limbs_to_ints(cw[i]) == golden.encode(r, k, n, w_k, w_n)
    dec = codec.decode(cw)
    for i, r in enumerate(rows):
        got = limbs_to_ints(dec[i])
        assert got[:k] == r
        assert all(v == 0 for v in got[k:])
    masks = [rand_elems(rng, 2 * k) for _ in range(2)]
    cw2 = codec.encode_2k(jnp.asarray(np.stack([ints_to_limbs(m) for m in masks])))
    for i, m in enumerate(masks):
        assert limbs_to_ints(cw2[i]) == golden.encode_2k(m, k, n, w_2k, w_n)


def test_mul_wide_conv_matches_matmul(rng):
    """The TPU convolution form of the wide multiply must agree with the
    CPU matmul form (the composite mont_mul conv pipeline is exercised on
    real TPU by bench.py; compiling it on CPU-LLVM is prohibitively slow)."""
    import jax
    import numpy as np
    from ligero_prover_tpu.ops import fieldops as fo
    from ligero_prover_tpu.field.limbs import ints_to_limbs

    xs = [rng.randrange(1 << 256) for _ in range(64)]
    ys = [rng.randrange(1 << 256) for _ in range(64)]
    X, Y = ints_to_limbs(xs), ints_to_limbs(ys)
    for out_limbs in (8, 16):
        a = np.asarray(jax.jit(fo.mul_wide_conv,
                               static_argnums=2)(X, Y, out_limbs))
        b = np.asarray(jax.jit(fo.mul_wide_matmul,
                               static_argnums=2)(X, Y, out_limbs))
        assert (a == b).all()
        # golden check on the full product (16 limbs = one 512-bit int each)
        if out_limbs == 16:
            got = [int.from_bytes(row.astype("<u4").tobytes(), "little")
                   for row in a]
            assert got == [(x * y) % (1 << 512) for x, y in zip(xs, ys)]
