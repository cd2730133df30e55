"""Batched NTT / Reed-Solomon codec over BN254-Fr in JAX.

TPU-first divergence from the reference: the reference encodes one row per
GPU dispatch chain (``engine.cpp:755-771``); here rows are batched as a
(B, N, 8) tensor and every butterfly stage is one fused vector op over the
whole batch.  Twiddles are precomputed per stage in Montgomery form
(w * 2^256 mod p) exactly like ``ntt_radix2.hpp:87-104``, so butterflies do
one mont_mul and values stay in the plain domain; outputs are canonical in
[0, p).

All precomputed tables are *runtime arguments* to the jitted functions, not
closure constants: embedding megabytes of twiddles as HLO literals bloats
every executable and defeats the persistent compilation cache.

Mathematical contract (validated against ``field.golden``):
  forward_N: X[j] = sum_i x[i] w_N^(i*j);  inverse_N = 1/N sum w^(-i*j)
  encode    = NTT_n(zero_extend(iNTT_k(row)))
  encode_2k = NTT_n(zero_extend(iNTT_2k(mask_row)))
  decode    = NTT_k(fold_k(iNTT_n(codeword))), coefficients [k, n) passed
              through for the degree check (``kernels.wgsl.in:104-116``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..field import bn254 as F
from ..field.limbs import int_to_limbs, ints_to_limbs
from . import fieldops as fo

NLIMB = 8


def _bitrev(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    out = np.arange(n)
    rev = np.zeros(n, np.int64)
    for _ in range(bits):
        rev = (rev << 1) | (out & 1)
        out >>= 1
    return rev


def build_domain_tables(n: int, w: int):
    """Butterfly tables for one domain: a dict pytree of jnp arrays.

    Stage s (1-based): length = 2^s, butterflies at k = g*length + j,
    a-index k, b-index k+half, twiddle w^(j * n / length) in Montgomery
    form.  Tables are stacked over stages so the stage loop is one
    fori_loop body.
    """
    assert pow(w, n, F.MODULUS) == 1 and pow(w, n // 2, F.MODULUS) != 1
    log2n = n.bit_length() - 1
    half_n = n // 2
    w_inv = pow(w, F.MODULUS - 2, F.MODULUS)
    n_inv = pow(n, F.MODULUS - 2, F.MODULUS)

    def build(root):
        idx_a = np.empty((log2n, half_n), np.int32)
        idx_b = np.empty((log2n, half_n), np.int32)
        inv_perm = np.empty((log2n, n), np.int32)
        tws = np.empty((log2n, half_n, NLIMB), np.uint32)
        for s in range(1, log2n + 1):
            length = 1 << s
            half = length >> 1
            wl = pow(root, n // length, F.MODULUS)
            tw_pows = [1] * half
            for j in range(1, half):
                tw_pows[j] = tw_pows[j - 1] * wl % F.MODULUS
            tw_limbs = ints_to_limbs([t * F.R % F.MODULUS for t in tw_pows])
            m = 0
            for g in range(n // length):
                for j in range(half):
                    k = g * length + j
                    idx_a[s - 1, m] = k
                    idx_b[s - 1, m] = k + half
                    inv_perm[s - 1, k] = m
                    inv_perm[s - 1, k + half] = half_n + m
                    tws[s - 1, m] = tw_limbs[j]
                    m += 1
        return (jnp.asarray(idx_a), jnp.asarray(idx_b),
                jnp.asarray(inv_perm), jnp.asarray(tws))

    return {
        "rev": jnp.asarray(_bitrev(n)),
        "fwd": build(w),
        "inv": build(w_inv),
        "n_inv_mont": jnp.asarray(int_to_limbs(n_inv * F.R % F.MODULUS)),
    }


def _butterflies(x, stage_tables, rev):
    """Bit-reverse then log2(N) DIT stages of a' = a + w*b, b' = a - w*b."""
    idx_a, idx_b, inv_perm, tws = stage_tables
    log2n = idx_a.shape[0]
    x = jnp.take(x, rev, axis=1)

    def stage(s, x):
        a = jnp.take(x, idx_a[s], axis=1)
        b = jnp.take(x, idx_b[s], axis=1)
        wb = fo.mont_mul(b, tws[s][None, :, :])
        out = jnp.concatenate([fo.addmod(a, wb), fo.submod(a, wb)], axis=1)
        return jnp.take(out, inv_perm[s], axis=1)

    return jax.lax.fori_loop(0, log2n, stage, x)


def ntt_forward(x, dom):
    """(B, N, 8) -> (B, N, 8), natural order."""
    return _butterflies(x, dom["fwd"], dom["rev"])


def ntt_inverse(x, dom):
    y = _butterflies(x, dom["inv"], dom["rev"])
    return fo.mont_mul(y, dom["n_inv_mont"][None, None, :])


# ---- codec functions (tables as arguments; jit at call sites) -----------

def encode_rows(rows, dom_msg, dom_n, n: int):
    """(B, w, 8) message-domain rows -> (B, n, 8) codewords."""
    b_, w = rows.shape[0], rows.shape[1]
    coeffs = ntt_inverse(rows, dom_msg)
    padded = jnp.concatenate(
        [coeffs, jnp.zeros((b_, n - w, NLIMB), jnp.uint32)], axis=1)
    return ntt_forward(padded, dom_n)


def decode_rows(codewords, dom_k, dom_n, k: int):
    """(B, n, 8) -> (B, n, 8): [0,k) k-domain evaluations, [k,n) raw
    coefficients (degree check)."""
    coeffs = ntt_inverse(codewords, dom_n)
    folded = fo.addmod(coeffs[:, :k], coeffs[:, k:2 * k])
    evals = ntt_forward(folded, dom_k)
    return jnp.concatenate([evals, coeffs[:, k:]], axis=1)


class RSCodec:
    """Encode/decode between k-rows (or 2k mask rows) and n-codewords."""

    def __init__(self, k: int, n: int):
        assert n == 4 * k
        w_k, w_2k, w_n = F.generate_omegas(k, n)
        self.k, self.n = k, n
        self.dom_k = build_domain_tables(k, w_k)
        self.dom_2k = build_domain_tables(2 * k, w_2k)
        self.dom_n = build_domain_tables(n, w_n)
        self._encode = jax.jit(encode_rows, static_argnums=(3,))
        self._decode = jax.jit(decode_rows, static_argnums=(3,))

    def encode(self, rows):
        return self._encode(rows, self.dom_k, self.dom_n, self.n)

    def encode_2k(self, rows):
        return self._encode(rows, self.dom_2k, self.dom_n, self.n)

    def decode(self, codewords):
        return self._decode(codewords, self.dom_k, self.dom_n, self.k)
