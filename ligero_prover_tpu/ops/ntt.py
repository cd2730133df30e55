"""Batched NTT / Reed-Solomon codec over BN254-Fr in JAX.

TPU-first divergence from the reference: the reference encodes one row per
GPU dispatch chain (``engine.cpp:755-771``); here rows are batched as a
(B, N, 8) tensor and every butterfly stage is one fused vector op over the
whole batch, which is how the VPU wants the work.  Twiddles are precomputed
per stage in Montgomery form (w * 2^256 mod p) exactly like
``ntt_radix2.hpp:87-104``, so butterflies do one mont_mul and values stay in
the plain domain; outputs are canonical in [0, p).

Mathematical contract (validated against ``field.golden``):
  forward_N: X[j] = sum_i x[i] w_N^(i*j);  inverse_N = 1/N sum w^(-i*j)
  encode    = NTT_n(zero_extend(iNTT_k(row)))
  encode_2k = NTT_n(zero_extend(iNTT_2k(mask_row)))
  decode    = NTT_k(fold_k(iNTT_n(codeword))), coefficients [k, n) passed
              through for the degree check (``kernels.wgsl.in:104-116``).
"""

from __future__ import annotations

from functools import partial

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


class NTTPlan:
    """Precomputed tables for one domain size N and root w."""

    def __init__(self, n: int, w: int):
        assert pow(w, n, F.MODULUS) == 1 and pow(w, n // 2, F.MODULUS) != 1
        self.n = n
        self.w = w
        self.log2n = n.bit_length() - 1
        self.rev = jnp.asarray(_bitrev(n))
        w_inv = pow(w, F.MODULUS - 2, F.MODULUS)
        n_inv = pow(n, F.MODULUS - 2, F.MODULUS)

        # Per-stage butterfly tables, stacked so the stage loop can be a
        # single lax.fori_loop body (compile once, not once per stage).
        # Stage s (1-based): length = 2^s, butterflies at k = g*length + j,
        # a-index k, b-index k+half, twiddle w^(j * n / length).
        half_n = n // 2

        def build(root):
            idx_a = np.empty((self.log2n, half_n), np.int32)
            idx_b = np.empty((self.log2n, half_n), np.int32)
            inv_perm = np.empty((self.log2n, n), np.int32)
            tws = np.empty((self.log2n, half_n, NLIMB), np.uint32)
            for s in range(1, self.log2n + 1):
                length = 1 << s
                half = length >> 1
                wl = pow(root, n // length, F.MODULUS)
                tw_pows = [1] * half
                for j in range(1, half):
                    tw_pows[j] = tw_pows[j - 1] * wl % F.MODULUS
                m = 0
                for g in range(n // length):
                    for j in range(half):
                        k = g * length + j
                        idx_a[s - 1, m] = k
                        idx_b[s - 1, m] = k + half
                        # output gather: concat([a_out, b_out]) -> natural pos
                        inv_perm[s - 1, k] = m
                        inv_perm[s - 1, k + half] = half_n + m
                        tws[s - 1, m] = int_to_limbs(
                            tw_pows[j] * F.R % F.MODULUS)
                        m += 1
            return (jnp.asarray(idx_a), jnp.asarray(idx_b),
                    jnp.asarray(inv_perm), jnp.asarray(tws))

        self.fwd_tables = build(w)
        self.inv_tables = build(w_inv)
        self.n_inv_mont = jnp.asarray(int_to_limbs(n_inv * F.R % F.MODULUS))


def _butterflies(x, tables, rev, log2n):
    """Shared DIT core: bit-reverse then log2(N) stages of a' = a + w*b,
    b' = a - w*b.  One fori_loop body over stacked per-stage tables keeps
    compile time O(1) in log N."""
    idx_a, idx_b, inv_perm, tws = tables
    x = jnp.take(x, rev, axis=1)

    def stage(s, x):
        a = jnp.take(x, idx_a[s], axis=1)
        b = jnp.take(x, idx_b[s], axis=1)
        wb = fo.mont_mul(b, tws[s][None, :, :])
        out = jnp.concatenate([fo.addmod(a, wb), fo.submod(a, wb)], axis=1)
        return jnp.take(out, inv_perm[s], axis=1)

    return jax.lax.fori_loop(0, log2n, stage, x)


def ntt_forward(x, plan: NTTPlan):
    """(B, N, 8) -> (B, N, 8), natural order."""
    return _butterflies(x, plan.fwd_tables, plan.rev, plan.log2n)


def ntt_inverse(x, plan: NTTPlan):
    y = _butterflies(x, plan.inv_tables, plan.rev, plan.log2n)
    return fo.mont_mul(y, plan.n_inv_mont[None, None, :])


class RSCodec:
    """Encode/decode between k-rows (or 2k mask rows) and n-codewords."""

    def __init__(self, k: int, n: int):
        assert n == 4 * k
        w_k, w_2k, w_n = F.generate_omegas(k, n)
        self.k, self.n = k, n
        self.plan_k = NTTPlan(k, w_k)
        self.plan_2k = NTTPlan(2 * k, w_2k)
        self.plan_n = NTTPlan(n, w_n)
        # jit entry points (cached per batch shape)
        self.encode = jax.jit(self._encode)
        self.encode_2k = jax.jit(self._encode_2k)
        self.decode = jax.jit(self._decode)

    def _encode(self, rows):
        """(B, k, 8) -> (B, n, 8)."""
        b_ = rows.shape[0]
        coeffs = ntt_inverse(rows, self.plan_k)
        padded = jnp.concatenate(
            [coeffs, jnp.zeros((b_, self.n - self.k, NLIMB), jnp.uint32)], axis=1)
        return ntt_forward(padded, self.plan_n)

    def _encode_2k(self, rows):
        """(B, 2k, 8) -> (B, n, 8) for degree-<2k mask rows."""
        b_ = rows.shape[0]
        coeffs = ntt_inverse(rows, self.plan_2k)
        padded = jnp.concatenate(
            [coeffs, jnp.zeros((b_, self.n - 2 * self.k, NLIMB), jnp.uint32)],
            axis=1)
        return ntt_forward(padded, self.plan_n)

    def _decode(self, codewords):
        """(B, n, 8) -> (B, n, 8): [0,k) k-domain evaluations, [k,n) raw
        coefficients (degree check)."""
        coeffs = ntt_inverse(codewords, self.plan_n)
        folded = fo.addmod(coeffs[:, :self.k], coeffs[:, self.k:2 * self.k])
        evals = ntt_forward(folded, self.plan_k)
        return jnp.concatenate([evals, coeffs[:, self.k:]], axis=1)
