"""TPU executor: batched, jitted stage pipelines.

The reference round-trips one row per GPU dispatch chain
(``nonbatch_context.hpp:445-451``).  On TPU that would be dispatch-latency
bound, so the executor queues rows on the host and flushes them through one
jitted call per batch:

* ``commit_step``    — encode B rows + ordered SHA-256 column absorption
                       (stage 1 / the verifier's 192-column variant).
* ``check_step``     — encode B rows + B randomness rows, accumulate the
                       code / linear / quadratic test codewords (stage 2).
* ``open_step``      — encode B rows and gather the 192 sampled columns
                       (stage 3).
* ``verify_step``    — absorb sampled columns, encode+sample randomness
                       rows, replay all checks on 192-wide buffers.

Batching is semantics-preserving: SHA absorbs stay ordered inside the
batch, and the test accumulators are sums in the field, so zero-padded
batch tails contribute exactly zero (padding rows, randomness, and scalars
are all zero).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..field import bn254 as F
from ..field.limbs import ints_to_limbs
from ..ops import sha256 as jsha
from ..ops import fieldops as fo
from ..ops.ntt import RSCodec

NLIMB = 8


def _absorb_stream(state, pending, has_pending, rows, valid_count):
    """Absorb `valid_count` elements of `rows` (B, C, 8) in order into the
    per-column SHA states, honoring a carried unpaired element."""
    bsz = rows.shape[0]
    stream = jnp.concatenate([pending[None], rows], axis=0)  # (B+1, C, 8)
    hp = has_pending.astype(jnp.int32)
    start = 1 - hp
    total = valid_count + hp
    pairs = total // 2

    def body(i, st):
        e0 = jax.lax.dynamic_index_in_dim(stream, start + 2 * i, 0,
                                          keepdims=False)
        e1 = jax.lax.dynamic_index_in_dim(stream, start + 2 * i + 1, 0,
                                          keepdims=False)
        blk = jnp.concatenate([e0.T, e1.T], axis=0)  # (16, C)
        new = jsha.transform(st, blk)
        return jnp.where(i < pairs, new, st)

    state = jax.lax.fori_loop(0, (bsz + 1) // 2, body, state)
    idx = jnp.clip(start + 2 * pairs, 0, bsz)
    new_pending = jax.lax.dynamic_index_in_dim(stream, idx, 0, keepdims=False)
    return state, new_pending, (total % 2) == 1


def _masked_sum(acc, terms):
    """acc (n, 8) += field-sum over axis 0 of terms (B, n, 8)."""
    def body(i, a):
        return fo.addmod(a, terms[i])
    return jax.lax.fori_loop(0, terms.shape[0], body, acc)


class TpuExecutor:
    """Owns the RS codec, jitted pipelines, and sample-index tables."""

    def __init__(self, k: int, n: int, batch_rows: int = 16):
        self.k, self.n = k, n
        self.codec = RSCodec(k, n)
        self.batch_rows = batch_rows
        self._jit_cache = {}

    # ---- generic helpers -------------------------------------------------

    def rows_to_limbs(self, rows: list[list[int]], width: int) -> np.ndarray:
        out = np.zeros((len(rows), width, NLIMB), np.uint32)
        for i, r in enumerate(rows):
            ints_to_limbs(r, out[i])
        return out

    def _jit(self, key, fn):
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    # ---- stage 1: commit -------------------------------------------------

    def commit_step(self, sha, rows, valid_count, *, width_2k=False):
        """rows: (B, k, 8) [or (B, 2k, 8) for masks]; sha = (state, pending,
        has_pending).  Returns the updated sha triple."""
        enc = self.codec.encode_2k if width_2k else self.codec.encode

        def fn(state, pending, has_pending, rows, valid_count):
            cws = enc(rows)
            return _absorb_stream(state, pending, has_pending, cws,
                                  valid_count)

        f = self._jit(("commit", width_2k, rows.shape), fn)
        state, pending, has_pending = sha
        return f(state, pending, has_pending, jnp.asarray(rows),
                 jnp.asarray(valid_count, jnp.int32))

    # ---- stage 2: checks -------------------------------------------------

    def check_step(self, accs, rows, rands, code_rs, tri_idx, tri_r):
        """accs = (code, linear, quad) each (n, 8).

        rows/rands: (B, k, 8); code_rs: (B, 8) per-row code-test scalars
        (zero for padding); tri_idx: (T, 3) int32 local indices of
        quadratic triples (a, b, c); tri_r: (T, 8) quadratic scalars.
        """
        def fn(code, linear, quad, rows, rands, code_rs, tri_idx, tri_r):
            e = self.codec.encode(rows)      # (B, n, 8)
            r = self.codec.encode(rands)
            code = _masked_sum(code, fo.mulmod(e, code_rs[:, None, :]))
            linear = _masked_sum(linear, fo.mulmod(e, r))
            ex = jnp.take(e, tri_idx[:, 0], axis=0)
            ey = jnp.take(e, tri_idx[:, 1], axis=0)
            ez = jnp.take(e, tri_idx[:, 2], axis=0)
            t = fo.submod(fo.mulmod(ex, ey), ez)
            quad = _masked_sum(quad, fo.mulmod(t, tri_r[:, None, :]))
            return code, linear, quad

        f = self._jit(("check", rows.shape, tri_idx.shape), fn)
        return f(*accs, jnp.asarray(rows), jnp.asarray(rands),
                 jnp.asarray(code_rs), jnp.asarray(tri_idx),
                 jnp.asarray(tri_r))

    def mask_step(self, accs, code_row, linear_row, quad_row):
        """Add the three encoded ZK masks into the accumulators
        (``nonbatch_context.hpp:732-754``)."""
        def fn(code, linear, quad, cr, lr, qr):
            code = fo.addmod(code, self.codec.encode(cr[None])[0])
            linear = fo.addmod(linear, self.codec.encode_2k(lr[None])[0])
            quad = fo.addmod(quad, self.codec.encode_2k(qr[None])[0])
            return code, linear, quad

        f = self._jit(("mask",), fn)
        return f(*accs, jnp.asarray(code_row), jnp.asarray(linear_row),
                 jnp.asarray(quad_row))

    # ---- stage 3: openings ----------------------------------------------

    def open_step(self, rows, sample_idx, *, width_2k=False):
        """Encode rows and gather sampled columns -> (B, S, 8)."""
        enc = self.codec.encode_2k if width_2k else self.codec.encode

        def fn(rows, idx):
            cws = enc(rows)
            return jnp.take(cws, idx, axis=1)

        f = self._jit(("open", width_2k, rows.shape), fn)
        return f(jnp.asarray(rows), jnp.asarray(sample_idx, jnp.int32))

    # ---- verifier --------------------------------------------------------

    def verify_step(self, sha, accs, samples, rands, code_rs, tri_idx, tri_r,
                    sample_idx, valid_count):
        """samples: (B, S, 8) opened columns (zero-padded tail); rands:
        (B, k, 8) randomness rows; the rest as in check_step.  Absorbs the
        opened columns in order and replays checks on S-wide buffers."""
        def fn(state, pending, has_pending, code, linear, quad,
               samples, rands, code_rs, tri_idx, tri_r, idx, valid_count):
            state, pending, has_pending = _absorb_stream(
                state, pending, has_pending, samples, valid_count)
            r_full = self.codec.encode(rands)
            r = jnp.take(r_full, idx, axis=1)           # (B, S, 8)
            code = _masked_sum(code, fo.mulmod(samples, code_rs[:, None, :]))
            linear = _masked_sum(linear, fo.mulmod(samples, r))
            sx = jnp.take(samples, tri_idx[:, 0], axis=0)
            sy = jnp.take(samples, tri_idx[:, 1], axis=0)
            sz = jnp.take(samples, tri_idx[:, 2], axis=0)
            t = fo.submod(fo.mulmod(sx, sy), sz)
            quad = _masked_sum(quad, fo.mulmod(t, tri_r[:, None, :]))
            return state, pending, has_pending, code, linear, quad

        f = self._jit(("verify", samples.shape, tri_idx.shape), fn)
        state, pending, has_pending = sha
        out = f(state, pending, has_pending, *accs, jnp.asarray(samples),
                jnp.asarray(rands), jnp.asarray(code_rs),
                jnp.asarray(tri_idx), jnp.asarray(tri_r),
                jnp.asarray(sample_idx, jnp.int32),
                jnp.asarray(valid_count, jnp.int32))
        return (out[0], out[1], out[2]), (out[3], out[4], out[5])

    def verify_mask_step(self, sha, accs, mask_samples):
        """Masks on the verifier side: absorb the 3 opened mask columns and
        AddAssign them into the accumulators."""
        def fn(state, pending, has_pending, code, linear, quad, ms):
            state, pending, has_pending = _absorb_stream(
                state, pending, has_pending, ms,
                jnp.asarray(3, jnp.int32))
            code = fo.addmod(code, ms[0])
            linear = fo.addmod(linear, ms[1])
            quad = fo.addmod(quad, ms[2])
            return state, pending, has_pending, code, linear, quad

        f = self._jit(("verify_mask",), fn)
        state, pending, has_pending = sha
        out = f(state, pending, has_pending, *accs, jnp.asarray(mask_samples))
        return (out[0], out[1], out[2]), (out[3], out[4], out[5])

    # ---- decode ----------------------------------------------------------

    def decode(self, codeword):
        """(n, 8) -> (n, 8) decoded (see RSCodec.decode)."""
        return self.codec.decode(jnp.asarray(codeword)[None])[0]

    def sha_init(self, num_cols: int):
        return (jsha.initial_state(num_cols),
                jnp.zeros((num_cols, NLIMB), jnp.uint32),
                jnp.asarray(False))

    def sha_finalize(self, sha, rows_absorbed: int):
        state, pending, has_pending = sha
        return jsha.finalize(state, pending, has_pending,
                             jnp.asarray(rows_absorbed, jnp.int32))
