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

NTT tables are threaded through every jit as runtime arguments (see
``ops/ntt.py``) so executables stay small and cacheable.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..field import bn254 as F
from ..field.limbs import ints_to_limbs, int_to_limbs
from ..ops import sha256 as jsha
from ..ops import fieldops as fo
from ..ops.ntt import RSCodec, encode_rows, decode_rows, _planar_use, \
    _mxu_use

NLIMB = 8
F_R2 = F.R * F.R % F.MODULUS


def _absorb_stream(state, pending, has_pending, rows, valid_count):
    """Absorb `valid_count` elements of `rows` (B, C, 8) in order into the
    per-column SHA states, honoring a carried unpaired element."""
    bsz = rows.shape[0]
    stream = jnp.concatenate([pending[None], rows], axis=0)  # (B+1, C, 8)
    hp = has_pending.astype(jnp.int32)
    start = 1 - hp
    total = valid_count + hp
    pairs = total // 2
    nblocks = (bsz + 1) // 2
    i0 = start + 2 * jnp.arange(nblocks)
    e0 = jnp.take(stream, jnp.clip(i0, 0, bsz), axis=0)       # (P, C, 8)
    e1 = jnp.take(stream, jnp.clip(i0 + 1, 0, bsz), axis=0)
    blocks = jnp.concatenate(
        [e0.transpose(0, 2, 1), e1.transpose(0, 2, 1)], axis=1)  # (P, 16, C)
    valid = jnp.arange(nblocks) < pairs
    # Python-unrolled block loop: see ops/sha256.transform for why this
    # must not be a lax.scan.
    for i in range(nblocks):
        state = jnp.where(valid[i], jsha.transform(state, blocks[i]), state)
    idx = jnp.clip(start + 2 * pairs, 0, bsz)
    new_pending = jax.lax.dynamic_index_in_dim(stream, idx, 0, keepdims=False)
    return state, new_pending, (total % 2) == 1


def _absorb_stream_planar(state, pending, has_pending, cws, valid_count):
    """Planar twin of :func:`_absorb_stream`: cws is (8, B, C) limb-major.

    A SHA block's 16 message words are the 8 limbs of two consecutive
    elements, which in planar layout are two (8, C) slices — stacking them
    is free, so the absorb needs NO minor-axis transposes (the AoS path's
    (P, C, 8) -> (P, 16, C) relayouts were ~80% of commit_step wall time
    on TPU).  `pending` stays (C, 8) at the interface for compatibility."""
    bsz = cws.shape[1]
    stream = jnp.concatenate([pending.T[:, None, :], cws], axis=1)
    hp = has_pending.astype(jnp.int32)
    start = 1 - hp
    total = valid_count + hp
    pairs = total // 2
    nblocks = (bsz + 1) // 2

    # lax.scan over blocks (NOT a Python loop): unrolling 16 SHA
    # transforms inline produced ~25-50 MB serialized executables whose
    # per-process load took ~60 s through the axon tunnel; the scanned
    # body serializes once.  (TPU-only path — on XLA:CPU a scanned
    # transform hits the scan-of-fori slow-compile regime, so the AoS
    # CPU path keeps its unrolled block loop.)
    def body(st, i):
        pair = jax.lax.dynamic_slice_in_dim(stream, start + 2 * i, 2,
                                            axis=1)
        block = jnp.concatenate([pair[:, 0], pair[:, 1]], axis=0)  # (16, C)
        return jnp.where(i < pairs, jsha.transform(st, block), st), None

    # unroll=8: the per-step launch overhead dominated the scanned absorb
    # (measured 3.15 -> 1.65 ms/batch at B=32, n=32768); 8 keeps the
    # serialized executable at ~half the size of the full unroll that
    # previously choked the tunnel's executable load.
    state, _ = jax.lax.scan(body, state, jnp.arange(nblocks),
                            unroll=min(8, nblocks))
    idx = jnp.clip(start + 2 * pairs, 0, bsz)
    new_pending = jax.lax.dynamic_slice_in_dim(
        stream, idx, 1, axis=1)[:, 0].T
    return state, new_pending, (total % 2) == 1


def _masked_sum(acc, terms):
    """acc (n, 8) += field-sum over axis 0 of terms (B, n, 8)."""
    def body(i, a):
        return fo.addmod(a, terms[i])
    return jax.lax.fori_loop(0, terms.shape[0], body, acc)


# ---- jitted pipeline bodies (module-level; tables passed in) -------------

def _commit_body(state, pending, has_pending, rows, valid_count,
                 dom_msg, dom_n, n, use_planar=False, mxu_tabs=None,
                 use_mxu=False):
    if use_mxu:
        from ..ops.mxu_ntt import encode_rows_mxu_core
        cws_p = encode_rows_mxu_core(rows, mxu_tabs, n, use_planar)
        if use_planar:
            return _absorb_stream_planar(state, pending, has_pending,
                                         cws_p, valid_count)
        return _absorb_stream(state, pending, has_pending,
                              jnp.moveaxis(cws_p, 0, -1), valid_count)
    if use_planar:
        from ..ops.ntt import encode_rows_cg_planar_core
        cws = encode_rows_cg_planar_core(rows, dom_msg, dom_n, n)
        return _absorb_stream_planar(state, pending, has_pending, cws,
                                     valid_count)
    cws = encode_rows(rows, dom_msg, dom_n, n, use_planar)
    return _absorb_stream(state, pending, has_pending, cws, valid_count)


def _quad_contrib(quad, e, tri_idx, tri_r, pair_idx, pair_r):
    """Accumulate quadratic-test terms: r*(x∘y - z) for each (x,y,z) triple
    and r*(x - y) for each batch-equality pair (``nonbatch_context.hpp:771,
    811-825``).  Padded entries carry zero scalars and contribute nothing."""
    ex = jnp.take(e, tri_idx[:, 0], axis=0)
    ey = jnp.take(e, tri_idx[:, 1], axis=0)
    ez = jnp.take(e, tri_idx[:, 2], axis=0)
    t = fo.submod(fo.mulmod(ex, ey), ez)
    quad = _masked_sum(quad, fo.mulmod(t, tri_r[:, None, :]))
    px = jnp.take(e, pair_idx[:, 0], axis=0)
    py = jnp.take(e, pair_idx[:, 1], axis=0)
    d = fo.submod(px, py)
    return _masked_sum(quad, fo.mulmod(d, pair_r[:, None, :]))


def _tree_sum_mod_planar(x):
    """(B, 8, n) -> (8, n) field sum over the row axis by pairwise folds:
    log2(B) addmod kernel calls on halved operands (total work ~= B*n
    elements) instead of B sequential accumulator launches."""
    from ..ops.pallas import fieldmul as fm

    def fold(lo, hi):
        h = lo.shape[0]
        s = fm.addmod_planar(jnp.moveaxis(lo, 1, 0).reshape(8, -1),
                             jnp.moveaxis(hi, 1, 0).reshape(8, -1))
        return jnp.moveaxis(s.reshape(8, h, -1), 1, 0)

    while x.shape[0] > 1:
        b = x.shape[0]
        head = x[:1] if b % 2 else None
        body = x[1:] if b % 2 else x
        h = body.shape[0] // 2
        x = fold(body[:h], body[h:])
        if head is not None:
            x = jnp.concatenate([head, x], axis=0)
    return x[0]


def _check_body_planar(code, linear, quad, rows, rands, code_rs, tri_idx,
                       tri_r, pair_idx, pair_r, dom_k, dom_n, n,
                       mxu_tabs=None, use_mxu=False, rands_zero=False):
    """Planar stage-2 pipeline: data stays limb-major end-to-end — no
    AoS<->planar transposes around each field op (VERDICT r3 weak #3).

    `rands_zero` (static): the flush carries only batch rows, which have
    no linear-test randomness rows (`context.py Stage2._flush`); the
    whole second encode and the linear accumulation are identities on
    zeros, so this variant compiles them away (~40% of the pipeline)."""
    from ..ops.ntt import encode_rows_cg_planar_core
    from ..ops.pallas import fieldmul as fm
    if use_mxu:
        from ..ops.mxu_ntt import encode_rows_mxu_core
        e = encode_rows_mxu_core(rows, mxu_tabs, n, True)    # (8, B, n)
        r = None if rands_zero else \
            encode_rows_mxu_core(rands, mxu_tabs, n, True)
    else:
        e = encode_rows_cg_planar_core(rows, dom_k, dom_n, n)
        r = None if rands_zero else \
            encode_rows_cg_planar_core(rands, dom_k, dom_n, n)
    eb = jnp.moveaxis(e, 1, 0)                               # (B, 8, n)
    rb = None if rands_zero else jnp.moveaxis(r, 1, 0)
    code_p = jnp.moveaxis(code, -1, 0)                       # (8, n)
    lin_p = jnp.moveaxis(linear, -1, 0)
    quad_p = jnp.moveaxis(quad, -1, 0)

    def flat(v):
        return jnp.moveaxis(v, 1, 0).reshape(8, -1)

    def unflat(v, t):
        return jnp.moveaxis(v.reshape(8, t, -1), 1, 0)

    # Montgomery-scaling algebra: pre-scale the per-row test scalars by
    # R (s -> s*R via one tiny mont_mul with R^2), so each big product
    # is ONE mont_mul (x * sR * R^-1 = x*s, exact) instead of the
    # two-pass full mulmod; for the linear test (both operands plain)
    # sum first and post-scale the (8, n) sum once by R.
    r2c = jnp.asarray(int_to_limbs(F_R2), jnp.uint32)

    def scale_r(v):
        return fm.mont_mul_planar(v, jnp.broadcast_to(r2c[:, None], v.shape))

    # code test: += sum_b e[b] * code_r[b] (scalar per row)
    cr_r = scale_r(code_rs.T)                               # (8, B) * R
    crb = jnp.broadcast_to(cr_r.T[:, :, None], eb.shape)    # (B, 8, n)
    prods = unflat(fm.mont_mul_planar(flat(eb), flat(crb)), eb.shape[0])
    code_p = fm.addmod_planar(code_p, _tree_sum_mod_planar(prods))

    # linear test: += sum_b e[b] * r[b]  (identity when rands are zero)
    if not rands_zero:
        prods = unflat(fm.mont_mul_planar(flat(eb), flat(rb)), eb.shape[0])
        lin_p = fm.addmod_planar(
            lin_p, scale_r(_tree_sum_mod_planar(prods)))

    # quadratic test: += sum_t tri_r[t]*(e_x*e_y - e_z) + pair terms —
    # batched over triples+pairs (one launch per op on (T*n) operands,
    # one shared tree sum)
    ex = jnp.take(eb, tri_idx[:, 0], axis=0)                 # (T, 8, n)
    ey = jnp.take(eb, tri_idx[:, 1], axis=0)
    ez = jnp.take(eb, tri_idx[:, 2], axis=0)
    px = jnp.take(eb, pair_idx[:, 0], axis=0)
    py = jnp.take(eb, pair_idx[:, 1], axis=0)

    t_ = unflat(fm.submod_planar(fm.mulmod_planar(flat(ex), flat(ey)),
                                 flat(ez)), ex.shape[0])
    d_ = unflat(fm.submod_planar(flat(px), flat(py)), px.shape[0])
    tr_r = scale_r(tri_r.T)                                 # (8, T) * R
    pr_r = scale_r(pair_r.T)
    trb = jnp.broadcast_to(tr_r.T[:, :, None], t_.shape)
    prb = jnp.broadcast_to(pr_r.T[:, :, None], d_.shape)
    terms = jnp.concatenate([t_, d_], axis=0)
    scals = jnp.concatenate([trb, prb], axis=0)
    prods = unflat(fm.mont_mul_planar(flat(terms), flat(scals)),
                   terms.shape[0])
    quad_p = fm.addmod_planar(quad_p, _tree_sum_mod_planar(prods))
    return (jnp.moveaxis(code_p, 0, -1), jnp.moveaxis(lin_p, 0, -1),
            jnp.moveaxis(quad_p, 0, -1))


def _check_body(code, linear, quad, rows, rands, code_rs, tri_idx, tri_r,
                pair_idx, pair_r, dom_k, dom_n, n, use_planar=False,
                mxu_tabs=None, use_mxu=False, rands_zero=False):
    if use_planar:
        return _check_body_planar(code, linear, quad, rows, rands, code_rs,
                                  tri_idx, tri_r, pair_idx, pair_r,
                                  dom_k, dom_n, n, mxu_tabs, use_mxu,
                                  rands_zero)
    if use_mxu:
        from ..ops.mxu_ntt import encode_rows_mxu
        e = encode_rows_mxu(rows, mxu_tabs, n, False)
        r = None if rands_zero else encode_rows_mxu(rands, mxu_tabs, n,
                                                    False)
    else:
        e = encode_rows(rows, dom_k, dom_n, n, use_planar)
        r = None if rands_zero else encode_rows(rands, dom_k, dom_n, n,
                                                use_planar)
    code = _masked_sum(code, fo.mulmod(e, code_rs[:, None, :]))
    if not rands_zero:
        linear = _masked_sum(linear, fo.mulmod(e, r))
    quad = _quad_contrib(quad, e, tri_idx, tri_r, pair_idx, pair_r)
    return code, linear, quad


def _mask_body(code, linear, quad, cr, lr, qr, dom_k, dom_2k, dom_n, n,
               use_planar=False):
    code = fo.addmod(code, encode_rows(cr[None], dom_k, dom_n, n,
                                       use_planar)[0])
    linear = fo.addmod(linear, encode_rows(lr[None], dom_2k, dom_n, n,
                                           use_planar)[0])
    quad = fo.addmod(quad, encode_rows(qr[None], dom_2k, dom_n, n,
                                       use_planar)[0])
    return code, linear, quad


def _open_body(rows, idx, dom_msg, dom_n, n, use_planar=False,
               mxu_tabs=None, use_mxu=False):
    if use_mxu:
        from ..ops.mxu_ntt import encode_rows_mxu
        cws = encode_rows_mxu(rows, mxu_tabs, n, use_planar)
    else:
        cws = encode_rows(rows, dom_msg, dom_n, n, use_planar)
    return jnp.take(cws, idx, axis=1)


def _verify_body(state, pending, has_pending, code, linear, quad,
                 samples, rands, code_rs, tri_idx, tri_r, pair_idx, pair_r,
                 idx, valid_count, dom_k, dom_n, n, use_planar=False):
    state, pending, has_pending = _absorb_stream(
        state, pending, has_pending, samples, valid_count)
    r_full = encode_rows(rands, dom_k, dom_n, n, use_planar)
    r = jnp.take(r_full, idx, axis=1)           # (B, S, 8)
    code = _masked_sum(code, fo.mulmod(samples, code_rs[:, None, :]))
    linear = _masked_sum(linear, fo.mulmod(samples, r))
    quad = _quad_contrib(quad, samples, tri_idx, tri_r, pair_idx, pair_r)
    return state, pending, has_pending, code, linear, quad


def _verify_mask_body(state, pending, has_pending, code, linear, quad, ms):
    state, pending, has_pending = _absorb_stream(
        state, pending, has_pending, ms, jnp.asarray(3, jnp.int32))
    code = fo.addmod(code, ms[0])
    linear = fo.addmod(linear, ms[1])
    quad = fo.addmod(quad, ms[2])
    return state, pending, has_pending, code, linear, quad


_commit_jit = jax.jit(_commit_body, static_argnums=(7, 8, 10))
_check_jit = jax.jit(_check_body, static_argnums=(12, 13, 15, 16))
_mask_jit = jax.jit(_mask_body, static_argnums=(9, 10))
_open_jit = jax.jit(_open_body, static_argnums=(4, 5, 7))
_verify_jit = jax.jit(_verify_body, static_argnums=(17, 18))
_verify_mask_jit = jax.jit(_verify_mask_body)


class TpuExecutor:
    """Owns the RS codec tables and drives the jitted pipelines."""

    # Jitted pipeline entry points; ShardedExecutor overrides these with
    # sharding-annotated twins (parallel/mesh.py).
    _commit = staticmethod(_commit_jit)
    _check = staticmethod(_check_jit)
    _mask = staticmethod(_mask_jit)
    _open = staticmethod(_open_jit)
    _verify = staticmethod(_verify_jit)
    _verify_mask = staticmethod(_verify_mask_jit)

    def __init__(self, k: int, n: int, batch_rows: int = 16):
        self.k, self.n = k, n
        self.codec = RSCodec(k, n)
        self.batch_rows = batch_rows

    # ---- helpers ---------------------------------------------------------

    def fetch(self, x) -> np.ndarray:
        """Device -> host transfer of a pipeline output.  The contexts and
        drivers call this (never raw np.asarray) so that the multi-host
        executor can substitute a replicate-then-read (parallel/mesh.py:
        ShardedExecutor.fetch handles globally-sharded arrays whose shards
        live on other processes)."""
        return np.asarray(x, np.uint32)

    def rows_to_limbs(self, rows: list[list[int]], width: int) -> np.ndarray:
        out = np.zeros((len(rows), width, NLIMB), np.uint32)
        for i, r in enumerate(rows):
            ints_to_limbs(r, out[i])
        return out

    # ---- stage 1: commit -------------------------------------------------

    # The MXU (int8-matmul) NTT serves the k-width hot path; 2k mask rows
    # (once per proof) and decode (3 codewords per proof) stay on the VPU
    # path, avoiding a second 150 MB table set for a cold geometry.
    _use_mxu = staticmethod(_mxu_use)

    def commit_step(self, sha, rows, valid_count, *, width_2k=False):
        dom = self.codec.dom_2k if width_2k else self.codec.dom_k
        state, pending, has_pending = sha
        use_mxu = self._use_mxu() and not width_2k
        return self._commit(state, pending, has_pending, jnp.asarray(rows),
                           jnp.asarray(valid_count, jnp.int32),
                           dom, self.codec.dom_n, self.n, _planar_use(),
                           self.codec.mxu_tabs if use_mxu else None,
                           use_mxu)

    # ---- stage 2: checks -------------------------------------------------

    def check_step(self, accs, rows, rands, code_rs, tri_idx, tri_r,
                   pair_idx, pair_r, rands_zero=False):
        use_mxu = self._use_mxu()
        return self._check(*accs, jnp.asarray(rows), jnp.asarray(rands),
                          jnp.asarray(code_rs), jnp.asarray(tri_idx),
                          jnp.asarray(tri_r), jnp.asarray(pair_idx),
                          jnp.asarray(pair_r),
                          self.codec.dom_k, self.codec.dom_n, self.n,
                          _planar_use(),
                          self.codec.mxu_tabs if use_mxu else None,
                          use_mxu, rands_zero)

    def mask_step(self, accs, code_row, linear_row, quad_row):
        return self._mask(*accs, jnp.asarray(code_row),
                         jnp.asarray(linear_row), jnp.asarray(quad_row),
                         self.codec.dom_k, self.codec.dom_2k,
                         self.codec.dom_n, self.n, _planar_use())

    # ---- stage 3: openings ----------------------------------------------

    def open_step(self, rows, sample_idx, *, width_2k=False):
        dom = self.codec.dom_2k if width_2k else self.codec.dom_k
        use_mxu = self._use_mxu() and not width_2k
        return self._open(jnp.asarray(rows),
                         jnp.asarray(sample_idx, jnp.int32),
                         dom, self.codec.dom_n, self.n, _planar_use(),
                         self.codec.mxu_tabs if use_mxu else None,
                         use_mxu)

    # ---- verifier --------------------------------------------------------

    def verify_step(self, sha, accs, samples, rands, code_rs, tri_idx, tri_r,
                    pair_idx, pair_r, sample_idx, valid_count):
        state, pending, has_pending = sha
        out = self._verify(state, pending, has_pending, *accs,
                          jnp.asarray(samples), jnp.asarray(rands),
                          jnp.asarray(code_rs), jnp.asarray(tri_idx),
                          jnp.asarray(tri_r), jnp.asarray(pair_idx),
                          jnp.asarray(pair_r),
                          jnp.asarray(sample_idx, jnp.int32),
                          jnp.asarray(valid_count, jnp.int32),
                          self.codec.dom_k, self.codec.dom_n, self.n,
                          _planar_use())
        return (out[0], out[1], out[2]), (out[3], out[4], out[5])

    def verify_mask_step(self, sha, accs, mask_samples):
        state, pending, has_pending = sha
        out = self._verify_mask(state, pending, has_pending, *accs,
                               jnp.asarray(mask_samples))
        return (out[0], out[1], out[2]), (out[3], out[4], out[5])

    # ---- decode / sha ----------------------------------------------------

    def decode(self, codeword):
        """(n, 8) -> (n, 8) decoded (see ops.ntt.decode_rows)."""
        return self.codec.decode(jnp.asarray(codeword)[None])[0]

    def sha_init(self, num_cols: int):
        return (jsha.initial_state(num_cols),
                jnp.zeros((num_cols, NLIMB), jnp.uint32),
                jnp.asarray(False))

    def sha_finalize(self, sha, rows_absorbed: int):
        state, pending, has_pending = sha
        return jsha.finalize(state, pending, has_pending,
                             jnp.asarray(rows_absorbed, jnp.int32))
