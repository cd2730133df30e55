"""Batched per-column SHA-256 in JAX.

One independent SHA-256 stream per codeword column, state laid out
structure-of-arrays with the column axis last — the TPU analogue of the
reference's ``[field][instance]`` layout (``shader/sha256.wgsl:23-29``).

Each absorbed element is 32 bytes: its 8 little-endian u32 limbs, each
serialized big-endian (``sha256.wgsl:152-176``).  Because SHA-256 reads
message words big-endian, a block's 16 message words are exactly the raw
limbs of two consecutive elements — no byte swizzling at all.

The executor absorbs rows in protocol order; compression happens once per
two rows.  Finalization applies standard SHA-256 padding with
bitlen = 256 * rows_absorbed.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_U32 = jnp.uint32

# numpy, NOT jnp: a module-level device constant would initialize the
# JAX backend (and under axon, the TPU tunnel) at import time.
K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2], dtype=np.uint32)

INIT_STATE = np.array([
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19], dtype=np.uint32)


def initial_state(num_cols: int):
    """(8, C) uint32."""
    return jnp.broadcast_to(jnp.asarray(INIT_STATE)[:, None], (8, num_cols))


def _rotr(x, r):
    return (x >> r) | (x << (32 - r))


_K_INTS = [int(k) for k in K]


def transform_unrolled(state, block):
    """One compression, fully unrolled with a rotating 16-word schedule.

    Straight-line code -> XLA emits one fused VPU kernel over the column
    axis; the rolled variant below pays ~112 tiny kernel launches per block
    (measured 2.55 ms vs ~0.04 ms at C=32768 on TPU v5e).  TPU-only: on
    XLA:CPU multi-device builds large unrolled bodies compile pathologically
    slowly (round-1 measurement), so CPU uses :func:`transform_rolled`.
    """
    w = [block[i] for i in range(16)]
    a, b, c, d, e, f, g, h = (state[i] for i in range(8))
    for i in range(64):
        if i >= 16:
            x15, x2 = w[(i - 15) % 16], w[(i - 2) % 16]
            s0 = _rotr(x15, 7) ^ _rotr(x15, 18) ^ (x15 >> 3)
            s1 = _rotr(x2, 17) ^ _rotr(x2, 19) ^ (x2 >> 10)
            w[i % 16] = w[i % 16] + s1 + w[(i - 7) % 16] + s0
        t1 = h + (_rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)) \
            + ((e & f) ^ (~e & g)) + jnp.uint32(_K_INTS[i]) + w[i % 16]
        t2 = (_rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)) \
            + ((a & b) ^ (a & c) ^ (b & c))
        a, b, c, d, e, f, g, h = t1 + t2, a, b, c, d + t1, e, f, g
    return state + jnp.stack([a, b, c, d, e, f, g, h])


def transform_rolled(state, block):
    """One compression: state (8, C), block (16, C) message words.

    XLA:CPU compile-time law (measured): loops nested two deep
    (scan-of-fori) take minutes; very large unrolled bodies take minutes on
    *multi-device* builds.  A rolled transform called from a
    Python-unrolled (small, static) block loop avoids both regimes — this
    function must therefore never be wrapped in lax.scan/fori_loop.
    """
    c = block.shape[1]
    w = jnp.zeros((64, c), _U32).at[:16].set(block)

    def sched(i, w):
        s0 = _rotr(w[i - 15], 7) ^ _rotr(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = _rotr(w[i - 2], 17) ^ _rotr(w[i - 2], 19) ^ (w[i - 2] >> 10)
        return w.at[i].set(s1 + w[i - 7] + s0 + w[i - 16])

    w = jax.lax.fori_loop(16, 64, sched, w)

    k_tab = jnp.asarray(K)   # numpy at module scope; constant under trace

    def round_fn(i, vals):
        a, b, cc, d, e, f, g, h = vals
        t1 = h + (_rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)) \
            + ((e & f) ^ (~e & g)) + k_tab[i] + w[i]
        t2 = (_rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)) \
            + ((a & b) ^ (a & cc) ^ (b & cc))
        return (t1 + t2, a, b, cc, d + t1, e, f, g)

    vals = jax.lax.fori_loop(0, 64, round_fn,
                             tuple(state[i] for i in range(8)))
    return state + jnp.stack(vals)


def transform(state, block):
    """Backend-dispatching compression (trace-time choice; each jit
    compiles for one backend, so the branch is resolved statically)."""
    if jax.default_backend() == "cpu":
        return transform_rolled(state, block)
    return transform_unrolled(state, block)


@jax.jit
def absorb_pairs(state, blocks, valid):
    """Absorb a padded batch of blocks.

    state: (8, C); blocks: (P, 16, C); valid: (P,) bool.  Invalid slots
    leave the state untouched, so the executor can pad to a fixed P.
    Unrolled over P (see transform's compile-time note).
    """
    for i in range(blocks.shape[0]):
        state = jnp.where(valid[i], transform(state, blocks[i]), state)
    return state


@jax.jit
def finalize(state, pending, has_pending, rows_absorbed):
    """Apply SHA-256 padding and return (8, C) final state.

    pending: (C, 8) limbs of an unpaired absorbed element (valid when
    has_pending); rows_absorbed: traced int32 scalar (count includes
    pending).
    """
    c = state.shape[1]
    # bitlen = rows * 256 as a 64-bit big-endian length, without uint64
    # (x64 mode stays off): lo32 = rows << 8, hi32 = rows >> 24.
    rows_u32 = rows_absorbed.astype(_U32)
    hi = rows_u32 >> 24
    lo = rows_u32 << 8

    # Case A (even): one block [0x80, 0.., bitlen]
    blk_a = jnp.zeros((16, c), _U32)
    blk_a = blk_a.at[0].set(0x80000000)
    blk_a = blk_a.at[14].set(hi)
    blk_a = blk_a.at[15].set(lo)

    # Case B (odd): block = [pending limbs, 0x80, 0.., bitlen]
    blk_b = jnp.zeros((16, c), _U32)
    blk_b = blk_b.at[:8].set(pending.T)
    blk_b = blk_b.at[8].set(0x80000000)
    blk_b = blk_b.at[14].set(hi)
    blk_b = blk_b.at[15].set(lo)

    blk = jnp.where(has_pending, blk_b, blk_a)
    return transform(state, blk)


def digests_to_bytes(state) -> list[bytes]:
    """(8, C) -> per-column 32-byte digests (words big-endian)."""
    arr = np.asarray(state, dtype=np.uint32).astype(">u4")  # (8, C)
    cols = np.ascontiguousarray(arr.T)  # (C, 8) big-endian words
    raw = cols.tobytes()
    return [raw[i * 32:(i + 1) * 32] for i in range(cols.shape[0])]
