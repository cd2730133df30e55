"""CSPRNGs, sampling, SHA-256 batch, Merkle tree."""

import hashlib

import pytest

import numpy as np
import jax.numpy as jnp

from ligero_prover_tpu.field import bn254 as F
from ligero_prover_tpu.field.limbs import ints_to_limbs, limbs_to_bytes_be_stream
from ligero_prover_tpu.zkp.csprng import MpzRandomEngine, HashRandomEngine
from ligero_prover_tpu.zkp.sampling import boost_uniform_int, portable_sample
from ligero_prover_tpu.zkp import merkle
from ligero_prover_tpu.ops import sha256 as jsha


def test_mpz_engine_keystream():
    """AES-256-CTR over zeros with zero IV — check against cryptography direct."""
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes
    key = bytes(range(32))
    eng = MpzRandomEngine(key, bytes(16))
    ref = Cipher(algorithms.AES(key), modes.CTR(bytes(16))).encryptor().update(bytes(64))
    x = eng.draw_int(32)
    assert x == int.from_bytes(ref[:32], "little")
    y = eng.draw_int(32)
    assert y == int.from_bytes(ref[32:64], "little")


def test_mpz_engine_refill_discards_tail():
    key = bytes(32)
    eng = MpzRandomEngine(key, bytes(16))
    # consume 2040 u64s, leaving 8; then ask for 16 bytes (2 u64): fits.
    for _ in range(255):
        eng.draw_int(64)
    assert eng._offset_u64 == 2040
    eng.draw_int(64)  # now offset = 2048
    # next request must trigger refill from a fresh 16KB block
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes
    ref = Cipher(algorithms.AES(key), modes.CTR(bytes(16))).encryptor()
    ref.update(bytes(16384))
    second = ref.update(bytes(16384))
    assert eng.draw_int(8) == int.from_bytes(second[:8], "little")


def test_field_generate_random_range():
    eng = MpzRandomEngine(bytes(32), bytes(16))
    for _ in range(100):
        v = F.generate_random(eng)
        assert 0 <= v < F.MODULUS


def test_hash_random_engine_blocks():
    seed = bytes(range(32))
    eng = HashRandomEngine(seed)
    # Block 0 = SHA256(le64(0)) read back-to-front (reference quirk:
    # the seed is absorbed only after the first flush, random.hpp:129-138)
    b0 = hashlib.sha256((0).to_bytes(8, "little")).digest()
    got = [eng() for _ in range(32)]
    assert got == list(b0[::-1])
    b1 = hashlib.sha256(seed + (1).to_bytes(8, "little")).digest()
    got = [eng() for _ in range(32)]
    assert got == list(b1[::-1])


class FixedEngine:
    MIN, MAX = 0, 255

    def __init__(self, seq):
        self.seq = list(seq)
        self.i = 0

    def __call__(self):
        v = self.seq[self.i % len(self.seq)]
        self.i += 1
        return v


def test_boost_uniform_small_ranges():
    # range <= 255: bucket algorithm
    eng = FixedEngine([0, 1, 2, 255, 254, 17])
    # range = 127 -> bucket = 2
    vals = [boost_uniform_int(eng, 0, 127) for _ in range(6)]
    assert vals == [0, 0, 1, 127, 127, 8]
    # range = brange: direct
    eng = FixedEngine([9])
    assert boost_uniform_int(eng, 0, 255) == 9
    # degenerate
    assert boost_uniform_int(FixedEngine([1]), 5, 5) == 5


def test_boost_uniform_large_range_two_bytes():
    # range = 32767 (k=32768): result = e0 + 256*(e1/2), reject if > range
    eng = FixedEngine([10, 20])
    assert boost_uniform_int(eng, 0, 32767) == 10 + 256 * (20 // 2)
    # rejection path: e1/2 = 127 -> 255*... max result = 255+256*127 = 32767 ok
    eng = FixedEngine([255, 255])
    assert boost_uniform_int(eng, 0, 32767) == 255 + 256 * 127


def test_portable_sample_properties():
    eng = HashRandomEngine(hashlib.sha256(b"seed").digest())
    idx = portable_sample(1024, 192, eng)
    assert len(idx) == 192
    assert len(set(idx)) == 192
    assert all(0 <= i < 1024 for i in idx)
    # deterministic
    eng2 = HashRandomEngine(hashlib.sha256(b"seed").digest())
    assert portable_sample(1024, 192, eng2) == idx


@pytest.mark.parametrize("transform", ["unrolled", "rolled"])
def test_jax_sha256_transforms_match_hashlib(rng, transform, monkeypatch):
    """Both compression-loop variants against the hashlib oracle, regardless
    of which backend the runner dispatches to (ADVICE r2)."""
    fn = (jsha.transform_unrolled if transform == "unrolled"
          else jsha.transform_rolled)
    monkeypatch.setattr(jsha, "transform", fn)
    blk = jnp.zeros((16, 3), jnp.uint32)
    st = fn(jsha.initial_state(3), blk)
    expect = hashlib.sha256(bytes(64)).digest()  # un-finalized one-block msg
    # compare raw compression output against hashlib of a 64-byte zero block
    # by finalizing manually: absorb the padding block too
    pad = bytearray(64)
    pad[0] = 0x80
    pad[56:64] = (512).to_bytes(8, "big")
    pad_words = np.frombuffer(bytes(pad), ">u4").astype(np.uint32)
    st = fn(st, jnp.asarray(pad_words.reshape(16, 1).repeat(3, axis=1)))
    for c in range(3):
        got = b"".join(int(st[w][c]).to_bytes(4, "big") for w in range(8))
        assert got == expect


def test_jax_sha256_matches_hashlib(rng):
    cols = 4
    rows = [[rng.randrange(F.MODULUS) for _ in range(cols)] for _ in range(5)]
    state = jsha.initial_state(cols)
    pending = jnp.zeros((cols, 8), jnp.uint32)
    has_pending = False
    count = 0
    row_arrs = [jnp.asarray(ints_to_limbs(r)) for r in rows]
    for r in row_arrs:
        if has_pending:
            blk = jnp.concatenate([pending.T, r.T], axis=0)[None]  # (1,16,C)
            state = jsha.absorb_pairs(state, blk, jnp.asarray([True]))
            has_pending = False
        else:
            pending = r
            has_pending = True
        count += 1
    final = jsha.finalize(state, pending, jnp.asarray(has_pending),
                          jnp.asarray(count, jnp.int32))
    digests = jsha.digests_to_bytes(final)
    for c in range(cols):
        stream = b"".join(
            limbs_to_bytes_be_stream(ints_to_limbs([rows[r][c]]))
            for r in range(len(rows)))
        assert digests[c] == hashlib.sha256(stream).digest()


def test_merkle_roundtrip():
    leaves = [hashlib.sha256(bytes([i])).digest() for i in range(16)]
    t = merkle.MerkleTree(leaves)
    idx = [1, 5, 6, 15]
    sibs = t.decommit(idx)
    root = merkle.recommit([leaves[i] for i in idx], idx, sibs, t.num_nodes)
    assert root == t.root
    # tampered leaf fails
    bad = merkle.recommit([leaves[i] if i != 5 else bytes(32) for i in idx],
                          idx, sibs, t.num_nodes)
    assert bad != t.root


def test_merkle_structure():
    leaves = [hashlib.sha256(bytes([i])).digest() for i in range(4)]
    t = merkle.MerkleTree(leaves)
    h = lambda a, b: hashlib.sha256(a + b).digest()
    assert t.root == h(h(leaves[0], leaves[1]), h(leaves[2], leaves[3]))


def test_wasi_mt19937_libstdcxx_parity():
    """random_get byte stream must match libstdc++
    uniform_int_distribution<int>(0,255) over a default std::mt19937
    (``wasi_preview1.hpp:198-210``) — including the ~1-in-16.8M rejection
    of draws >= 4294967040.  Expected bytes generated by g++/libstdc++ 13
    (see the divide-by-scaling algorithm in bits/uniform_int_dist.h)."""
    from ligero_prover_tpu.vm.hostmods.wasi import _MT19937

    first32 = [208, 34, 231, 213, 32, 248, 233, 56, 161, 78, 24, 140, 71,
               48, 140, 254, 245, 255, 247, 247, 40, 185, 248, 251, 245,
               28, 124, 204, 204, 76, 36, 1]
    # bytes 999984..1000015 — past at least one rejection event
    far32 = [151, 55, 245, 54, 234, 81, 12, 112, 136, 43, 166, 148, 203,
             76, 170, 63, 186, 107, 124, 15, 87, 179, 135, 129, 32, 21,
             149, 96, 38, 94, 143, 139]
    m = _MT19937()
    got = [m.next_byte() for _ in range(1000016)]
    assert got[:32] == first32
    assert got[999984:] == far32
