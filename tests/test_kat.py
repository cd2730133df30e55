"""Known-answer tests against published standards vectors.

The protocol's bit-parity with the reference rests on AES-256-CTR
(`util/csprng.hpp`) and SHA-256 (`zkp/sha256.hpp`, `shader/sha256.wgsl.in`)
behaving identically on both sides.  The reference binary cannot be built
in this environment (no Dawn/gmp/boost), so cross-parity is discharged
where possible with *standards* vectors instead of library-vs-library
comparisons:

* AES-256-CTR — NIST SP 800-38A, appendix F.5.5 (CTR-AES256.Encrypt).
* SHA-256     — FIPS 180-4 vectors ("abc", "", two-block message), run
  through BOTH the host hashlib path and the jitted SoA column engine.
"""

import hashlib
import struct

import numpy as np
import jax.numpy as jnp

from ligero_prover_tpu.zkp.csprng import MpzRandomEngine, HashRandomEngine
from ligero_prover_tpu.ops import sha256 as jsha

# --- NIST SP 800-38A F.5.5: CTR-AES256.Encrypt -------------------------

NIST_KEY = bytes.fromhex(
    "603deb1015ca71be2b73aef0857d77811f352c073b6108d72d9810a30914dff4")
NIST_CTR0 = bytes.fromhex("f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff")
NIST_PT = [
    "6bc1bee22e409f96e93d7e117393172a",
    "ae2d8a571e03ac9c9eb76fac45af8e51",
    "30c81c46a35ce411e5fbc1191a0a52ef",
    "f69f2445df4f9b17ad2b417be66c3710",
]
NIST_CT = [
    "601ec313775789a5b7a7f504bbf3d228",
    "f443e3ca4d62b59aca84e990cacaf5c5",
    "2b0930daa23de94ce87017ba2d84988d",
    "dfc9c58db67aada613c2dd08457941a6",
]
# The engine encrypts zeros, so its buffer IS the keystream: CT xor PT.
NIST_KEYSTREAM = b"".join(
    bytes(a ^ b for a, b in zip(bytes.fromhex(ct), bytes.fromhex(pt)))
    for pt, ct in zip(NIST_PT, NIST_CT))


def test_aes256_ctr_nist_sp800_38a():
    eng = MpzRandomEngine(NIST_KEY, NIST_CTR0)
    got = eng.draw_int(64).to_bytes(64, "little")
    assert got == NIST_KEYSTREAM


def test_aes256_ctr_nist_counter_continuation():
    # Blocks must advance the counter across draws (CTR, not per-call IV).
    eng = MpzRandomEngine(NIST_KEY, NIST_CTR0)
    for i in range(4):
        got = eng.draw_int(16).to_bytes(16, "little")
        assert got == NIST_KEYSTREAM[16 * i:16 * (i + 1)], f"block {i}"


# --- FIPS 180-4 SHA-256 ------------------------------------------------

FIPS_VECTORS = [
    (b"abc",
     "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"),
    (b"",
     "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"),
    (b"abcdbcdecdefdefgefghfghighijhijkijkljklmklmnlmnomnopnopq",
     "248d6a61d20638b8e5c026930c3e6039a33ce45964ff2167f6ecedd419db06c1"),
]


def test_sha256_fips_host_path():
    for msg, want in FIPS_VECTORS:
        assert hashlib.sha256(msg).hexdigest() == want


def _soa_block_from_bytes(block64: bytes, cols: int):
    """One 64-byte message block -> (16, cols) big-endian u32 words."""
    words = struct.unpack(">16I", block64)
    return jnp.tile(jnp.array(words, jnp.uint32)[:, None], (1, cols))


def test_sha256_fips_soa_transform():
    """Drive the jitted SoA column engine with the FIPS one/two-block
    messages, padding by hand (the production `finalize` hard-codes the
    32-byte-row framing, so padding is applied here as raw blocks)."""
    for msg, want in FIPS_VECTORS:
        # classic SHA-256 padding
        bitlen = len(msg) * 8
        padded = msg + b"\x80" + bytes((55 - len(msg)) % 64) + struct.pack(
            ">Q", bitlen)
        cols = 4
        state = jsha.initial_state(cols)
        for off in range(0, len(padded), 64):
            state = jsha.transform(state,
                                   _soa_block_from_bytes(padded[off:off + 64],
                                                         cols))
        for col_digest in jsha.digests_to_bytes(state):
            assert col_digest.hex() == want, msg


def test_sha256_soa_row_framing_matches_host():
    """The production framing (32-byte rows, paired into blocks, row-count
    length) must equal hashlib over the same byte stream."""
    rows = [bytes([i] * 32) for i in range(5)]  # odd count -> pending path
    cols = 3
    state = jsha.initial_state(cols)
    # pair up rows into 64-byte blocks
    for i in range(0, 4, 2):
        blk = _soa_block_from_bytes(rows[i] + rows[i + 1], cols)
        state = jsha.absorb_pairs(state, blk[None], jnp.array([True]))
    pending = jnp.array(
        np.tile(np.frombuffer(rows[4], ">u4").astype(np.uint32)[None, :],
                (cols, 1)))
    final = jsha.finalize(state, pending, jnp.array(True),
                          jnp.array(5, jnp.int32))
    want = hashlib.sha256(b"".join(rows)).hexdigest()
    for col_digest in jsha.digests_to_bytes(final):
        assert col_digest.hex() == want


def test_hash_random_engine_pinned_stream():
    """Pin the FS byte engine's quirky stream shape: block 0 is
    SHA256(le64(0)) read back-to-front, block 1 is SHA256(seed||le64(1))."""
    seed = bytes(range(32))
    eng = HashRandomEngine(seed)
    blk0 = hashlib.sha256(struct.pack("<Q", 0)).digest()
    got0 = bytes(eng.next_byte() for _ in range(32))
    assert got0 == blk0[::-1]
    blk1 = hashlib.sha256(seed + struct.pack("<Q", 1)).digest()
    got1 = bytes(eng.next_byte() for _ in range(32))
    assert got1 == blk1[::-1]
