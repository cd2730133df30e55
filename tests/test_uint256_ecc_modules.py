"""uint256 + ecc host modules (oracle semantics, reference
``include/host_modules/{uint256,ecc}.hpp``)."""

import pytest

from ligero_prover_tpu.vm.hostmods import ecc as E
from ligero_prover_tpu.vm.values import u32
from ligero_prover_tpu.vm.run import make_wat_program
from ligero_prover_tpu.zkp.context import NullContext


def make_ctx():
    """Standalone VM context with one memory and the field host modules."""
    from ligero_prover_tpu.vm.interpreter import VMContext
    from ligero_prover_tpu.vm.module import (Store, MemoryInstance, Limits,
                                             ModuleInstance, Module)
    from ligero_prover_tpu.vm.hostmods.bn254fr import Bn254frModule
    from ligero_prover_tpu.vm.hostmods.uint256 import Uint256Module
    from ligero_prover_tpu.vm.hostmods.ecc import EccModule

    zk = NullContext(k=256)
    ctx = VMContext(zk)
    ctx.store = Store()
    ctx.store.memories.append(MemoryInstance(Limits(1, None)))
    inst = ModuleInstance(Module())
    inst.memaddrs.append(0)
    ctx.module = inst
    ctx.host_modules["bn254fr"] = Bn254frModule(ctx)
    ctx.host_modules["uint256"] = Uint256Module(ctx)
    ctx.host_modules["ecc"] = EccModule(ctx)
    return ctx


def alloc_u256(ctx, addr):
    fr = ctx.host_modules["bn254fr"]
    for i in range(4):
        ctx.push(u32(addr + 8 * i))
        fr.bn254fr_alloc()


def read_u256(ctx, addr):
    u = ctx.host_modules["uint256"]
    return u._compose(u._load_limbs(addr))


# ---------------------------------------------------------------- uint256 --

def test_uint256_set_bytes_and_str():
    ctx = make_ctx()
    u = ctx.host_modules["uint256"]
    alloc_u256(ctx, 0)

    val = 0x1122334455667788_99AABBCCDDEEFF00_0123456789ABCDEF_0F1E2D3C4B5A6978
    raw = val.to_bytes(32, "little")
    ctx.memory.store_bytes(1024, raw)
    ctx.push(u32(0)); ctx.push(u32(1024)); ctx.push(u32(32))
    u.uint256_set_bytes_little()
    assert read_u256(ctx, 0) == val

    ctx.memory.store_bytes(1024, val.to_bytes(32, "big"))
    ctx.push(u32(0)); ctx.push(u32(1024)); ctx.push(u32(32))
    u.uint256_set_bytes_big()
    assert read_u256(ctx, 0) == val

    # short buffers
    ctx.memory.store_bytes(1024, (0xDEAD).to_bytes(2, "little"))
    ctx.push(u32(0)); ctx.push(u32(1024)); ctx.push(u32(2))
    u.uint256_set_bytes_little()
    assert read_u256(ctx, 0) == 0xDEAD

    s = b"0x" + b"%x" % val + b"\x00"
    ctx.memory.store_bytes(2048, s)
    ctx.push(u32(0)); ctx.push(u32(2048)); ctx.push(u32(0))
    u.uint256_set_str()
    assert read_u256(ctx, 0) == val


def test_uint512_idiv_normalized():
    ctx = make_ctx()
    u = ctx.host_modules["uint256"]
    fr = ctx.host_modules["bn254fr"]
    # layout: q_low@0, q_high handle@32, r@40, a_low@72, a_high@104, b@136
    for base in (0, 40, 72, 104, 136):
        alloc_u256(ctx, base)
    ctx.push(u32(32)); fr.bn254fr_alloc()

    a = (0xF0E1D2C3 << 480) | 0x123456789ABCDEF0FEDCBA9876543210
    b = (1 << 255) | 0xDEADBEEF  # normalized divisor (msb set)
    u._decompose(u._load_limbs(72), a & ((1 << 256) - 1))
    u._decompose(u._load_limbs(104), a >> 256)
    u._decompose(u._load_limbs(136), b)

    for addr in (0, 32, 40, 72, 104, 136):
        ctx.push(u32(addr))
    u.uint512_idiv_normalized()

    q, r = divmod(a, b)
    assert read_u256(ctx, 0) == q & ((1 << 256) - 1)
    assert fr._load(32).value == q >> 256
    assert read_u256(ctx, 40) == r


def test_uint256_invmod():
    ctx = make_ctx()
    u = ctx.host_modules["uint256"]
    for base in (0, 32, 64):
        alloc_u256(ctx, base)
    m = E.SECP256K1_N
    a = 0x123456789ABCDEF_FEDCBA9876543210
    u._decompose(u._load_limbs(32), a)
    u._decompose(u._load_limbs(64), m)
    ctx.push(u32(0)); ctx.push(u32(32)); ctx.push(u32(64))
    u.uint256_invmod()
    inv = read_u256(ctx, 0)
    assert a * inv % m == 1


def test_uint256_invmod_noninvertible_writes_zero():
    """Misbehaving guest: gcd(a, m) > 1 leaves out == 0 (constraints then
    fail guest-side, matching mpz_invert tolerance, ``uint256.hpp:227``)."""
    ctx = make_ctx()
    u = ctx.host_modules["uint256"]
    for base in (0, 32, 64):
        alloc_u256(ctx, base)
    u._decompose(u._load_limbs(0), 0xFF)   # pre-dirty the output
    u._decompose(u._load_limbs(32), 6)
    u._decompose(u._load_limbs(64), 9)
    ctx.push(u32(0)); ctx.push(u32(32)); ctx.push(u32(64))
    u.uint256_invmod()
    assert read_u256(ctx, 0) == 0


def test_uint512_idiv_by_zero_traps():
    from ligero_prover_tpu.vm.values import WasmTrap
    ctx = make_ctx()
    u = ctx.host_modules["uint256"]
    fr = ctx.host_modules["bn254fr"]
    for base in (0, 40, 72, 104, 136):
        alloc_u256(ctx, base)
    ctx.push(u32(32)); fr.bn254fr_alloc()
    u._decompose(u._load_limbs(72), 123)
    for addr in (0, 32, 40, 72, 104, 136):
        ctx.push(u32(addr))
    with pytest.raises(WasmTrap):
        u.uint512_idiv_normalized()


def test_uint256_set_str_unterminated_traps():
    from ligero_prover_tpu.vm.values import WasmTrap
    ctx = make_ctx()
    u = ctx.host_modules["uint256"]
    alloc_u256(ctx, 0)
    mem = ctx.memory
    mem.data[-8:] = b"12345678"          # no NUL before memory end
    ctx.push(u32(0)); ctx.push(u32(len(mem.data) - 8)); ctx.push(u32(10))
    with pytest.raises(WasmTrap):
        u.uint256_set_str()


UINT256_WAT = r"""
(module
  (import "bn254fr" "bn254fr_alloc" (func $alloc (param i32)))
  (import "bn254fr" "bn254fr_free" (func $free (param i32)))
  (import "bn254fr" "bn254fr_get_u64" (func $get_u64 (param i32) (result i64)))
  (import "uint256" "uint256_set_str" (func $set_str (param i32 i32 i32)))
  (import "env" "assert_one" (func $assert_one (param i32)))
  (memory 1)
  (data (i32.const 256) "0xDEADBEEF00C0FFEE\00")
  (func $test
    (call $alloc (i32.const 0))
    (call $alloc (i32.const 8))
    (call $alloc (i32.const 16))
    (call $alloc (i32.const 24))
    (call $set_str (i32.const 0) (i32.const 256) (i32.const 0))
    (call $assert_one
      (i64.eq (call $get_u64 (i32.const 0))
              (i64.const 0xDEADBEEF00C0FFEE)))
    (call $free (i32.const 0))
    (call $free (i32.const 8))
    (call $free (i32.const 16))
    (call $free (i32.const 24)))
  (export "_start" (func $test)))
"""


def test_uint256_wat_wiring():
    prog = make_wat_program(UINT256_WAT, [b"Ligero\x00"], set(), strict=True)
    prog(NullContext(k=256))


# -------------------------------------------------------------------- ecc --

P256_GX = 0x6b17d1f2e12c4247f8bce6e563a440f277037d812deb33a0f4a13945d898c296
P256_GY = 0x4fe342e2fe1a7f9b8ee7eb4a7c0f9e162bce33576b315ececbb6406837bf51f5
P256_2GX = 0x7cf27b188d034f7e8a52380304b51ac3c08969e277f21b35a60b48fc47669978
P256_2GY = 0x07775510db8ed040293d9ac69f7430dbba7dade63ce982299e04b79d227873d1

K1_GX = 0x79be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798
K1_GY = 0x483ada7726a3c4655da4fbfc0e1108a8fd17b448a68554199c47d08ffb10d4b8
K1_2GX = 0xc6047f9441ed7d6d3045406e95c07cd85c778e4b8cef3ca7abac09b95c709ee5
K1_2GY = 0x1ae168fea63dc339a3c58419466ceaeef7f632653266d0e1236431a950cfe52a

ED_BX = 0x216936d3cd6e53fec0a4e231fdd6dc5c692cc7609525a7b2c9562d608f25d51a
ED_BY = 0x6666666666666666666666666666666666666666666666666666666666666658


def test_p256_scalar_mul_vectors():
    assert E._weierstrass_scalar_mul(1, P256_GX, P256_GY, E.P256_P,
                                     E.P256_B, False) == (P256_GX, P256_GY)
    assert E._weierstrass_scalar_mul(2, P256_GX, P256_GY, E.P256_P,
                                     E.P256_B, False) == (P256_2GX, P256_2GY)
    # on-curve: y^2 = x^3 - 3x + b
    x, y = E._weierstrass_scalar_mul(0xDEADBEEF, P256_GX, P256_GY,
                                     E.P256_P, E.P256_B, False)
    p = E.P256_P
    assert y * y % p == (x * x * x - 3 * x + E.P256_B) % p


def test_secp256k1_scalar_mul_vectors():
    assert E._weierstrass_scalar_mul(2, K1_GX, K1_GY, E.SECP256K1_P,
                                     E.SECP256K1_B3, True) == (K1_2GX, K1_2GY)
    x, y = E._weierstrass_scalar_mul(12345, K1_GX, K1_GY, E.SECP256K1_P,
                                     E.SECP256K1_B3, True)
    p = E.SECP256K1_P
    assert y * y % p == (x * x * x + 7) % p


def test_ed25519_scalar_mul_and_decompress():
    assert E._ed25519_scalar_mul(1, ED_BX, ED_BY) == (ED_BX, ED_BY)
    # order * B = identity
    assert E._ed25519_scalar_mul(E.ED25519_N, ED_BX, ED_BY) == (0, 1)
    # on-curve: -x^2 + y^2 = 1 + d x^2 y^2
    x, y = E._ed25519_scalar_mul(7, ED_BX, ED_BY)
    p = E.ED25519_P
    assert (-x * x + y * y) % p == (1 + E.ED25519_D * x * x % p * y % p
                                    * y) % p
    # decompress the base point encoding (sign bit 0 — ED_BX is even)
    assert E.ed25519_point_decompress(ED_BY) == (ED_BX, ED_BY)
    # y >= p rejected
    assert E.ed25519_point_decompress(E.ED25519_P) is None
    # non-square u/v rejected: y=2 gives x^2 = (4-1)/(d*4+1), not a QR
    assert E.ed25519_point_decompress(2) is None


def test_scalar_decompose_invariant():
    ctx = make_ctx()
    ecc = ctx.host_modules["ecc"]
    k = 0x5A5A5A5A_DEADBEEF_0BADF00D_12345678_9ABCDEF0_13579BDF_2468ACE0_F0F0F0F0
    n = E.SECP256K1_N
    k %= n
    ctx.memory.store_bytes(512, k.to_bytes(32, "little"))
    # args: curve, x_abs, x_sgn, z_abs, z_sgn, k_bytes, num_k_bytes
    for v in (E.CURVE_SECP256K1, 0, 16, 32, 48, 512, 32):
        ctx.push(u32(v))
    ecc.scalar_decompose()

    x_abs = int.from_bytes(ctx.memory.load_bytes(0, 16), "little")
    x_sgn = int.from_bytes(ctx.memory.load_bytes(16, 4), "little")
    z_abs = int.from_bytes(ctx.memory.load_bytes(32, 16), "little")
    z_sgn = int.from_bytes(ctx.memory.load_bytes(48, 4), "little")
    r1 = x_abs if x_sgn else -x_abs
    t1 = z_abs if z_sgn else -z_abs
    # EEA invariant r1 = s1*n + t1*k  =>  r1 ≡ t1*k (mod n)
    assert (t1 * k - r1) % n == 0
    assert abs(r1) < 2**129 and abs(t1) <= 2**129
    assert ctx.memory.contains_secret(0, 16)
    assert ctx.memory.contains_secret(48, 52)


def test_scalar_mul_module_call():
    ctx = make_ctx()
    ecc = ctx.host_modules["ecc"]
    s = 0xC0FFEE
    ctx.memory.store_bytes(256, P256_GX.to_bytes(32, "little"))
    ctx.memory.store_bytes(288, P256_GY.to_bytes(32, "little"))
    ctx.memory.store_bytes(512, s.to_bytes(4, "little"))
    # args: curve, out, p, s, num_s_bytes
    for v in (E.CURVE_P256, 0, 256, 512, 4):
        ctx.push(u32(v))
    ecc.scalar_mul()
    rx = int.from_bytes(ctx.memory.load_bytes(0, 32), "little")
    ry = int.from_bytes(ctx.memory.load_bytes(32, 32), "little")
    assert (rx, ry) == E._weierstrass_scalar_mul(s, P256_GX, P256_GY,
                                                 E.P256_P, E.P256_B, False)
    assert ctx.memory.contains_secret(0, 64)


def test_point_decompress_module_call():
    ctx = make_ctx()
    ecc = ctx.host_modules["ecc"]
    ctx.memory.store_bytes(256, ED_BY.to_bytes(32, "little"))
    for v in (E.CURVE_ED25519, 0, 32, 256):
        ctx.push(u32(v))
    ecc.point_decompress()
    errc = ctx.pop()
    assert errc.val == 0
    assert int.from_bytes(ctx.memory.load_bytes(0, 32), "little") == ED_BX
    assert int.from_bytes(ctx.memory.load_bytes(32, 32), "little") == ED_BY
    del errc

    # invalid encoding → EINVAL witness
    ctx.memory.store_bytes(256, E.ED25519_P.to_bytes(32, "little"))
    for v in (E.CURVE_ED25519, 64, 96, 256):
        ctx.push(u32(v))
    ecc.point_decompress()
    errc = ctx.pop()
    assert errc.val == E.EINVAL
    del errc
