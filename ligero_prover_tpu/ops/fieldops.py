"""Vectorized BN254-Fr limb arithmetic in JAX (uint32 x 8, little-endian).

Design notes (TPU-first):

* Elements are tensors of shape (..., 8) uint32 — the same ABI as the
  reference device bignum (``device_bignum.hpp:32-36``) so host<->device
  marshaling is a reinterpret, never a conversion.
* TPUs have no 64-bit scalar unit; 32x32->64 products are emulated with
  16-bit splits (4 multiplies + carries) on the VPU.  All limb loops are
  Python-unrolled so XLA sees straight-line vector code it can fuse.
* Montgomery multiplication uses beta=2^256 with J = -p^-1 mod 2^256
  exactly like the reference shaders (``shader/bn254fr.wgsl.in:101-111``):
  mont_mul(x, y) = x*y/2^256 mod p.  NTT twiddles are stored in Montgomery
  form so butterflies stay in the plain domain.
* Everything returns canonical values in [0, p) unless suffixed ``_lazy``.

The golden oracle is ``ligero_prover_tpu.field.bn254`` (Python ints); the
test suite compares every op element-wise against it.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..field import bn254 as F
from ..field.limbs import int_to_limbs

NLIMB = 8
_U32 = jnp.uint32

# Constant limb tables (numpy, converted lazily by jnp broadcasting)
P_LIMBS = int_to_limbs(F.MODULUS)
P2_LIMBS = int_to_limbs(F.MODULUS_2X)
J_LIMBS = int_to_limbs(F.MONTGOMERY_FACTOR_NEG)  # additive-variant factor
ZERO_LIMBS = np.zeros(NLIMB, np.uint32)


def _limb(x, i):
    return x[..., i]


def add_cc(x, y):
    """256-bit add with carry-out: returns (sum (...,8), carry (...,) u32)."""
    outs = []
    carry = jnp.zeros(x.shape[:-1], _U32)
    for i in range(NLIMB):
        a = _limb(x, i)
        b = _limb(y, i)
        t = a + b
        c1 = (t < a).astype(_U32)
        s = t + carry
        c2 = (s < t).astype(_U32)
        outs.append(s)
        carry = c1 | c2
    return jnp.stack(outs, axis=-1), carry


def sub_cc(x, y):
    """256-bit subtract with borrow-out: (diff, borrow)."""
    outs = []
    borrow = jnp.zeros(x.shape[:-1], _U32)
    for i in range(NLIMB):
        a = _limb(x, i)
        b = _limb(y, i)
        t = a - b
        c1 = (a < b).astype(_U32)
        s = t - borrow
        c2 = (t < borrow).astype(_U32)
        outs.append(s)
        borrow = c1 | c2
    return jnp.stack(outs, axis=-1), borrow


def geq(x, y):
    """Lexicographic x >= y over limbs; returns bool (...,)."""
    gt = jnp.zeros(x.shape[:-1], bool)
    eq = jnp.ones(x.shape[:-1], bool)
    for i in range(NLIMB - 1, -1, -1):
        a = _limb(x, i)
        b = _limb(y, i)
        gt = gt | (eq & (a > b))
        eq = eq & (a == b)
    return gt | eq


def _const(shape_like, limbs: np.ndarray):
    return jnp.asarray(limbs, _U32)


def cond_sub(x, m_limbs: np.ndarray):
    """x - m if x >= m else x (single conditional subtract)."""
    m = jnp.asarray(m_limbs, _U32)
    mb = jnp.broadcast_to(m, x.shape)
    d, _ = sub_cc(x, mb)
    take = geq(x, mb)[..., None]
    return jnp.where(take, d, x)


def addmod(x, y):
    s, carry = add_cc(x, y)
    # p < 2^254 and inputs < p, so no carry out of 256 bits; single cond-sub.
    return cond_sub(s, P_LIMBS)


def submod(x, y):
    d, borrow = sub_cc(x, y)
    p = jnp.broadcast_to(jnp.asarray(P_LIMBS, _U32), x.shape)
    fix, _ = add_cc(d, p)
    return jnp.where((borrow > 0)[..., None], fix, d)


def negmod(x):
    p = jnp.broadcast_to(jnp.asarray(P_LIMBS, _U32), x.shape)
    d, _ = sub_cc(p, x)
    is_zero = jnp.all(x == 0, axis=-1)[..., None]
    return jnp.where(is_zero, x, d)


def mul32(a, b):
    """32x32 -> (lo, hi) via 16-bit splits; all ops uint32."""
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    t = a0 * b0
    u = a1 * b0 + (t >> 16)
    v = a0 * b1 + (u & 0xFFFF)
    hi = a1 * b1 + (u >> 16) + (v >> 16)
    lo = (v << 16) | (t & 0xFFFF)
    return lo, hi


def _acc3_add(t0, t1, t2, lo, hi):
    """(t2:t1:t0) += (hi:lo); 96-bit accumulator of 64-bit addends."""
    s0 = t0 + lo
    c0 = (s0 < t0).astype(_U32)
    s1 = t1 + hi
    c1 = (s1 < t1).astype(_U32)
    s1b = s1 + c0
    c1b = (s1b < s1).astype(_U32)
    s2 = t2 + c1 + c1b
    return s0, s1b, s2


def to_digits16(x):
    """(..., 8) u32 -> list of 16 u32 arrays of 16-bit digits, LE."""
    out = []
    for i in range(NLIMB):
        out.append(x[..., i] & 0xFFFF)
        out.append(x[..., i] >> 16)
    return out


def _carry_sweep(acc, out_limbs: int, shape, out_d: int):
    """16-bit digit accumulators -> packed u32 limbs."""
    digits = []
    carry = jnp.zeros(shape, _U32)
    for c in range(out_d):
        v = acc[c] + carry
        digits.append(v & 0xFFFF)
        carry = v >> 16
    limbs = [digits[2 * i] | (digits[2 * i + 1] << 16)
             for i in range(out_limbs)]
    return jnp.stack(limbs, axis=-1)


def mul_wide_conv(x, y, out_limbs: int = 2 * NLIMB):
    """256x256-bit multiply -> `out_limbs` u32 limbs (16 full, 8 = 2^256).

    Fully unrolled 16-bit digit convolution: each of the 256 digit products
    is exact in u32; the low/high halves are added into per-antidiagonal
    u32 accumulators (<=32 terms < 2^16 each, so no overflow), then one
    16-bit carry sweep.  Everything is elementwise over the element axes,
    so XLA fuses the whole chain into a single loop fusion — no outer
    product or matmul intermediate ever hits HBM (the one-hot contraction
    form below materializes a (..., 16, 16) tensor, ~130 MB per NTT
    butterfly stage at production sizes, and is HBM-bound on TPU).
    """
    nd = 2 * NLIMB                       # 16 digits in
    out_d = 2 * out_limbs                # digits out
    xd = to_digits16(x)
    yd = to_digits16(y)
    acc = [None] * out_d
    for u in range(nd):
        for v in range(nd):
            c = u + v
            if c >= out_d:
                continue
            p = xd[u] * yd[v]
            lo = p & 0xFFFF
            acc[c] = lo if acc[c] is None else acc[c] + lo
            if c + 1 < out_d:
                hi = p >> 16
                acc[c + 1] = hi if acc[c + 1] is None else acc[c + 1] + hi
    return _carry_sweep(acc, out_limbs, x.shape[:-1], out_d)


_ANTIDIAG_CACHE = {}


def _antidiag_masks(nd: int, out_d: int):
    """One-hot (nd*nd, out_d) uint32 matrices: column c selects products
    with i+j == c (lo) / i+j == c-1 (hi).  Cached as numpy: device
    constants created inside a trace must not escape into module state."""
    key = (nd, out_d)
    if key not in _ANTIDIAG_CACHE:
        mlo = np.zeros((nd * nd, out_d), np.uint32)
        mhi = np.zeros((nd * nd, out_d), np.uint32)
        for i in range(nd):
            for j in range(nd):
                if i + j < out_d:
                    mlo[i * nd + j, i + j] = 1
                if i + j + 1 < out_d:
                    mhi[i * nd + j, i + j + 1] = 1
        _ANTIDIAG_CACHE[key] = (mlo, mhi)
    return _ANTIDIAG_CACHE[key]


def mul_wide_matmul(x, y, out_limbs: int = 2 * NLIMB):
    """Same contract as :func:`mul_wide_conv`, as a 16-bit digit outer
    product + one-hot anti-diagonal contraction.

    Used on the CPU backend (tests / golden runs): LLVM compiles the big
    straight-line convolution pathologically slowly (~45 s per fusion),
    while the matmul form compiles in seconds; the matmul intermediates
    that make this form HBM-bound on TPU are harmless in host caches.
    """
    nd = 2 * NLIMB
    out_d = 2 * out_limbs
    xd = jnp.stack(to_digits16(x), axis=-1)
    yd = jnp.stack(to_digits16(y), axis=-1)
    prod = xd[..., :, None] * yd[..., None, :]        # (..., 16, 16)
    plo = prod & 0xFFFF
    phi = prod >> 16
    mlo, mhi = _antidiag_masks(nd, out_d)
    flat_lo = plo.reshape(*x.shape[:-1], nd * nd)
    flat_hi = phi.reshape(*x.shape[:-1], nd * nd)
    acc = flat_lo @ mlo + flat_hi @ mhi               # (..., out_d)
    return _carry_sweep([acc[..., c] for c in range(out_d)],
                        out_limbs, x.shape[:-1], out_d)


def mul_wide(x, y, out_limbs: int = 2 * NLIMB):
    """256-bit multiply — always the matmul form at the XLA level.

    The unrolled convolution emits ~2.5k jaxpr eqns per call; with dozens
    of call sites per pipeline that made cold tracing+compilation take >10
    minutes on every backend.  The hot paths now run the digit convolution
    inside Pallas kernels (``ops/pallas/fieldmul.py``) where it is traced
    once per shape; the XLA fallback below only serves small/cold shapes.
    """
    return mul_wide_matmul(x, y, out_limbs)


def _pallas_eligible(x, y) -> bool:
    import jax
    if jax.default_backend() == "cpu":
        return False
    try:
        shape = jnp.broadcast_shapes(x.shape, y.shape)
    except ValueError:
        return False
    size = 1
    for d in shape[:-1]:
        size *= d
    return size >= 1024


def mul_lo(x, y):
    """Low 256 bits of x*y (mod 2^256)."""
    return mul_wide(x, y, out_limbs=NLIMB)


def mont_mul(x, y):
    """Montgomery product x*y/2^256 mod p, canonical output in [0, p).

    t = (U + m*p) >> 256 with m = (U mod 2^256) * J mod 2^256; the low 256
    bits of U + m*p vanish, so t = U_hi + (m*p)_hi + (U_lo != 0).

    Large batches on TPU route to the Pallas kernel (one fused VMEM pass);
    small/CPU shapes use the XLA digit-matmul fallback below.
    """
    if _pallas_eligible(x, y):
        from .pallas import fieldmul as _fm
        return _fm.mont_mul_aos(x, y)
    u = mul_wide(x, y)
    u_lo = u[..., :NLIMB]
    u_hi = u[..., NLIMB:]
    j = jnp.broadcast_to(jnp.asarray(J_LIMBS, _U32), u_lo.shape)
    m = mul_lo(u_lo, j)
    p = jnp.broadcast_to(jnp.asarray(P_LIMBS, _U32), u_lo.shape)
    mp = mul_wide(m, p)
    mp_hi = mp[..., NLIMB:]
    t, _ = add_cc(u_hi, mp_hi)
    carry = jnp.any(u_lo != 0, axis=-1).astype(_U32)
    # add the low-half carry (0 or 1) into t
    one = jnp.zeros_like(t).at[..., 0].set(carry)
    t, _ = add_cc(t, one)
    # t < 2p for x,y < p; 2p < 2^256 so no overflow occurred above.
    return cond_sub(t, P_LIMBS)


def mulmod(x, y):
    """Full modular multiply via Montgomery with a correction factor folded
    into neither side: mont_mul(x*y) gives x*y*R^-1, so multiply by R^2."""
    if _pallas_eligible(x, y):
        from .pallas import fieldmul as _fm
        return _fm.mulmod_aos(x, y)
    r2 = jnp.asarray(int_to_limbs(F.R * F.R % F.MODULUS), _U32)
    t = mont_mul(x, y)
    return mont_mul(t, jnp.broadcast_to(r2, t.shape))


_PM2_BITS = np.array([(F.MODULUS - 2) >> i & 1 for i in range(F.NUM_BITS)],
                     np.uint32)


def invmod(x):
    """Fermat inverse x^(p-2), rolled Montgomery square-and-multiply ladder
    (the Pallas/WGSL-equivalent of ``shader/bn254fr.wgsl.in:128``).
    invmod(0) = 0."""
    import jax
    r2 = jnp.broadcast_to(jnp.asarray(int_to_limbs(F.R * F.R % F.MODULUS),
                                      _U32), x.shape)
    xm = mont_mul(x, r2)                        # x*R
    accm = jnp.broadcast_to(jnp.asarray(int_to_limbs(F.R % F.MODULUS), _U32),
                            x.shape)            # 1 in Montgomery form
    bits = jnp.asarray(_PM2_BITS)

    def body(i, acc):
        b = bits[F.NUM_BITS - 1 - i]
        acc = mont_mul(acc, acc)
        return jnp.where(b == 1, mont_mul(acc, xm), acc)

    acc = jax.lax.fori_loop(0, F.NUM_BITS, body, accm)
    one = jnp.zeros_like(x).at[..., 0].set(1)
    return mont_mul(acc, one)                   # leave the Montgomery domain


def divmod_(x, y):
    """x / y in the field; x/0 = 0 (Fermat convention)."""
    return mulmod(x, invmod(y))


def to_np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.uint32)
