"""Pallas renormalization kernels for the MXU NTT (``ops/mxu_ntt.py``).

A level matmul leaves each output element as 64 int32 base-256 "slot"
accumulators representing V = sum_e S_e * 256^e = sum_r W'[s,r] * x[r]
with W' = W * 2^256 mod p (tables are premultiplied by the Montgomery
radix).  These kernels reduce V exactly to canonical form via REDC:

  1. signed byte carry sweep      (66 steps, exact for |S_e| < 2^28)
  2. pack to 16-bit digits        (33 digits, V < 2^516)
  3. top fold                     bits [504, 528) * (2^504 mod p)
                                  => U' < 2^504 + 2^266  <  2^256 * p
  4. Montgomery REDC              t = (U' + m*p)/2^256 < 2p, m = U'_lo*J
  5. one conditional subtract     => t = V * 2^-256 mod p, canonical

Step 4/5 reuse the proven digit-convolution helpers from ``fieldmul``
(the same code paths the butterfly kernels compile).  The *mid* variant
chains a Montgomery multiply by a per-position twiddle and re-emits the
value as packed signed base-256 digits (the next level's int8 matmul
operand); the *final* variant emits canonical u32 limbs.

Everything is written as dtype-agnostic jnp code over lists of arrays so
the exact same functions serve (a) Pallas tiles on TPU and (b) whole-
array XLA twins used on the CPU test backend (interpret-mode Pallas is
pathologically slow on CPU; see ``ops/pallas/fieldmul.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...field import bn254 as F
from . import fieldmul as fm

NLIMB = 8
SLOTS = 64
ND = 16
LANE = 128
TM = 8

_I32 = jnp.int32
_U32 = jnp.uint32

J_DIGITS = fm.J_DIGITS
P_DIGITS = fm.P_DIGITS
K504_DIGITS = [(pow(2, 504, F.MODULUS) >> (16 * i)) & 0xFFFF
               for i in range(ND)]


# ---------------------------------------------------------------------------
# Shared math over lists of same-shaped arrays (tiles or whole columns)
# ---------------------------------------------------------------------------

def _slots_to_canonical(slots):
    """64 int32 slot arrays -> 8 u32 limb arrays, t = V * 2^-256 mod p.

    Exact for 0 <= V < 2^516 and |S_e| < 2^28 (see module docstring)."""
    # 1. signed byte sweep (int32 arithmetic; exact)
    bytes_ = []
    acc = jnp.zeros_like(slots[0])
    for e in range(66):
        if e < SLOTS:
            acc = acc + slots[e]
        b = acc & 0xFF
        bytes_.append(b)
        acc = (acc - b) >> 8
    # 2. pack 16-bit digits (33)
    d = [(bytes_[2 * i] | (bytes_[2 * i + 1] << 8)).astype(_U32)
         for i in range(33)]
    # 3. fold bits [504, 528): uh < 2^12
    uh = (d[31] >> 8) | ((d[32] & 0xFF) << 8) | ((d[32] >> 8) << 16)
    d[31] = d[31] & 0xFF
    for i in range(ND):
        kd = K504_DIGITS[i]
        if kd:
            d[i] = d[i] + uh * jnp.uint32(kd)    # d_i < 2^16 + 2^12*2^16
    # normalize to clean 16-bit digits (32 digits; U' < 2^256 * p)
    digits = []
    carry = jnp.zeros_like(d[0])
    for i in range(32):
        v = d[i] + carry
        digits.append(v & 0xFFFF)
        carry = v >> 16
    # (residual carry is provably zero: U' < 2^505)
    u_lo, u_hi = digits[:ND], digits[ND:]
    # 4. REDC
    m = fm._mul_digits(u_lo, J_DIGITS, ND)
    mp = fm._mul_digits(m, P_DIGITS, 2 * ND)
    nz = u_lo[0]
    for x in u_lo[1:]:
        nz = nz | x
    carry = (nz != 0).astype(_U32)
    t = fm._pack(fm._add_digits_3(u_hi, mp[ND:], carry))
    # 5. canonical
    return fm._cond_sub_p(t)


def _canonical_to_packed(limbs):
    """8 u32 canonical limbs -> 8 u32 words of packed signed base-256
    digits (int8 bit patterns, 4 per word, little-endian)."""
    sbytes = []
    carry = jnp.zeros_like(limbs[0])
    for i in range(NLIMB):
        for j in range(4):
            b = ((limbs[i] >> (8 * j)) & 0xFF) + carry
            over = (b > 127).astype(_U32)
            sbytes.append((b - (over << 8)) & 0xFF)   # two's-complement byte
            carry = over
    # value < p => top byte <= 0x30: carry never escapes
    return [sbytes[4 * i]
            | (sbytes[4 * i + 1] << 8)
            | (sbytes[4 * i + 2] << 16)
            | (sbytes[4 * i + 3] << 24) for i in range(NLIMB)]


# ---------------------------------------------------------------------------
# Kernel bodies
# ---------------------------------------------------------------------------

def _k_renorm_final(s_ref, o_ref):
    limbs = _slots_to_canonical([s_ref[e] for e in range(SLOTS)])
    for i in range(NLIMB):
        o_ref[i] = limbs[i]


def _k_renorm_mid(s_ref, tw_ref, o_ref):
    t = _slots_to_canonical([s_ref[e] for e in range(SLOTS)])
    tw = [tw_ref[i] for i in range(NLIMB)]
    y = fm._mont_mul_t(t, fm._split16(tw))
    packed = _canonical_to_packed(y)
    for i in range(NLIMB):
        o_ref[i] = packed[i]


def _k_renorm_pack(s_ref, o_ref):
    limbs = _slots_to_canonical([s_ref[e] for e in range(SLOTS)])
    packed = _canonical_to_packed(limbs)
    for i in range(NLIMB):
        o_ref[i] = packed[i]


def _k_digitize(x_ref, o_ref):
    packed = _canonical_to_packed([x_ref[i] for i in range(NLIMB)])
    for i in range(NLIMB):
        o_ref[i] = packed[i]


# ---------------------------------------------------------------------------
# pallas_call wrappers (planar (L, X) arrays, padded to (L, T, 128) tiles)
# ---------------------------------------------------------------------------

def _spec(nplanes):
    return pl.BlockSpec((nplanes, TM, LANE), lambda t: (0, t, 0),
                        memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _build(name: str, t_tiles: int, in_planes: tuple, interpret: bool):
    kernel = globals()[f"_k_{name}"]
    fn = pl.pallas_call(
        kernel,
        grid=(t_tiles // TM,),
        in_specs=[_spec(np_) for np_ in in_planes],
        out_specs=_spec(NLIMB),
        out_shape=jax.ShapeDtypeStruct((NLIMB, t_tiles, LANE), jnp.uint32),
        interpret=interpret,
    )
    return fn if interpret else jax.jit(fn)


def _pad(x, planes, dtype):
    p = x.shape[1]
    t = -(-p // (TM * LANE)) * TM
    pad = t * LANE - p
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x.reshape(planes, t, LANE).astype(dtype), t, p


def _run(name, *plane_args):
    args, planes = [], []
    t = p = None
    for a in plane_args:
        ap, t, p = _pad(a.reshape(a.shape[0], -1), a.shape[0], a.dtype)
        args.append(ap)
        planes.append(a.shape[0])
    fn = _build(name, t, tuple(planes), fm._interpret())
    out = fn(*args)
    return out.reshape(NLIMB, -1)[:, :p]


def renorm_final(slots):
    """(64, X) int32 -> (8, X) u32 canonical limbs (V * R^-1 mod p)."""
    return _run("renorm_final", slots.astype(jnp.int32))


def renorm_mid(slots, tw):
    """(64, X) i32 slots, (8, X) u32 Montgomery twiddles ->
    (8, X) u32 packed signed digits of (V*R^-1 mod p) * tw * R^-1... —
    i.e. of mont_mul(redc(V), tw): with tw stored in Montgomery form the
    result is the plain-domain twiddled value."""
    return _run("renorm_mid", slots.astype(jnp.int32), tw)


def renorm_pack(slots):
    """(64, X) int32 -> (8, X) u32 packed signed digits of V*R^-1 mod p."""
    return _run("renorm_pack", slots.astype(jnp.int32))


def digitize(limbs):
    """(8, X) u32 canonical -> (8, X) u32 packed signed digits."""
    return _run("digitize", limbs)


# ---------------------------------------------------------------------------
# XLA twins (CPU test backend)
# ---------------------------------------------------------------------------

def renorm_final_xla(slots):
    limbs = _slots_to_canonical([slots[e] for e in range(SLOTS)])
    return jnp.stack(limbs, axis=0)


def renorm_mid_xla(slots, tw):
    t = _slots_to_canonical([slots[e] for e in range(SLOTS)])
    y = fm._mont_mul_t(t, fm._split16([tw[i] for i in range(NLIMB)]))
    return jnp.stack(_canonical_to_packed(y), axis=0)


def renorm_pack_xla(slots):
    limbs = _slots_to_canonical([slots[e] for e in range(SLOTS)])
    return jnp.stack(_canonical_to_packed(limbs), axis=0)


def digitize_xla(limbs):
    return jnp.stack(_canonical_to_packed([limbs[i] for i in range(NLIMB)]),
                     axis=0)
