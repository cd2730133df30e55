"""Pallas TPU kernels for BN254-Fr arithmetic — the performance core.

This is the TPU-native equivalent of the reference's hand-tuned WGSL
shaders (``shader/bn254fr.wgsl.in:101-111`` Montgomery multiply,
``shader/kernels.wgsl.in:125-322`` NTT butterflies / eltwise kernels).

Design:

* **Planar layout** ``(8, T, 128)`` uint32: limb-major, elements split as
  (sublane-group, lane).  Every 16-bit digit operation is then a full
  (tile, 128)-lane VPU op — the AoS ``(..., 8)`` ABI would waste 120 of
  128 lanes.  Wrappers transpose at the XLA boundary (one HBM pass,
  amortized over ~650 multiplies per element inside the kernel).
* **Digit-convolution Montgomery core**: 16x16 16-bit digit products in
  u32 (exact), per-antidiagonal accumulators (<= 2^21, no overflow), one
  carry sweep, m = U_lo * J mod 2^256 with J/P as *compile-time digit
  constants* (zero digits skipped), t = U_hi + (mP)_hi + (U_lo != 0).
* **One kernel signature per domain size**: butterfly operands are
  flattened to (8, B*N/2 / 128, 128) which is the *same shape at every
  stage*, so each kernel is traced and Mosaic-compiled exactly once per
  geometry — this is also what fixes the reference-beating cold-start
  (the old XLA digit convolution emitted ~2.5k jaxpr eqns per mont_mul
  per stage; tracing stage-2 alone took >10 min).

Every kernel is differentially tested against ``field.bn254`` (Python
ints) in ``tests/test_pallas.py`` (interpret mode on CPU, compiled on
TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...field import bn254 as F
from ...field.limbs import int_to_limbs

NLIMB = 8
ND = 16                      # 16-bit digits per element
LANE = 128
TM = 8                       # sublane-groups per grid step (8x128 VPU tiles)

# Module-level override for tests: None = auto (interpret on CPU).
FORCE_INTERPRET: bool | None = None


def _interpret() -> bool:
    if FORCE_INTERPRET is not None:
        return FORCE_INTERPRET
    return jax.default_backend() == "cpu"


def _digits_of(value: int) -> list[int]:
    return [(value >> (16 * i)) & 0xFFFF for i in range(ND)]


P_DIGITS = _digits_of(F.MODULUS)
J_DIGITS = _digits_of(F.MONTGOMERY_FACTOR_NEG)
R2_DIGITS = _digits_of(F.R * F.R % F.MODULUS)
P_LIMBS_I = [int(v) for v in int_to_limbs(F.MODULUS)]


# ---------------------------------------------------------------------------
# Tile-list arithmetic: an element block is a list of 8 u32 arrays (one per
# limb), each shaped (TM, 128).  Everything below is fully unrolled
# straight-line vector code for Mosaic.
# ---------------------------------------------------------------------------

def _split16(x):
    d = []
    for limb in x:
        d.append(limb & 0xFFFF)
        d.append(limb >> 16)
    return d


def _mul_acc(xd, yd, out_d):
    """Digit convolution; yd entries may be Python ints (constants)."""
    acc = [None] * out_d
    for u in range(len(xd)):
        for v in range(len(yd)):
            c = u + v
            if c >= out_d:
                continue
            yv = yd[v]
            if isinstance(yv, int):
                if yv == 0:
                    continue
                p = xd[u] * jnp.uint32(yv)
            else:
                p = xd[u] * yv
            lo = p & 0xFFFF
            acc[c] = lo if acc[c] is None else acc[c] + lo
            if c + 1 < out_d:
                hi = p >> 16
                acc[c + 1] = hi if acc[c + 1] is None else acc[c + 1] + hi
    return acc


def _sweep_digits(acc, out_d):
    """Normalize antidiagonal accumulators to 16-bit digits (drop the final
    carry — callers only ever keep mod 2^(16*out_d))."""
    digits = []
    carry = None
    for c in range(out_d):
        v = acc[c] if acc[c] is not None else None
        if v is None:
            v = carry if carry is not None else jnp.uint32(0)
        elif carry is not None:
            v = v + carry
        digits.append(v & 0xFFFF)
        carry = v >> 16
    return digits


def _mul_digits(xd, yd, out_d):
    return _sweep_digits(_mul_acc(xd, yd, out_d), out_d)


def _pack(digits):
    return [digits[2 * i] | (digits[2 * i + 1] << 16) for i in range(NLIMB)]


def _add_digits_3(a, b, cin):
    """16-digit a + b + cin (cin a u32 0/1 tile); no carry out by caller
    contract (result < 2p < 2^256)."""
    out = []
    carry = cin
    for i in range(ND):
        v = a[i] + b[i] + carry
        out.append(v & 0xFFFF)
        carry = v >> 16
    return out


def _add_cc(x, y):
    outs = []
    carry = None
    for i in range(NLIMB):
        a, b = x[i], y[i]
        t = a + b
        c1 = (t < a).astype(jnp.uint32)
        if carry is None:
            s, cc = t, c1
        else:
            s = t + carry
            cc = c1 | (s < t).astype(jnp.uint32)
        outs.append(s)
        carry = cc
    return outs, carry


def _sub_cc(x, y):
    outs = []
    borrow = None
    for i in range(NLIMB):
        a, b = x[i], y[i]
        t = a - b
        c1 = (a < b).astype(jnp.uint32)
        if borrow is None:
            s, bb = t, c1
        else:
            s = t - borrow
            bb = c1 | (t < borrow).astype(jnp.uint32)
        outs.append(s)
        borrow = bb
    return outs, borrow


def _geq_const(x, limbs):
    gt = None
    eq = None
    for i in range(NLIMB - 1, -1, -1):
        b = jnp.uint32(limbs[i])
        gi = x[i] > b
        ei = x[i] == b
        if gt is None:
            gt, eq = gi, ei
        else:
            gt = gt | (eq & gi)
            eq = eq & ei
    return gt | eq


def _cond_sub_p(x):
    p = [jnp.uint32(v) for v in P_LIMBS_I]
    d, _ = _sub_cc(x, [jnp.broadcast_to(v, x[0].shape) for v in p])
    take = _geq_const(x, P_LIMBS_I)
    return [jnp.where(take, d[i], x[i]) for i in range(NLIMB)]


def _addmod_t(x, y):
    s, _ = _add_cc(x, y)          # inputs < p so no carry out of 256 bits
    return _cond_sub_p(s)


def _submod_t(x, y):
    d, borrow = _sub_cc(x, y)
    p = [jnp.broadcast_to(jnp.uint32(v), x[0].shape) for v in P_LIMBS_I]
    fix, _ = _add_cc(d, p)
    bz = borrow > 0
    return [jnp.where(bz, fix[i], d[i]) for i in range(NLIMB)]


def _mont_mul_t(x, yd):
    """Montgomery product; `yd` is a digit list (tiles or int constants)."""
    xd = _split16(x)
    ud = _mul_digits(xd, yd, 2 * ND)
    u_lo, u_hi = ud[:ND], ud[ND:]
    m = _mul_digits(u_lo, J_DIGITS, ND)
    mp = _mul_digits(m, P_DIGITS, 2 * ND)
    nz = u_lo[0]
    for d in u_lo[1:]:
        nz = nz | d
    carry = (nz != 0).astype(jnp.uint32)
    t = _pack(_add_digits_3(u_hi, mp[ND:], carry))
    return _cond_sub_p(t)


# ---------------------------------------------------------------------------
# Kernel bodies
# ---------------------------------------------------------------------------

def _read(ref):
    return [ref[i] for i in range(NLIMB)]


def _write(ref, tiles):
    for i in range(NLIMB):
        ref[i] = tiles[i]


def _k_butterfly_dit(a_ref, b_ref, w_ref, s_ref, d_ref):
    a = _read(a_ref)
    wb = _mont_mul_t(_read(b_ref), _split16(_read(w_ref)))
    _write(s_ref, _addmod_t(a, wb))
    _write(d_ref, _submod_t(a, wb))


def _k_butterfly_dif(a_ref, b_ref, w_ref, s_ref, d_ref):
    a = _read(a_ref)
    b = _read(b_ref)
    _write(s_ref, _addmod_t(a, b))
    _write(d_ref, _mont_mul_t(_submod_t(a, b), _split16(_read(w_ref))))


def _k_addmod(x_ref, y_ref, o_ref):
    _write(o_ref, _addmod_t(_read(x_ref), _read(y_ref)))


def _k_submod(x_ref, y_ref, o_ref):
    _write(o_ref, _submod_t(_read(x_ref), _read(y_ref)))


def _k_mont_mul(x_ref, y_ref, o_ref):
    _write(o_ref, _mont_mul_t(_read(x_ref), _split16(_read(y_ref))))


def _k_mulmod(x_ref, y_ref, o_ref):
    t = _mont_mul_t(_read(x_ref), _split16(_read(y_ref)))
    _write(o_ref, _mont_mul_t(t, R2_DIGITS))


def _k_mont_scalar(x_ref, s_ref, o_ref):
    sd = []
    for i in range(NLIMB):
        v = s_ref[i, 0]
        sd.append(v & 0xFFFF)
        sd.append(v >> 16)
    _write(o_ref, _mont_mul_t(_read(x_ref), sd))


def _k_mulmod_fma(acc_ref, x_ref, y_ref, o_ref):
    """acc + x*y (full modular product) — stage-2 check accumulator."""
    t = _mont_mul_t(_read(x_ref), _split16(_read(y_ref)))
    t = _mont_mul_t(t, R2_DIGITS)
    _write(o_ref, _addmod_t(_read(acc_ref), t))


# ---------------------------------------------------------------------------
# pallas_call wrappers (cached per shape)
# ---------------------------------------------------------------------------

def _vspec():
    return pl.BlockSpec((NLIMB, TM, LANE), lambda t: (0, t, 0),
                        memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _build(kernel_name: str, t_tiles: int, n_outs: int, n_ins: int,
           scalar_in: bool, interpret: bool):
    kernel = globals()[f"_k_{kernel_name}"]
    shape = (NLIMB, t_tiles, LANE)
    in_specs = [_vspec() for _ in range(n_ins)]
    if scalar_in:
        in_specs.append(pl.BlockSpec((NLIMB, 1), lambda t: (0, 0),
                                     memory_space=pltpu.SMEM))
    out_shape = [jax.ShapeDtypeStruct(shape, jnp.uint32)
                 for _ in range(n_outs)]
    fn = pl.pallas_call(
        kernel,
        grid=(t_tiles // TM,),
        in_specs=in_specs,
        out_specs=[_vspec() for _ in range(n_outs)],
        out_shape=out_shape,
        interpret=interpret,
    )
    if interpret:
        # Interpret mode (CPU tests) must run eagerly: jitting it compiles
        # the ~3k-eqn digit convolution through XLA, which takes minutes
        # per kernel on CPU — the exact pathology the Pallas path avoids.
        return fn
    # jit so the ~3k-eqn kernel body is traced once per shape even when the
    # same kernel appears at many call sites inside an outer jit (all NTT
    # stages of a domain share one signature — see module docstring).
    return jax.jit(fn)


def _pad_tiles(x):
    """(8, P) -> (8, T, 128) with T a multiple of TM."""
    p = x.shape[1]
    t = -(-p // (TM * LANE)) * TM
    pad = t * LANE - p
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x.reshape(NLIMB, t, LANE), t, pad


def _run(name, n_outs, *planar_args, scalar=None):
    flat = [a.reshape(NLIMB, -1) for a in planar_args]
    p = flat[0].shape[1]
    padded = [_pad_tiles(a)[0] for a in flat]
    t = padded[0].shape[1]
    args = list(padded)
    if scalar is not None:
        args.append(scalar.reshape(NLIMB, 1))
    fn = _build(name, t, n_outs, len(planar_args), scalar is not None,
                _interpret())
    outs = fn(*args)
    outs = [o.reshape(NLIMB, -1)[:, :p] for o in outs]
    return outs if n_outs > 1 else outs[0]


# Planar API: all arrays (8, ...) with identical trailing shapes ----------

def butterfly_dit(a, b, w):
    s, d = _run("butterfly_dit", 2, a, b, w)
    return s.reshape(a.shape), d.reshape(a.shape)


def butterfly_dif(a, b, w):
    s, d = _run("butterfly_dif", 2, a, b, w)
    return s.reshape(a.shape), d.reshape(a.shape)


def addmod_planar(x, y):
    return _run("addmod", 1, x, y).reshape(x.shape)


def submod_planar(x, y):
    return _run("submod", 1, x, y).reshape(x.shape)


def mont_mul_planar(x, y):
    return _run("mont_mul", 1, x, y).reshape(x.shape)


def mulmod_planar(x, y):
    return _run("mulmod", 1, x, y).reshape(x.shape)


def mont_mul_scalar_planar(x, scalar_limbs):
    return _run("mont_scalar", 1, x,
                scalar=jnp.asarray(scalar_limbs, jnp.uint32)).reshape(x.shape)


def mulmod_fma_planar(acc, x, y):
    return _run("mulmod_fma", 1, acc, x, y).reshape(x.shape)


# AoS wrappers: (..., 8) <-> planar ---------------------------------------

def _to_planar(x):
    return jnp.moveaxis(x, -1, 0).reshape(NLIMB, -1)


def _from_planar(x, shape):
    return jnp.moveaxis(x.reshape((NLIMB,) + shape[:-1]), 0, -1)


def mont_mul_aos(x, y):
    shape = jnp.broadcast_shapes(x.shape, y.shape)
    x = jnp.broadcast_to(x, shape)
    y = jnp.broadcast_to(y, shape)
    return _from_planar(mont_mul_planar(_to_planar(x), _to_planar(y)), shape)


def mulmod_aos(x, y):
    shape = jnp.broadcast_shapes(x.shape, y.shape)
    x = jnp.broadcast_to(x, shape)
    y = jnp.broadcast_to(y, shape)
    return _from_planar(mulmod_planar(_to_planar(x), _to_planar(y)), shape)
