"""NTT on the MXU: four-step NTT as exact int8 digit matmuls.

The reference computes NTTs butterfly-by-butterfly on GPU SIMT cores
(``src/webgpu/engine.cpp:844-974``, ``shader/kernels.wgsl.in:125-322``).
On TPU the VPU digit-convolution butterfly (``ops/pallas/fieldmul.py``)
tops out at ~650M Montgomery mults/s — its true roofline (measured,
``bench/micro_mont.py``) — while the MXU does 395 *T*ops/s of int8
multiply-accumulate (``bench/micro_mxu.py``).  This module therefore
reformulates the NTT so virtually all multiplies are int8 matmuls:

* **Four-step decomposition.**  For a size-N domain split N = R*C with
  input index i = r*C + c and output index j = q*R + s:

      A[s,c]   = sum_r  W1[s,r] * x[r*C+c],   W1[s,r] = w^(C*r*s)
      B[s,c]   = w^(s*c) * A[s,c]                       (mid twiddle)
      X[q*R+s] = sum_c  W2[q,c] * B[s,c],   W2[q,c] = w^(R*q*c)

  Steps 1 and 3 are modular matrix products with *constant* matrices;
  step 2 is elementwise with position-dependent constants, fused into
  the renormalization kernel as one Montgomery multiply.

* **Exact integer matmuls.**  Field elements travel between levels as
  32 signed base-256 digits (int8 bit patterns packed 4-per-u32; exact
  for any value < 2^255).  A modular matrix is pre-expanded into a
  block-Toeplitz int8 matrix WT[(e,s),(u,r)] = digit_{e-u}(W[s,r]*R
  mod p) — note the Montgomery radix premultiplication — so a single
  (64*S, 32*R) @ (32*R, cols) int8->int32 matmul produces, for every
  output element, 64 "slot" accumulators S_e with sum_e S_e*256^e =
  R * sum_r W[s,r]*x[r] exactly (|S_e| <= 32*R*128^2 < 2^31).

* **Renormalization** (slots -> canonical [0,p)) is Montgomery REDC in
  a Pallas kernel (``ops/pallas/mxu_renorm.py``): the premultiplied R
  cancels against REDC's R^-1, so each level needs exactly one
  reduction pass — and the mid-level twiddle multiply rides in the
  same kernel while the element is VMEM-resident.

Tables are plain numpy int8/uint32 arrays passed as runtime arguments
(same policy as ``ops/ntt.py`` — megabyte tables must not become HLO
literals).

Mathematical contract is identical to ``ops/ntt.py``:
  encode    = NTT_n(zero_extend(iNTT_k(row)))
  encode_2k = NTT_n(zero_extend(iNTT_2k(mask_row)))
Zero-extension is free: coefficients occupy i < w = n/ratio, i.e.
r < R/ratio, so the level-1 contraction simply skips the zero block
columns.  Differentially validated against ``field.golden`` and the
VPU path in ``tests/test_mxu_ntt.py``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..field import bn254 as F
from ..field.limbs import int_to_limbs

NLIMB = 8
DX = 32            # signed base-256 digits per element
SLOTS = 64         # output digit-slots per matmul (2*DX)
_I8 = jnp.int8
_I32 = jnp.int32
_U32 = jnp.uint32


class GeomSpec(tuple):
    """Static (R1, C1, R2, C2, ratio) geometry: registered as a leaf-free
    jax pytree node so jitted callers treat it as compile-time structure,
    not traced data."""

    def __new__(cls, *args):
        return super().__new__(cls, args)


jax.tree_util.register_pytree_node(
    GeomSpec, lambda g: ((), tuple(g)), lambda aux, _: GeomSpec(*aux))


def _signed_digits(value: int, count: int = DX) -> np.ndarray:
    """Exact signed base-256 digit decomposition, digits in [-128, 127]."""
    out = np.zeros(count, np.int64)
    v = value
    for i in range(count):
        d = v & 0xFF
        if d > 127:
            d -= 256
        out[i] = d
        v = (v - d) >> 8
    assert v == 0, "value does not fit in signed digit count"
    return out.astype(np.int8)


def _toeplitz_digits(w_mat: np.ndarray) -> np.ndarray:
    """(S, R) matrix of field elements -> block-Toeplitz int8
    (SLOTS*S, DX*R) with block (e, u) = digit_{e-u}(W)."""
    s_dim, r_dim = w_mat.shape
    dig = np.zeros((DX, s_dim, r_dim), np.int8)
    for s in range(s_dim):
        for r in range(r_dim):
            dig[:, s, r] = _signed_digits(int(w_mat[s, r]))
    wt = np.zeros((SLOTS * s_dim, DX * r_dim), np.int8)
    for e in range(SLOTS):
        for u in range(max(0, e - DX + 1), min(DX, e + 1)):
            wt[e * s_dim:(e + 1) * s_dim, u * r_dim:(u + 1) * r_dim] = \
                dig[e - u]
    return wt


def _split_rc(size: int) -> tuple[int, int]:
    lg = size.bit_length() - 1
    c = 1 << (lg // 2)
    return size // c, c


def _pow_table(root: int) -> tuple[list[int], int]:
    cycle = 1
    acc = root
    while acc != 1:
        acc = acc * root % F.MODULUS
        cycle += 1
    pows = [1] * cycle
    for m in range(1, cycle):
        pows[m] = pows[m - 1] * root % F.MODULUS
    return pows, cycle


def _dft_matrix(root: int, order_step: int, s_dim: int, r_dim: int,
                scale: int = 1) -> np.ndarray:
    """W[s, r] = scale * root^(order_step*r*s) mod p (object array)."""
    pows, cycle = _pow_table(pow(root, order_step, F.MODULUS))
    out = np.empty((s_dim, r_dim), object)
    for s in range(s_dim):
        for r in range(r_dim):
            out[s, r] = pows[(r * s) % cycle] * scale % F.MODULUS
    return out


def _twiddle_mont_planar(root: int, s_dim: int, c_dim: int) -> np.ndarray:
    """(8, s_dim, 1, c_dim) uint32 Montgomery-form mid twiddles
    t[s,c] = root^(s*c) * 2^256 mod p."""
    pows, cycle = _pow_table(root)
    out = np.zeros((NLIMB, s_dim, 1, c_dim), np.uint32)
    for s in range(s_dim):
        for c in range(c_dim):
            t = pows[(s * c) % cycle] * F.R % F.MODULUS
            out[:, s, 0, c] = int_to_limbs(t)
    return out


def build_codec_tables(w: int, n: int, root_w: int, root_n: int) -> dict:
    """Tables for encode: iNTT_w (four-step, 1/w folded into level 2)
    followed by NTT_n with zero-extension ratio n//w.  All matmul tables
    carry an extra factor R = 2^256 mod p, cancelled by the REDC in the
    renorm kernels.

    The middle two levels — iNTT's level 2 (contract c1) and NTT_n's
    level 1 (contract r, sliced to r < R2/ratio by zero-extension) — are
    adjacent linear maps joined by the pure index remap
    j = r*C2 + c2 = (r*g + c2//R1)*R1 + (c2 % R1) with g = C2/R1, so
    they precompose on the host into the single "wm" matrix
    WM[h][s2, c1] = sum_r W_n[s2, r] * W_inv[r*g + h, c1], stacked over
    h in [0, g).  This removes one matmul, one renormalization pass and
    one digit repack per encode."""
    r1, c1 = _split_rc(w)
    r2, c2 = _split_rc(n)
    ratio = n // w
    g = c2 // r1
    assert g >= 1 and c2 % r1 == 0
    w_inv = pow(root_w, F.MODULUS - 2, F.MODULUS)
    inv_w = pow(w, F.MODULUS - 2, F.MODULUS)
    rmod = F.R % F.MODULUS

    # true (unscaled) middle matrices
    w2t = _dft_matrix(w_inv, r1, c1, c1, scale=inv_w)      # (q1, c1)
    w3t = _dft_matrix(root_n, c2, r2, r2)[:, :r2 // ratio]  # (s2, r)
    wm = np.empty((g, r2, c1), object)
    for h in range(g):
        for s2 in range(r2):
            for c in range(c1):
                acc = 0
                for r in range(r2 // ratio):
                    acc += int(w3t[s2, r]) * int(w2t[r * g + h, c])
                wm[h, s2, c] = acc * rmod % F.MODULUS

    tabs = {
        # iNTT_w level 1: contract r over R1, W[s,r] = R * w^-(C1*r*s)
        "w1": _toeplitz_digits(_dft_matrix(w_inv, c1, r1, r1, scale=rmod)),
        "tw1": _twiddle_mont_planar(w_inv, r1, c1),
        # merged middle: contract c1; M-axis stacked over h
        "wm": np.concatenate(
            [_toeplitz_digits(wm[h]) for h in range(g)], axis=0),
        "tw3": _twiddle_mont_planar(root_n, r2, c2),
        # NTT_n level 2: contract c2
        "w4": _toeplitz_digits(_dft_matrix(root_n, r2, c2, c2, scale=rmod)),
    }
    # Device-resident once: these are 10-170 MB; as plain numpy jit
    # arguments they would re-upload on EVERY call (fatal through the
    # 39 MB/s axon tunnel, and a waste of PCIe anywhere).
    tabs = {k: jax.device_put(np.ascontiguousarray(v))
            for k, v in tabs.items()}
    tabs["geom"] = GeomSpec(r1, c1, r2, c2, ratio)
    return tabs


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------

def _unpack_digits(packed):
    """(8, ...) u32 packed signed digits -> (32, ...) int8 planes."""
    planes = []
    for i in range(NLIMB):
        w = packed[i]
        for j in range(4):
            b = ((w >> (8 * j)) & 0xFF).astype(jnp.uint8)
            planes.append(jax.lax.bitcast_convert_type(b, _I8))
    return jnp.stack(planes, axis=0)


def _level_matmul(w_toep, x_digits):
    """(SLOTS*S, DX*R) int8 @ (DX*R, cols) int8 -> (SLOTS, S, cols) i32."""
    s_dim = w_toep.shape[0] // SLOTS
    out = jax.lax.dot_general(
        w_toep, x_digits, (((1,), (0,)), ((), ())),
        preferred_element_type=_I32)
    return out.reshape(SLOTS, s_dim, x_digits.shape[-1])


def encode_rows_mxu_core(rows, tabs, n: int, use_pallas: bool):
    """(B, w, 8) u32 AoS rows -> (8, B, n) planar canonical codewords.

    Three matmul levels (iNTT L1, merged middle, NTT_n L2) with the two
    mid twiddles fused into the renormalization kernels."""
    from .pallas import mxu_renorm as mr
    r1, c1, r2, c2, ratio = tabs["geom"]
    g = c2 // r1
    b, w = rows.shape[0], rows.shape[1]
    mid_fn = mr.renorm_mid if use_pallas else mr.renorm_mid_xla
    fin_fn = mr.renorm_final if use_pallas else mr.renorm_final_xla
    dig_fn = mr.digitize if use_pallas else mr.digitize_xla

    x = jnp.moveaxis(rows, -1, 0).reshape(NLIMB, -1)    # (8, B*w)
    xp = dig_fn(x).reshape(NLIMB, b, r1, c1)            # i = r1*C1 + c1

    # iNTT level 1: contract r over R1 -> (s1, B, c1)
    xd = _unpack_digits(jnp.moveaxis(xp, 1, 2))         # (32, r1, B, c1)
    s1 = _level_matmul(jnp.asarray(tabs["w1"]),
                       xd.reshape(DX * r1, b * c1))
    tw1b = jnp.broadcast_to(jnp.asarray(tabs["tw1"]),
                            (NLIMB, r1, b, c1)).reshape(NLIMB, -1)
    b1 = mid_fn(s1.reshape(SLOTS, -1), tw1b)            # packed (8, r1*b*c1)

    # merged middle: contract c1; columns (B, s1); M stacked over h
    b1p = b1.reshape(NLIMB, r1, b, c1).transpose(0, 3, 2, 1)
    xd2 = _unpack_digits(b1p)                           # (32, c1, B, r1)
    s2 = jax.lax.dot_general(
        jnp.asarray(tabs["wm"]), xd2.reshape(DX * c1, b * r1),
        (((1,), (0,)), ((), ())), preferred_element_type=_I32) \
        .reshape(g, SLOTS, r2, b, r1)
    # element (s2, c2) with c2 = h*R1 + s1
    s2 = jnp.moveaxis(s2, 0, 3).reshape(SLOTS, r2, b, c2)
    tw3b = jnp.broadcast_to(jnp.asarray(tabs["tw3"]),
                            (NLIMB, r2, b, c2)).reshape(NLIMB, -1)
    a2 = mid_fn(s2.reshape(SLOTS, -1), tw3b)            # packed

    # NTT_n level 2: contract c2 -> output j = q*R2 + s2
    a2p = a2.reshape(NLIMB, r2, b, c2).transpose(0, 3, 2, 1)
    xd3 = _unpack_digits(a2p)                           # (32, c2, B, r2)
    s3 = _level_matmul(jnp.asarray(tabs["w4"]),
                       xd3.reshape(DX * c2, b * r2))
    v = fin_fn(s3.reshape(SLOTS, -1)).reshape(NLIMB, c2, b, r2)
    return v.transpose(0, 2, 1, 3).reshape(NLIMB, b, n)


def encode_rows_mxu(rows, tabs, n: int, use_pallas: bool):
    """AoS-out variant: (B, w, 8) -> (B, n, 8)."""
    return jnp.moveaxis(encode_rows_mxu_core(rows, tabs, n, use_pallas),
                        0, -1)
