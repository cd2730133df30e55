"""Batched NTT / Reed-Solomon codec over BN254-Fr in JAX.

TPU-first divergences from the reference (``engine.cpp:755-797``):

* The reference encodes one row per GPU dispatch chain; here rows are
  batched as a (B, N, 8) tensor and every butterfly stage is one fused
  vector op over the whole batch.
* **No bit-reversal permutations and no gathers at all.**  The inverse
  message-domain NTT runs as decimation-in-frequency (natural input →
  bit-reversed coefficients); zero-extension from k to n coefficients is a
  stride-`n/k` interleave in the bit-reversed domain, whose first
  log2(n/k) DIT stages degenerate to pure broadcasts — i.e. a single
  ``jnp.repeat``; the forward n-domain NTT then runs as
  decimation-in-time from bit-reversed input to **natural-order** output.
  Every stage is a static reshape + elementwise butterfly, which XLA maps
  onto contiguous VPU tiles (a gather per stage was the old design's
  second bottleneck after the wide-mul intermediates).

Twiddles are precomputed per stage in Montgomery form (w * 2^256 mod p)
exactly like ``ntt_radix2.hpp:87-104``, so butterflies do one mont_mul and
values stay in the plain domain; outputs are canonical in [0, p).

All precomputed tables are *runtime arguments* to the jitted functions, not
closure constants: embedding megabytes of twiddles as HLO literals bloats
every executable and defeats the persistent compilation cache.

Mathematical contract (validated against ``field.golden``):
  forward_N: X[j] = sum_i x[i] w_N^(i*j);  inverse_N = 1/N sum w^(-i*j)
  encode    = NTT_n(zero_extend(iNTT_k(row)))
  encode_2k = NTT_n(zero_extend(iNTT_2k(mask_row)))
  decode    = NTT_k(fold_k(iNTT_n(codeword))), coefficients [k, n) passed
              through for the degree check (``kernels.wgsl.in:104-116``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..field import bn254 as F
from ..field.limbs import int_to_limbs, ints_to_limbs
from . import fieldops as fo

NLIMB = 8


def _bitrev(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    out = np.arange(n)
    rev = np.zeros(n, np.int64)
    for _ in range(bits):
        rev = (rev << 1) | (out & 1)
        out >>= 1
    return rev


def build_domain_tables(n: int, w: int):
    """Per-stage butterfly twiddles for one domain, as a dict pytree.

    Stage s (1-based, length L = 2^s) pairs (g*L + j, g*L + j + L/2) and
    multiplies by w_L^j = w^(j*n/L); ``fwd``/``inv`` are tuples of
    (2^(s-1), 8) uint32 arrays in Montgomery form, shared by the DIT
    (bit-reversed → natural) and DIF (natural → bit-reversed) stage loops.
    """
    assert pow(w, n, F.MODULUS) == 1 and pow(w, n // 2, F.MODULUS) != 1
    log2n = n.bit_length() - 1
    w_inv = pow(w, F.MODULUS - 2, F.MODULUS)
    n_inv = pow(n, F.MODULUS - 2, F.MODULUS)

    def stage_tws(root):
        stages = []
        for s in range(1, log2n + 1):
            half = 1 << (s - 1)
            wl = pow(root, n >> s, F.MODULUS)
            tw = [1] * half
            for j in range(1, half):
                tw[j] = tw[j - 1] * wl % F.MODULUS
            stages.append(jnp.asarray(
                ints_to_limbs([t * F.R % F.MODULUS for t in tw])))
        return tuple(stages)

    fwd = stage_tws(w)
    inv = stage_tws(w_inv)

    def cg_tws(root):
        """Constant-geometry stage twiddles, stacked (log2n, n/2, 8):
        stage t uses w^texp(t, j) with texp = j with its low (log2n-1-t)
        bits cleared — derived by conjugating the classic in-place DIT
        with the read-adjacent/write-halves dataflow (identity output
        permutation; validated against the golden model)."""
        h = n // 2
        out = np.empty((log2n, h, NLIMB), np.uint32)
        for t in range(log2n):
            s = log2n - 1 - t
            # stage-t twiddle vector = each distinct power repeated 2^s
            # times: tw[j] = root^((j >> s) << s)
            step = pow(root, 1 << s, F.MODULUS)
            vals = [0] * (1 << t)
            acc = F.R % F.MODULUS                  # 1 in Montgomery form
            for i in range(1 << t):
                vals[i] = acc
                acc = acc * step % F.MODULUS
            out[t] = np.repeat(ints_to_limbs(vals), 1 << s, axis=0)
        return jnp.asarray(out)

    return {
        "rev": jnp.asarray(_bitrev(n)),
        "fwd": fwd,
        "inv": inv,
        # planar (8, half) twiddle views for the Pallas butterfly kernels
        "fwd_pl": tuple(t.T for t in fwd),
        "inv_pl": tuple(t.T for t in inv),
        # constant-geometry (scan) twiddles, DIT stage order t=0..log2n-1
        "cg_fwd": cg_tws(w),
        "cg_inv": cg_tws(w_inv),
        "n_inv_mont": jnp.asarray(int_to_limbs(n_inv * F.R % F.MODULUS)),
    }


def _dit_stages(x, tws, first_stage: int = 1):
    """DIT butterflies (bit-reversed input → natural output), stages
    ``first_stage``..log2(N); each stage is reshape + a' = a + w*b,
    b' = a - w*b."""
    b_, n = x.shape[0], x.shape[1]
    log2n = n.bit_length() - 1
    for s in range(first_stage, log2n + 1):
        length = 1 << s
        half = length >> 1
        v = x.reshape(b_, n // length, 2, half, NLIMB)
        a, b = v[:, :, 0], v[:, :, 1]
        wb = fo.mont_mul(b, tws[s - 1][None, None])
        x = jnp.stack([fo.addmod(a, wb), fo.submod(a, wb)], axis=2) \
            .reshape(b_, n, NLIMB)
    return x


def _dif_stages(x, tws):
    """DIF butterflies (natural input → bit-reversed output), stages
    log2(N)..1; a' = a + b, b' = (a - b) * w."""
    b_, n = x.shape[0], x.shape[1]
    log2n = n.bit_length() - 1
    for s in range(log2n, 0, -1):
        length = 1 << s
        half = length >> 1
        v = x.reshape(b_, n // length, 2, half, NLIMB)
        a, b = v[:, :, 0], v[:, :, 1]
        s_ = fo.addmod(a, b)
        d_ = fo.mont_mul(fo.submod(a, b), tws[s - 1][None, None])
        x = jnp.stack([s_, d_], axis=2).reshape(b_, n, NLIMB)
    return x


def ntt_forward(x, dom):
    """(B, N, 8) -> (B, N, 8), natural order in/out (golden contract)."""
    rev = dom["rev"]
    return _dit_stages(jnp.take(x, rev, axis=1), dom["fwd"])


def ntt_inverse(x, dom):
    y = _dif_stages(x, dom["inv"])
    y = jnp.take(y, dom["rev"], axis=1)
    return fo.mont_mul(y, dom["n_inv_mont"][None, None, :])


# ---- planar (Pallas) stage loops ----------------------------------------
#
# Same math as the AoS loops above, but data flows limb-planar (8, B, N)
# and every butterfly is one Pallas kernel call on (8, B*N/2) operands —
# the same shape at every stage of a domain, so the ~3k-op Montgomery
# digit convolution is traced and Mosaic-compiled exactly once per
# geometry.  Twiddles broadcast from their (8, half) planar views; the
# reshapes around each kernel are static and fuse away in XLA.

def _planar_use() -> bool:
    import jax
    if USE_PLANAR is not None:
        return USE_PLANAR
    return jax.default_backend() != "cpu"


USE_PLANAR: bool | None = None   # None = auto (Pallas on TPU)
USE_MXU: bool | None = None      # None = auto (int8-matmul NTT on TPU)


def _mxu_use() -> bool:
    import jax
    if USE_MXU is not None:
        return USE_MXU
    return jax.default_backend() != "cpu"


def _tw_planar(tw_pl, b_, g, h):
    return jnp.broadcast_to(tw_pl[:, None, None, :],
                            (NLIMB, b_, g, h)).reshape(NLIMB, -1)


def _dit_stages_planar(x, tws_pl, first_stage: int = 1):
    from .pallas import fieldmul as fm
    nl, b_, n = x.shape
    log2n = n.bit_length() - 1
    for s in range(first_stage, log2n + 1):
        length = 1 << s
        half = length >> 1
        g = n // length
        v = x.reshape(nl, b_, g, 2, half)
        a = v[:, :, :, 0].reshape(nl, -1)
        b = v[:, :, :, 1].reshape(nl, -1)
        w = _tw_planar(tws_pl[s - 1], b_, g, half)
        s_, d_ = fm.butterfly_dit(a, b, w)
        x = jnp.stack([s_.reshape(nl, b_, g, half),
                       d_.reshape(nl, b_, g, half)], axis=3) \
            .reshape(nl, b_, n)
    return x


def _dif_stages_planar(x, tws_pl):
    from .pallas import fieldmul as fm
    nl, b_, n = x.shape
    log2n = n.bit_length() - 1
    for s in range(log2n, 0, -1):
        length = 1 << s
        half = length >> 1
        g = n // length
        v = x.reshape(nl, b_, g, 2, half)
        a = v[:, :, :, 0].reshape(nl, -1)
        b = v[:, :, :, 1].reshape(nl, -1)
        w = _tw_planar(tws_pl[s - 1], b_, g, half)
        s_, d_ = fm.butterfly_dif(a, b, w)
        x = jnp.stack([s_.reshape(nl, b_, g, half),
                       d_.reshape(nl, b_, g, half)], axis=3) \
            .reshape(nl, b_, n)
    return x


def encode_rows_planar(rows, dom_msg, dom_n, n: int):
    """Planar-pipeline twin of :func:`encode_rows` (same contract)."""
    from .pallas import fieldmul as fm
    w = rows.shape[1]
    x = jnp.moveaxis(rows, -1, 0)                  # (8, B, w)
    x = _dif_stages_planar(x, dom_msg["inv_pl"])
    x = fm.mont_mul_scalar_planar(
        x.reshape(NLIMB, -1), dom_msg["n_inv_mont"]).reshape(x.shape)
    ratio = n // w
    x = jnp.repeat(x, ratio, axis=2)
    x = _dit_stages_planar(x, dom_n["fwd_pl"],
                           first_stage=ratio.bit_length())
    return jnp.moveaxis(x, 0, -1)                  # (B, n, 8)


# ---- constant-geometry (Pease) scan loops --------------------------------
#
# Every stage is the SAME fixed-shape body (read adjacent pairs, write
# halves for DIT; the transposed flow for DIF), so the whole stage loop is
# one ``lax.scan`` over stacked twiddles — the butterfly body is traced and
# compiled exactly once per geometry instead of log2(n) times.  This is
# what makes cold compiles take seconds instead of minutes (the unrolled
# loops below are kept as differential references).
#
#   DIT stage t:  a = x[0::2]; b = x[1::2]; wb = tw*b
#                 x = [a + wb ; a - wb]            (halves)
#   DIF stage t:  a = x[:h];   b = x[h:]
#                 x = interleave(a + b, (a - b)*tw)
#
# DIT consumes bit-reversed input and produces NATURAL output with no
# final permutation; DIF is its transpose (natural -> bit-reversed).
# Zero-extension k -> n in this flow is ``tile`` (concatenated copies,
# NOT interleaved repeat), after which the first log2(n/k) DIT stages
# are identities and are skipped.  Validated against ``field.golden``.

def _cg_dit_scan(x, tws, first_stage: int = 0):
    """x (B, N, 8) bit-reversed -> natural; tws (log2N, N/2, 8)."""
    import jax
    b_, n = x.shape[0], x.shape[1]
    h = n // 2

    def body(x, tw):
        v = x.reshape(b_, h, 2, NLIMB)
        a, b = v[:, :, 0], v[:, :, 1]
        wb = fo.mont_mul(b, tw[None])
        return (jnp.concatenate([fo.addmod(a, wb), fo.submod(a, wb)],
                                axis=1), None)

    x, _ = jax.lax.scan(body, x, tws[first_stage:])
    return x


def _cg_dif_scan(x, tws):
    """x (B, N, 8) natural -> bit-reversed; consumes tws back-to-front."""
    import jax
    b_, n = x.shape[0], x.shape[1]
    h = n // 2

    def body(x, tw):
        a, b = x[:, :h], x[:, h:]
        s = fo.addmod(a, b)
        d = fo.mont_mul(fo.submod(a, b), tw[None])
        return (jnp.stack([s, d], axis=2).reshape(b_, n, NLIMB), None)

    x, _ = jax.lax.scan(body, x, tws, reverse=True)
    return x


def encode_rows_cg(rows, dom_msg, dom_n, n: int):
    """Constant-geometry encode: iNTT_w (DIF scan), scale, zero-extend
    (tile), NTT_n (DIT scan) — same contract as :func:`_encode_rows_aos`."""
    w = rows.shape[1]
    x = _cg_dif_scan(rows, dom_msg["cg_inv"])
    x = fo.mont_mul(x, dom_msg["n_inv_mont"][None, None])
    ratio = n // w
    x = jnp.tile(x, (1, ratio, 1))
    return _cg_dit_scan(x, dom_n["cg_fwd"],
                        first_stage=ratio.bit_length() - 1)


def decode_rows_cg(codewords, dom_k, dom_n, k: int):
    """Constant-geometry decode — same contract as :func:`decode_rows`."""
    b_, n = codewords.shape[0], codewords.shape[1]
    assert n == 4 * k
    coeffs = _cg_dif_scan(codewords, dom_n["cg_inv"])
    coeffs = fo.mont_mul(coeffs, dom_n["n_inv_mont"][None, None])
    v = coeffs.reshape(b_, k, 4, NLIMB)
    folded = fo.addmod(v[:, :, 0], v[:, :, 2])
    evals = _cg_dit_scan(folded, dom_k["cg_fwd"])
    coeffs_nat = jnp.take(coeffs, dom_n["rev"], axis=1)
    return jnp.concatenate([evals, coeffs_nat[:, k:]], axis=1)


def _cg_dit_scan_planar(x, tws, first_stage: int = 0):
    """Planar twin: x (8, B, N); tws (log2N, N/2, 8)."""
    import jax
    from .pallas import fieldmul as fm
    nl, b_, n = x.shape
    h = n // 2

    def body(x, tw):
        v = x.reshape(nl, b_, h, 2)
        a = v[:, :, :, 0].reshape(nl, -1)
        b = v[:, :, :, 1].reshape(nl, -1)
        w = jnp.broadcast_to(tw.T[:, None, :], (nl, b_, h)).reshape(nl, -1)
        s_, d_ = fm.butterfly_dit(a, b, w)
        return (jnp.concatenate([s_.reshape(nl, b_, h),
                                 d_.reshape(nl, b_, h)], axis=2), None)

    x, _ = jax.lax.scan(body, x, tws[first_stage:])
    return x


def _cg_dif_scan_planar(x, tws):
    import jax
    from .pallas import fieldmul as fm
    nl, b_, n = x.shape
    h = n // 2

    def body(x, tw):
        a = x[:, :, :h].reshape(nl, -1)
        b = x[:, :, h:].reshape(nl, -1)
        w = jnp.broadcast_to(tw.T[:, None, :], (nl, b_, h)).reshape(nl, -1)
        s_, d_ = fm.butterfly_dif(a, b, w)
        return (jnp.stack([s_.reshape(nl, b_, h),
                           d_.reshape(nl, b_, h)], axis=3)
                .reshape(nl, b_, n), None)

    x, _ = jax.lax.scan(body, x, tws, reverse=True)
    return x


def encode_rows_cg_planar_core(rows, dom_msg, dom_n, n: int):
    """Planar constant-geometry encode core: AoS rows in, PLANAR
    (8, B, n) codewords out — callers that consume planar data (the
    stage-1 SHA absorb reads blocks as limb-major slices) avoid the
    33 MB/batch relayout of a final moveaxis."""
    from .pallas import fieldmul as fm
    w = rows.shape[1]
    x = jnp.moveaxis(rows, -1, 0)                  # (8, B, w)
    x = _cg_dif_scan_planar(x, dom_msg["cg_inv"])
    x = fm.mont_mul_scalar_planar(
        x.reshape(NLIMB, -1), dom_msg["n_inv_mont"]).reshape(x.shape)
    ratio = n // w
    x = jnp.tile(x, (1, 1, ratio))
    return _cg_dit_scan_planar(x, dom_n["cg_fwd"],
                               first_stage=ratio.bit_length() - 1)


def encode_rows_cg_planar(rows, dom_msg, dom_n, n: int):
    """Planar constant-geometry encode (Pallas butterflies in a scan)."""
    return jnp.moveaxis(
        encode_rows_cg_planar_core(rows, dom_msg, dom_n, n), 0, -1)


def decode_rows_cg_planar(codewords, dom_k, dom_n, k: int):
    """Planar constant-geometry decode."""
    from .pallas import fieldmul as fm
    b_, n = codewords.shape[0], codewords.shape[1]
    assert n == 4 * k
    x = jnp.moveaxis(codewords, -1, 0)             # (8, B, n)
    x = _cg_dif_scan_planar(x, dom_n["cg_inv"])
    x = fm.mont_mul_scalar_planar(
        x.reshape(NLIMB, -1), dom_n["n_inv_mont"]).reshape(x.shape)
    v = x.reshape(NLIMB, b_, k, 4)
    folded = fm.addmod_planar(v[..., 0].reshape(NLIMB, -1),
                              v[..., 2].reshape(NLIMB, -1)) \
        .reshape(NLIMB, b_, k)
    evals = _cg_dit_scan_planar(folded, dom_k["cg_fwd"])
    coeffs = jnp.moveaxis(x, 0, -1)                # (B, n, 8) bit-reversed
    coeffs_nat = jnp.take(coeffs, dom_n["rev"], axis=1)
    return jnp.concatenate([jnp.moveaxis(evals, 0, -1),
                            coeffs_nat[:, k:]], axis=1)


# ---- codec functions (tables as arguments; jit at call sites) -----------

def encode_rows(rows, dom_msg, dom_n, n: int, use_planar: bool | None = None):
    """`use_planar` must be a static (trace-time) Python bool; callers that
    jit this function make it part of the jit cache key (static argnum) so
    toggling :data:`USE_PLANAR` reliably switches paths."""
    if use_planar is None:
        use_planar = _planar_use()
    if use_planar:
        return encode_rows_cg_planar(rows, dom_msg, dom_n, n)
    return encode_rows_cg(rows, dom_msg, dom_n, n)


def _encode_rows_aos(rows, dom_msg, dom_n, n: int):
    """(B, w, 8) message-domain rows -> (B, n, 8) codewords.

    iNTT as DIF (bit-reversed coefficients), zero-extension as a repeat
    (the first log2(n/w) DIT stages on a stride-interleaved input copy
    a to both outputs since b = 0), then DIT to natural order.
    """
    w = rows.shape[1]
    coeffs = _dif_stages(rows, dom_msg["inv"])
    coeffs = fo.mont_mul(coeffs, dom_msg["n_inv_mont"][None, None])
    ratio = n // w
    x = jnp.repeat(coeffs, ratio, axis=1)
    return _dit_stages(x, dom_n["fwd"],
                       first_stage=ratio.bit_length())  # log2(ratio) + 1


def decode_rows(codewords, dom_k, dom_n, k: int,
                use_planar: bool | None = None):
    """Dispatcher: constant-geometry decode, planar (Pallas) or AoS."""
    if use_planar is None:
        use_planar = _planar_use()
    if use_planar:
        return decode_rows_cg_planar(codewords, dom_k, dom_n, k)
    return decode_rows_cg(codewords, dom_k, dom_n, k)


def _decode_rows_aos(codewords, dom_k, dom_n, k: int):
    """(B, n, 8) -> (B, n, 8): [0,k) k-domain evaluations, [k,n) raw
    coefficients (degree check).

    In the bit-reversed n-domain, natural coefficients {c, c+k, c+2k, c+3k}
    (c < k, n = 4k) sit at consecutive positions {4t, 4t+2, 4t+1, 4t+3}
    with t = bitrev_k(c), so the fold c[i] += c[i+k] is an elementwise add
    of interleave lanes 0 and 2 and lands directly in bit-reversed k-order,
    ready for the DIT k-NTT.
    """
    b_, n = codewords.shape[0], codewords.shape[1]
    assert n == 4 * k
    coeffs = _dif_stages(codewords, dom_n["inv"])
    coeffs = fo.mont_mul(coeffs, dom_n["n_inv_mont"][None, None])
    v = coeffs.reshape(b_, k, 4, NLIMB)
    folded = fo.addmod(v[:, :, 0], v[:, :, 2])
    evals = _dit_stages(folded, dom_k["fwd"])
    coeffs_nat = jnp.take(coeffs, dom_n["rev"], axis=1)
    return jnp.concatenate([evals, coeffs_nat[:, k:]], axis=1)


class RSCodec:
    """Encode/decode between k-rows (or 2k mask rows) and n-codewords."""

    def __init__(self, k: int, n: int):
        assert n == 4 * k
        import jax
        w_k, w_2k, w_n = F.generate_omegas(k, n)
        self.k, self.n = k, n
        self._omegas = (w_k, w_2k, w_n)
        self.dom_k = build_domain_tables(k, w_k)
        self.dom_2k = build_domain_tables(2 * k, w_2k)
        self.dom_n = build_domain_tables(n, w_n)
        self._encode = jax.jit(encode_rows, static_argnums=(3, 4))
        self._decode = jax.jit(decode_rows, static_argnums=(3, 4))
        self._mxu_tabs = None

    _MXU_TAB_CACHE: dict = {}

    @property
    def mxu_tabs(self):
        """int8-matmul NTT tables for the k->n encode, built lazily and
        cached per geometry across RSCodec instances (they are ~150 MB
        device-resident and take ~10 s of host precompute — rebuilding
        them per prove() call would dominate small proofs)."""
        if self._mxu_tabs is None:
            key = (self.k, self.n)
            if key not in RSCodec._MXU_TAB_CACHE:
                from .mxu_ntt import build_codec_tables
                RSCodec._MXU_TAB_CACHE[key] = build_codec_tables(
                    self.k, self.n, self._omegas[0], self._omegas[2])
            self._mxu_tabs = RSCodec._MXU_TAB_CACHE[key]
        return self._mxu_tabs

    def encode(self, rows):
        return self._encode(rows, self.dom_k, self.dom_n, self.n,
                            _planar_use())

    def encode_2k(self, rows):
        return self._encode(rows, self.dom_2k, self.dom_n, self.n,
                            _planar_use())

    def decode(self, codewords):
        return self._decode(codewords, self.dom_k, self.dom_n, self.k,
                            _planar_use())
