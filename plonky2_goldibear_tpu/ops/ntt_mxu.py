"""MXU-native Goldilocks NTT: radix-R levels as int8 digit-plane matmuls.

STATUS: documented experiment, NOT wired into the prover dispatch.  The
round-4 shootout (scripts/profile_ntt_r3.py, results committed in
scripts/ntt_shootout_r4.json) measured the VPU-fused kernel (ops/ntt.py)
2.3-5.1x faster at every prover-relevant shape (1x2^24, 256x2^15,
135x2^18): the 8x8 digit-plane blowup costs 64x the MACs of the useful
work plus a decode epilogue, which eats the MXU's raw advantage.  Kept as
a reference implementation of the offset-digit technique (bit-exact, see
tests/test_ops_kernels.py:test_ntt_mxu_matches_jnp).

The VPU-fused kernel in ``ops/ntt.py`` runs every radix-2 butterfly as u32
limb arithmetic on the VPU — measured ~100 G int-ops/s of mostly shuffles
and multi-word carries.  This module instead maps each radix-R NTT level onto
the MXU (the int8 systolic path, ~100 T MACs/s measured on the v5e, ~50x the
VPU's sustained integer throughput):

  - A Goldilocks value is decomposed into 8 OFFSET base-256 digits
    d_i = byte_i - 128 in [-128, 127]:  v = sum_i d_i 256^i + C  with the
    global constant C = 128 * (2^64 - 1) / 255.  No carry chain, no carry
    plane; the constant's contribution through the DFT matrix is a
    per-output-index constant vector folded into the decode epilogue.
  - A length-R DFT is y[k] = sum_i W[k,i] x[i] with the CONSTANT matrix
    W[k,i] = w_R^{ki}.  With W in 8 signed digit planes (representative w or
    w - p, always 8-digit representable) and x in 8, the product is exactly
    recovered from the 15 banded plane-convolution sums
      c_m = sum_{j+t=m} W_t @ x_j            (|c_m| < 2^24, exact in int32)
    computed as ONE s8xs8->s32 matmul against a block-banded matrix
      W_big[j*R + i, m*R + k] = W_{m-j}[i, k].
  - A VPU epilogue folds the 15 planes mod p (grouped by 32-bit limb
    alignment, one lazy 128-bit reduction per element) and adds the
    per-index correction; arithmetic stays lazy (< 2^64, non-canonical)
    across levels with a single canonicalization at transform exit.

Large transforms run as an iterative mixed-radix decimation: each level is
one matmul whose dot_general output order lands the transformed axis at the
back (no per-level transpose); the accumulated output digits come out in
reversed significance and one final multi-axis transpose restores natural
order.  All arithmetic is exact integers mod p, so the result is
bit-identical to field/fft.py:fft (tested in tests/test_ops_kernels.py).

Reference parity: this is the TPU counterpart of the reference's packed-SIMD
butterfly kernel + root-table design (field/src/fft.rs:98-160, 12-31); the
zero-prefix LDE optimization (fft.rs:168-205) becomes a row-slice of the
first level's contraction (only the nonzero coefficient rows participate).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fft as jfft
from ..field import host
from ..field import gl
from ..field.gl import GL
from . import poseidon_gl as _pk

RADIX_LOG = 6                    # radix 64: partial sums < 2^24, int32-exact
RADIX = 1 << RADIX_LOG
N_XDIG = 8                       # offset base-256 digits (data side)
N_WDIG = 8                       # constant side: w or w-p, signed digits
N_OUT = N_XDIG + N_WDIG - 1      # 15 banded output planes

P = gl.P
_U32 = jnp.uint32

# sum_i 128 * 256^i for i < 8: the offset-encoding constant
_C_OFF = 128 * ((1 << 64) - 1) // 255

# decode positivity offsets (see planes_decode): K = sum_t bias_t * 2^{8t}
_BIAS_K = sum(((1 << 27) + (1 << 26) * (1 << 32)) * (1 << (8 * t))
              for t in range(4)) % P


# --------------------------------------------------------------------------
# host-side constant construction
# --------------------------------------------------------------------------


def _try_signed_digits(v: int):
    digits = []
    for _ in range(N_WDIG):
        d = ((v + 128) % 256) - 128
        digits.append(d)
        v = (v - d) >> 8
    return digits if v == 0 else None


def _signed_digits(v: int) -> list:
    """8 signed base-256 digits of some representative of v mod p.

    The representable range of 8 signed digits is about +-0.502 * 2^64 with a
    gap near +-2^63; between v (canonical) and v - p at least one always
    decomposes.
    """
    for cand in (v if v < (1 << 63) else v - P, v, v - P):
        d = _try_signed_digits(cand)
        if d is not None:
            return d
    raise AssertionError(f"no 8-digit representative for {v}")


@functools.lru_cache(maxsize=16)
def _dft_matrix(r_log: int) -> np.ndarray:
    """W[i, k] = w_R^{ik} as python-int object array (r, r)."""
    r = 1 << r_log
    w = host.GOLDILOCKS.two_adic_generator(r_log)
    out = np.empty((r, r), dtype=object)
    for i in range(r):
        for k in range(r):
            out[i, k] = pow(w, (i * k) % r, P)
    return out


@functools.lru_cache(maxsize=16)
def _w_big_np(r_log: int) -> np.ndarray:
    """Block-banded digit matrix (N_XDIG*R, R*N_OUT) int8 for the radix-R DFT.

    W_big[j*R + i, k*N_OUT + m] = digit_{m-j}(rep(w_R^{ik}))
    so that (digits(x) as (.., N_XDIG*R)) @ W_big yields the 15 banded plane
    sums c_m at columns k*N_OUT + m — i.e. the matmul output reshapes to
    (..., R, N_OUT) with the plane axis LAST and zero data movement (the
    column order of a constant matrix is free; an m-major order would force
    either a strided plane slice or a materialized transpose per level).
    """
    r = 1 << r_log
    W = _dft_matrix(r_log)
    dig = np.zeros((N_WDIG, r, r), dtype=np.int8)
    for i in range(r):
        for k in range(r):
            for t, d in enumerate(_signed_digits(W[i, k])):
                dig[t, i, k] = d
    big = np.zeros((N_XDIG * r, r * N_OUT), dtype=np.int8)
    for j in range(N_XDIG):
        for t in range(N_WDIG):
            m = j + t
            big[j * r:(j + 1) * r, m::N_OUT] = dig[t]
    return big


@functools.lru_cache(maxsize=64)
def _corr_np(r_log: int, active: int) -> np.ndarray:
    """Decode-epilogue constant (r,) u64: C * sum_{i<active} W[i,k] - BIAS_K.

    The offset encoding under-counts every input by C; the matmul therefore
    under-counts output k by C * sum_i W[i, k] (only the ``active``
    contracted rows).  Folded with the decode positivity bias into one
    canonical constant added lazily after the 128-bit reduction.
    """
    r = 1 << r_log
    W = _dft_matrix(r_log)
    out = np.empty(r, dtype=np.uint64)
    for k in range(r):
        s = sum(W[i, k] for i in range(active)) % P
        out[k] = (_C_OFF * s - _BIAS_K) % P
    return out


# --------------------------------------------------------------------------
# device digit encode / plane decode
# --------------------------------------------------------------------------


def _digit_planes(x: GL) -> list:
    """The 8 offset-digit int8 planes of GL (...): d_i = byte_i - 128."""
    planes = []
    for limb in (x.lo, x.hi):
        for b in range(4):
            t = ((limb >> (8 * b)) & _U32(0xFF)).astype(jnp.int32)
            planes.append((t - 128).astype(jnp.int8))
    return planes


def digits_encode(x: GL) -> jnp.ndarray:
    """GL (..., n) -> int8 (..., n, N_XDIG) offset digits (any u64 input)."""
    return jnp.stack(_digit_planes(x), axis=-1)


def _lazy_add(a: GL, b: GL) -> GL:
    """(a + b) mod p as a < 2^64 value (no canonicalization): u64 add with
    the 2^64 == 2^32 - 1 wraparound fixup."""
    lo, hi, carry = gl._add64(a.lo, a.hi, b.lo, b.hi)
    adj = jnp.where(carry != 0, gl.MASK32, np.uint32(0))
    nlo = lo + adj
    c = (nlo < lo).astype(_U32)
    return GL(nlo, hi + c)


def planes_decode(c: jnp.ndarray, corr: GL) -> GL:
    """int32 planes (..., n, N_OUT) -> lazy GL (..., n): sum c_m 2^{8m} + corr
    (mod p), output < 2^64 non-canonical.

    |c_m| < 2^24.  Group m = 4q + t by 32-bit limb alignment, fold each
    group's limbs with 2^64 == 2^32 - 1 and 2^96 == -1 (mod p), one 128-bit
    lazy reduction; positivity offsets are pre-subtracted from ``corr``.
    """
    cm = [c[..., m] for m in range(N_OUT)]
    zero = jnp.zeros_like(cm[0])
    n0 = zero.astype(_U32)
    n1 = n0
    n2 = n0
    for t in range(4):
        c0 = cm[t]
        c1 = cm[4 + t]
        c2 = cm[8 + t]
        c3 = cm[12 + t] if 12 + t < N_OUT else zero
        # B_t = c0 + c1 2^32 + c2 2^64 + c3 2^96
        #     == (c0 - c2 - c3) + (c1 + c2) 2^32   (mod p)
        lo_t = (c0 - c2 - c3 + jnp.int32(1 << 27)).astype(_U32)  # < 2^28
        hi_t = (c1 + c2 + jnp.int32(1 << 26)).astype(_U32)       # < 2^27
        s = 8 * t
        if s == 0:
            a0, a1, a2 = lo_t, hi_t, jnp.zeros_like(lo_t)
        else:
            a0 = lo_t << s
            a1a = hi_t << s
            a1 = a1a + (lo_t >> (32 - s))
            a2 = (hi_t >> (32 - s)) + (a1 < a1a).astype(_U32)
        nn0 = n0 + a0
        cr0 = (nn0 < n0).astype(_U32)
        nn1a = n1 + a1
        cr1a = (nn1a < n1).astype(_U32)
        nn1 = nn1a + cr0
        cr1b = (nn1 < nn1a).astype(_U32)
        n0, n1 = nn0, nn1
        n2 = n2 + a2 + cr1a + cr1b
    val = _pk._reduce128_nc(n0, n1, n2, jnp.zeros_like(n2))
    return _lazy_add(val, corr)


# --------------------------------------------------------------------------
# one matmul NTT level
# --------------------------------------------------------------------------


def dft_matmul_axis1(x: GL, r_log: int, active: int | None = None) -> GL:
    """Exact length-R DFT contracting AXIS 1 of GL (B, R, M) -> GL (B, M, R).

    The contraction moves the transformed axis to the back as a side effect
    of dot_general's output convention — no explicit transpose pass.
    ``active``: only rows i1 < active are (possibly) nonzero (zero-prefix
    LDE), slicing the contraction to active*N_XDIG rows.  Output is lazy
    (< 2^64, correct mod p); inputs may be any u64.
    """
    r = 1 << r_log
    b, rr, m = x.lo.shape
    assert rr == r
    w_big = jnp.asarray(_w_big_np(r_log))
    if active is not None and active < r:
        xs = GL(x.lo[:, :active], x.hi[:, :active])
        w_big = jnp.concatenate(
            [w_big[j * r:j * r + active] for j in range(N_XDIG)], axis=0)
        k_in = active
    else:
        xs = x
        k_in = r
    corr = gl.from_ints(_corr_np(r_log, k_in))     # (r,) broadcasts at back
    dm = jnp.stack(_digit_planes(xs), axis=1)      # (B, 8, k_in, M)
    dm = dm.reshape(b, N_XDIG * k_in, m)
    c = jax.lax.dot_general(
        dm, w_big, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)          # (B, M, R*15)
    c = c.reshape(b, m, r, N_OUT)                  # plane axis last, free
    return planes_decode(c, corr)


def dft_matmul(x: GL, r_log: int, active: int | None = None) -> GL:
    """Exact length-R DFT along the last axis of GL (..., R), lazy output."""
    shape = x.lo.shape
    r = shape[-1]
    flat = GL(x.lo.reshape(-1, r, 1), x.hi.reshape(-1, r, 1))
    out = dft_matmul_axis1(flat, r_log, active)    # (B, 1, R)
    return GL(out.lo.reshape(shape), out.hi.reshape(shape))


# --------------------------------------------------------------------------
# iterative mixed-radix driver (no per-level transposes)
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _plan(n_log: int) -> Tuple[int, ...]:
    """Split n_log into near-equal radix logs, each <= RADIX_LOG."""
    parts = -(-n_log // RADIX_LOG)
    base = n_log // parts
    rem = n_log - base * parts
    return tuple(base + (1 if i < rem else 0) for i in range(parts))


def _twiddles(m_log: int, r: int, c: int) -> GL:
    """T[i2, k1] = w_m^{i2*k1} as GL (c, r), as TRACED device ops.

    The base power row w^{i2} comes from the lru-cached HOST table
    (jfft.powers); the r-row ladder is one on-device associative-scan cumprod
    (~r*c lazy muls, microseconds at bench sizes) inside whatever program is
    being traced.  Never build this eagerly (ensure_compile_time_eval): under
    the axon tunnel every eager primitive is a separate HTTP remote-compile
    round trip, which turned the first 2^24 NTT trace into a ~hour-long stall.
    """
    w = host.GOLDILOCKS.two_adic_generator(m_log)
    pw = jfft.powers(gl, w, c)                       # w^{i2} (host constant)
    tiled = GL(jnp.broadcast_to(pw.lo, (r - 1, c)),
               jnp.broadcast_to(pw.hi, (r - 1, c)))
    body = gl.cumprod(tiled, axis=0)                 # row k = w^{(k+1) i2}
    ones = gl.ones((1, c))
    T = GL(jnp.concatenate([ones.lo, body.lo], axis=0),
           jnp.concatenate([ones.hi, body.hi], axis=0))
    return GL(T.lo.T, T.hi.T)                        # (c, r)


def _fft_iter(x: GL, n_log: int, zero_prefix_log: int = 0) -> GL:
    """DFT along the last axis, batch (B, n); natural order in and out.

    Decimation level structure: the tensor is (B, M, K) — M the
    untransformed remainder, K the already-produced output digits.  One
    level: split M = r*c, matmul-contract r (output lands at the back),
    twiddle by w_M^{i2 k1} (lazy mul), merge k1 into K.  The final K axis
    carries the output digits in REVERSED significance (k_0 slowest), fixed
    by one multi-axis transpose at the end, where the single
    canonicalization also happens.
    """
    b = x.lo.shape[0]
    n = 1 << n_log
    plan = _plan(n_log)
    cur = x.reshape(b, n, 1)
    m_log = n_log
    k = 1
    for lvl, r_log in enumerate(plan):
        r = 1 << r_log
        m = 1 << m_log
        c = m // r
        xs = cur.reshape(b, r, c * k)
        active = None
        if lvl == 0 and zero_prefix_log:
            active = max(r >> zero_prefix_log, 1)
        y = dft_matmul_axis1(xs, r_log, active=active)       # (B, c*K, r)
        if c > 1:
            T = _twiddles(m_log, r, c)                       # (c, r)
            y4 = y.reshape(b, c, k, r)
            y4 = _pk._mul(y4, GL(T.lo[:, None], T.hi[:, None]))
            y = y4.reshape(b, c * k, r)
        cur = y.reshape(b, c, k * r)
        m_log -= r_log
        k *= r
    # cur: (B, 1, n) with K digits (k_0 ... k_{L-1}), k_0 slowest; the DFT
    # index is k = sum k_l * prod(r_{m<l}) — reverse the digit axes.
    radices = [1 << rl for rl in plan]
    cur = cur.reshape([b] + radices)
    perm = [0] + list(range(len(radices), 0, -1))
    lo = cur.lo.transpose(perm).reshape(b, n)
    hi = cur.hi.transpose(perm).reshape(b, n)
    lo, hi = gl._cond_sub_p(lo, hi, gl._geq_p(lo, hi))
    return GL(lo, hi)


def fft(x: GL, zero_prefix_log: int = 0) -> GL:
    """Forward NTT over the last axis of GL (..., N), natural order in/out.

    Bit-exact to field/fft.py:fft(gl, x).  ``zero_prefix_log`` = r declares
    only the first N/2^r coefficients nonzero (the LDE case) and prunes the
    first level's contraction accordingly.
    """
    shape = x.lo.shape
    n = shape[-1]
    n_log = host.log2_strict(n)
    flat = GL(x.lo.reshape(-1, n), x.hi.reshape(-1, n))
    out = _fft_iter(flat, n_log, zero_prefix_log)
    return GL(out.lo.reshape(shape), out.hi.reshape(shape))
