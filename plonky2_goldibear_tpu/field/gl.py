"""Device Goldilocks arithmetic: p = 2^64 - 2^32 + 1 on 32-bit TPU lanes.

TPUs have no native 64-bit integer datapath, so a Goldilocks element is a pair
of uint32 arrays ``(lo, hi)`` (a struct-of-arrays pytree — the element axes
stay contiguous in lanes, which is what the VPU wants).  All ops are pure jnp
and jit/vmap/shard_map-compatible; Pallas kernels in ``ops/`` reuse the same
limb algebra on refs.

The algorithms are the standard Goldilocks schoolbook built from 32x32->64
partial products (16-bit splits for the high half) and the reduction
2^64 == 2^32 - 1 (mod p), 2^96 == -1 (mod p).  Semantics are tested
bit-exactly against ``host.py`` python-int arithmetic.

Reference parity: the concrete field arithmetic of the reference lives in its
p3-goldilocks dependency (SURVEY.md §2.1 "External field components"); this
module plus ``host.py`` is our equivalent.  Invariant: all stored values are
canonical (< p).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import host

U32 = jnp.uint32
P = host.GOLDILOCKS.p            # 0xFFFFFFFF00000001
P_HI = np.uint32(0xFFFFFFFF)
P_LO = np.uint32(0x00000001)
MASK32 = np.uint32(0xFFFFFFFF)
SPEC = host.GOLDILOCKS


class GL(NamedTuple):
    """A Goldilocks array: canonical u64 values as (lo, hi) uint32 limbs."""

    lo: jax.Array
    hi: jax.Array

    @property
    def shape(self):
        return self.lo.shape

    @property
    def ndim(self):
        return self.lo.ndim

    def reshape(self, *shape) -> "GL":
        return GL(self.lo.reshape(*shape), self.hi.reshape(*shape))

    def __getitem__(self, idx) -> "GL":
        return GL(self.lo[idx], self.hi[idx])

    def astype_u64(self) -> jax.Array:
        """Lossless u64 view (for host transfer / debugging only)."""
        return self.lo.astype(jnp.uint64) | (self.hi.astype(jnp.uint64) << 32)


# --------------------------------------------------------------------------
# Construction / conversion
# --------------------------------------------------------------------------


def from_ints(vals: Union[Sequence[int], np.ndarray]) -> GL:
    """Host ints (canonical, < p) -> GL device arrays."""
    a = np.asarray(vals, dtype=np.uint64)
    return GL(jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32)),
              jnp.asarray((a >> np.uint64(32)).astype(np.uint32)))


def to_ints(x: GL) -> np.ndarray:
    """GL -> numpy uint64 canonical values (host sync)."""
    lo = np.asarray(jax.device_get(x.lo), dtype=np.uint64)
    hi = np.asarray(jax.device_get(x.hi), dtype=np.uint64)
    return lo | (hi << np.uint64(32))


def zeros(shape) -> GL:
    return GL(jnp.zeros(shape, U32), jnp.zeros(shape, U32))


def ones(shape) -> GL:
    return GL(jnp.ones(shape, U32), jnp.zeros(shape, U32))


def full(shape, value: int) -> GL:
    value %= P
    return GL(jnp.full(shape, np.uint32(value & 0xFFFFFFFF), U32),
              jnp.full(shape, np.uint32(value >> 32), U32))


def const(value: int) -> GL:
    """Scalar constant (shape ()) — broadcasts against any GL array."""
    return full((), value)


def from_u32(w) -> GL:
    """Device uint32 array/scalar -> GL field value (canonical, < 2^32)."""
    return GL(w.astype(U32), jnp.zeros_like(w, dtype=U32))


def index_low_bits(x: GL, n: int):
    """Canonical value mod n (n a power of two <= 2^32) as int32 indices."""
    assert n & (n - 1) == 0 and n <= 1 << 32
    return (x.lo & np.uint32(n - 1)).astype(jnp.int32)


# --------------------------------------------------------------------------
# 32/64-bit limb primitives
# --------------------------------------------------------------------------


def _mul32(a, b):
    """32x32 -> 64 full product as (hi, lo) uint32, from 16-bit partials."""
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    t01 = a0 * b1
    t10 = a1 * b0
    mid = ((a0 * b0) >> 16) + (t01 & 0xFFFF) + (t10 & 0xFFFF)
    lo = a * b  # native low 32 bits
    hi = a1 * b1 + (t01 >> 16) + (t10 >> 16) + (mid >> 16)
    return hi, lo


def _add64(alo, ahi, blo, bhi):
    """(a + b) mod 2^64 as (lo, hi, carry_out)."""
    lo = alo + blo
    c0 = (lo < alo).astype(U32)
    t = ahi + bhi
    c1 = t < ahi
    hi = t + c0
    c2 = hi < t
    return lo, hi, (c1 | c2).astype(U32)


def _sub64(alo, ahi, blo, bhi):
    """(a - b) mod 2^64 as (lo, hi, borrow_out)."""
    lo = alo - blo
    b0 = (alo < blo).astype(U32)
    t = ahi - bhi
    b1 = ahi < bhi
    hi = t - b0
    b2 = t < b0
    return lo, hi, (b1 | b2).astype(U32)


def _geq_p(lo, hi):
    return (hi == P_HI) & (lo >= P_LO)


def _cond_sub_p(lo, hi, cond):
    """Subtract p where cond (== add 2^32-1 mod 2^64)."""
    adj = jnp.where(cond, MASK32, np.uint32(0))
    nlo = lo + adj
    carry = (nlo < lo).astype(U32)
    return nlo, hi + carry


# --------------------------------------------------------------------------
# Field ops
# --------------------------------------------------------------------------


def add(a: GL, b: GL) -> GL:
    lo, hi, carry = _add64(a.lo, a.hi, b.lo, b.hi)
    lo, hi = _cond_sub_p(lo, hi, (carry != 0) | _geq_p(lo, hi))
    return GL(lo, hi)


def sub(a: GL, b: GL) -> GL:
    lo, hi, borrow = _sub64(a.lo, a.hi, b.lo, b.hi)
    # on borrow we computed a-b+2^64; compensate: subtract 2^32-1 (== add p)
    adj = jnp.where(borrow != 0, MASK32, np.uint32(0))
    nlo = lo - adj
    nb = (lo < adj).astype(U32)
    return GL(nlo, hi - nb)


def neg(a: GL) -> GL:
    return sub(zeros(a.shape), a)


def _reduce128(n0, n1, n2, n3):
    """(n3*2^96 + n2*2^64 + n1*2^32 + n0) mod p, canonical output."""
    # t0 = lo64 - n3 (2^96 == -1 mod p)
    t0lo, t0hi, borrow = _sub64(n0, n1, n3, jnp.zeros_like(n3))
    adj = jnp.where(borrow != 0, MASK32, np.uint32(0))
    nlo = t0lo - adj
    nb = (t0lo < adj).astype(U32)
    t0lo, t0hi = nlo, t0hi - nb
    # t1 = n2 * (2^32 - 1)  (2^64 == 2^32-1 mod p)
    t1lo = jnp.zeros_like(n2) - n2
    t1hi = n2 - (n2 != 0).astype(U32)
    # t2 = t0 + t1, wrap-around == add 2^32-1
    lo, hi, carry = _add64(t0lo, t0hi, t1lo, t1hi)
    adj = jnp.where(carry != 0, MASK32, np.uint32(0))
    nlo = lo + adj
    c = (nlo < lo).astype(U32)
    lo, hi = nlo, hi + c
    # canonicalize
    lo, hi = _cond_sub_p(lo, hi, _geq_p(lo, hi))
    return GL(lo, hi)


def mul(a: GL, b: GL) -> GL:
    ll_hi, ll_lo = _mul32(a.lo, b.lo)
    lh_hi, lh_lo = _mul32(a.lo, b.hi)
    hl_hi, hl_lo = _mul32(a.hi, b.lo)
    hh_hi, hh_lo = _mul32(a.hi, b.hi)
    n0 = ll_lo
    t1 = ll_hi + lh_lo
    c1a = (t1 < ll_hi).astype(U32)
    n1 = t1 + hl_lo
    c1b = (n1 < t1).astype(U32)
    t2 = lh_hi + hl_hi
    c2a = (t2 < lh_hi).astype(U32)
    t2b = t2 + hh_lo
    c2b = (t2b < t2).astype(U32)
    carry12 = c1a + c1b
    n2 = t2b + carry12
    c2c = (n2 < t2b).astype(U32)
    n3 = hh_hi + c2a + c2b + c2c
    return _reduce128(n0, n1, n2, n3)


def sqr(a: GL) -> GL:
    return mul(a, a)


def mul_const(a: GL, c: int) -> GL:
    """Multiply by a host constant (broadcast)."""
    return mul(a, full((), c))


def select(mask, a: GL, b: GL) -> GL:
    """Elementwise where(mask, a, b)."""
    return GL(jnp.where(mask, a.lo, b.lo), jnp.where(mask, a.hi, b.hi))


def eq(a: GL, b: GL):
    return (a.lo == b.lo) & (a.hi == b.hi)


def is_zero(a: GL):
    return (a.lo == 0) & (a.hi == 0)


def pow_const(a: GL, e: int) -> GL:
    """a^e for a static python exponent (square-and-multiply, unrolled)."""
    if e >= P - 1:
        e %= P - 1
    if e == 0:
        return ones(a.shape)
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = sqr(base)
    return result


# exponent bits of p-2, LSB first (scan inputs for Fermat inversion)
_INV_BITS = np.array([(P - 2) >> i & 1 for i in range((P - 2).bit_length())],
                     dtype=bool)


def inv(a: GL) -> GL:
    """Fermat inverse a^(p-2), square-and-multiply as a lax.scan over the
    exponent bits.  The scan keeps the XLA graph to one compact round body
    (an unrolled ~100-multiply chain makes LLVM compile time superlinear);
    runtime op count is the same data-parallel chain.  Callers must ensure
    nonzero inputs, as the reference does (division by zero is a proving
    error, plonky2 plonk/prover.rs:515)."""

    def body(carry, bit):
        result, base = carry
        taken = mul(result, base)
        result = GL(jnp.where(bit, taken.lo, result.lo),
                    jnp.where(bit, taken.hi, result.hi))
        return (result, sqr(base)), None

    (result, _), _ = jax.lax.scan(body, (ones(a.shape), a),
                                  jnp.asarray(_INV_BITS))
    return result


def batch_sum(a: GL, axis: int = -1) -> GL:
    """Sum-reduce along an axis without materializing per-step canonicalization:
    reduces via pairwise tree using add (log depth)."""
    n = a.shape[axis]
    x = a
    # move axis to front for simple slicing
    lo = jnp.moveaxis(x.lo, axis, 0)
    hi = jnp.moveaxis(x.hi, axis, 0)
    x = GL(lo, hi)
    while x.lo.shape[0] > 1:
        m = x.lo.shape[0]
        half = m // 2
        a1 = GL(x.lo[:half], x.hi[:half])
        a2 = GL(x.lo[half:2 * half], x.hi[half:2 * half])
        s = add(a1, a2)
        if m % 2:
            s = GL(jnp.concatenate([s.lo, x.lo[-1:]], axis=0),
                   jnp.concatenate([s.hi, x.hi[-1:]], axis=0))
        x = s
    return GL(x.lo[0], x.hi[0])


def batch_prod(a: GL, axis: int = -1) -> GL:
    """Tree-reduce product along an axis (log-depth multiply graph)."""
    lo = jnp.moveaxis(a.lo, axis, 0)
    hi = jnp.moveaxis(a.hi, axis, 0)
    x = GL(lo, hi)
    while x.lo.shape[0] > 1:
        m = x.lo.shape[0]
        half = m // 2
        s = mul(GL(x.lo[:half], x.hi[:half]),
                GL(x.lo[half:2 * half], x.hi[half:2 * half]))
        if m % 2:
            s = GL(jnp.concatenate([s.lo, x.lo[-1:]], axis=0),
                   jnp.concatenate([s.hi, x.hi[-1:]], axis=0))
        x = s
    return GL(x.lo[0], x.hi[0])


def cumprod(a: GL, axis: int = -1) -> GL:
    """Inclusive prefix product along axis via associative scan (log depth).
    Used by the permutation-argument running product Z (reference
    plonk/prover.rs:480-546 computes it sequentially; on TPU a scan is the
    idiomatic equivalent)."""
    def combine(x, y):
        return mul(x, y)
    lo = jnp.moveaxis(a.lo, axis, 0)
    hi = jnp.moveaxis(a.hi, axis, 0)
    res = jax.lax.associative_scan(combine, GL(lo, hi), axis=0)
    return GL(jnp.moveaxis(res.lo, 0, axis), jnp.moveaxis(res.hi, 0, axis))


# -- PoW-grind helpers (field-specific candidate/threshold handling) ---------


def grind_set_lane(state: GL, pos: int, cands_u32) -> GL:
    """Write uint32 canonical candidates into state[:, pos] (< p, canonical)."""
    return GL(state.lo.at[:, pos].set(cands_u32),
              state.hi.at[:, pos].set(jnp.zeros_like(cands_u32)))


def grind_response_ok(resp: GL, k: int):
    """canonical u64 value < 2^k."""
    if k >= 64:
        return jnp.ones_like(resp.hi, dtype=bool)
    if k >= 32:
        return resp.hi < jnp.uint32(1 << (k - 32))
    return (resp.hi == 0) & (resp.lo < jnp.uint32(1 << k))
