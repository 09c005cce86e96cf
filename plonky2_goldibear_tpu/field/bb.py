"""Device BabyBear arithmetic: p = 2^31 - 2^27 + 1 on 32-bit TPU lanes.

Elements are stored in Montgomery form (R = 2^32), exactly like the
reference's p3-monty-31 dependency (SURVEY.md §2.1) — a single uint32 array
per BabyBear array.  Canonical integers appear only at conversion boundaries
(``from_ints`` / ``to_ints``), which is also where the reference converts
(plonky2/src/hash/poseidon2_babybear.rs:150-159 round-trips canonical u64s).

Invariant: stored Montgomery residues are canonical (< p).
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import host

U32 = jnp.uint32
SPEC = host.BABYBEAR
P = SPEC.p                                   # 0x78000001
P_U32 = np.uint32(P)
R = (1 << 32) % P                            # Montgomery R mod p
R2 = (R * R) % P
# MU = -p^-1 mod 2^32
MU = np.uint32(pow(-P % (1 << 32), -1, 1 << 32))
MONT_ONE = np.uint32(R)


def _mul32(a, b):
    """32x32 -> 64 as (hi, lo) uint32."""
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    t01 = a0 * b1
    t10 = a1 * b0
    mid = ((a0 * b0) >> 16) + (t01 & 0xFFFF) + (t10 & 0xFFFF)
    lo = a * b
    hi = a1 * b1 + (t01 >> 16) + (t10 >> 16) + (mid >> 16)
    return hi, lo


def _redc(hi, lo):
    """Montgomery reduction of the 64-bit value (hi, lo): returns
    (hi*2^32 + lo) * R^-1 mod p, canonical."""
    m = lo * MU                               # mod 2^32
    mp_hi, _ = _mul32(m, jnp.full_like(m, P_U32))
    t = hi + mp_hi + (lo != 0).astype(U32)
    # t < 2p
    return jnp.where(t >= P_U32, t - P_U32, t)


def from_ints(vals: Union[Sequence[int], np.ndarray]) -> jax.Array:
    """Canonical host ints -> Montgomery-form device array."""
    a = np.asarray(vals, dtype=np.uint64) % np.uint64(P)
    mont = (a * np.uint64(R)) % np.uint64(P)
    return jnp.asarray(mont.astype(np.uint32))


def to_ints(x: jax.Array) -> np.ndarray:
    """Montgomery-form device array -> canonical numpy uint32."""
    m = np.asarray(jax.device_get(x), dtype=np.uint64)
    rinv = pow(R, -1, P)
    return ((m * np.uint64(rinv)) % np.uint64(P)).astype(np.uint32)


def zeros(shape) -> jax.Array:
    return jnp.zeros(shape, U32)


def ones(shape) -> jax.Array:
    return jnp.full(shape, MONT_ONE, U32)


def from_u32(w) -> jax.Array:
    """Device uint32 array/scalar (canonical < p) -> Montgomery form."""
    w = w.astype(U32)
    hi, lo = _mul32(w, jnp.full_like(w, np.uint32(R2)))
    return _redc(hi, lo)


def index_low_bits(x: jax.Array, n: int):
    """Canonical value mod n (n a power of two) as int32 indices."""
    assert n & (n - 1) == 0 and n <= 1 << 31
    canon = _redc(jnp.zeros_like(x), x)
    return (canon & np.uint32(n - 1)).astype(jnp.int32)


def full(shape, value: int) -> jax.Array:
    mont = (value % P) * R % P
    return jnp.full(shape, np.uint32(mont), U32)


def const(value: int) -> jax.Array:
    return full((), value)


def add(a, b):
    s = a + b                                 # < 2p < 2^32, no wrap
    return jnp.where(s >= P_U32, s - P_U32, s)


def sub(a, b):
    d = a - b
    return jnp.where(a < b, d + P_U32, d)


def neg(a):
    return jnp.where(a == 0, a, P_U32 - a)


def mul(a, b):
    hi, lo = _mul32(a, b)
    return _redc(hi, lo)


def sqr(a):
    return mul(a, a)


def mul_const(a, c: int):
    return mul(a, jnp.full_like(a, np.uint32((c % P) * R % P)))


def select(mask, a, b):
    return jnp.where(mask, a, b)


def eq(a, b):
    return a == b


def is_zero(a):
    return a == 0


def pow_const(a, e: int):
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


def inv(a):
    """Fermat inverse a^(p-2) as a lax.scan over exponent bits (compact XLA
    graph; an unrolled multiply chain is pathological for LLVM compile
    time)."""

    def body(carry, bit):
        result, base = carry
        result = jnp.where(bit, mul(result, base), result)
        return (result, sqr(base)), None

    (result, _), _ = jax.lax.scan(body, (ones(a.shape), a),
                                  jnp.asarray(_INV_BITS))
    return result


def cumprod(a, axis: int = -1):
    x = jnp.moveaxis(a, axis, 0)
    res = jax.lax.associative_scan(mul, x, axis=0)
    return jnp.moveaxis(res, 0, axis)


def batch_sum(a, axis: int = -1):
    """Tree-reduce sum along an axis (log depth, canonical adds)."""
    x = jnp.moveaxis(a, axis, 0)
    while x.shape[0] > 1:
        m = x.shape[0]
        half = m // 2
        s = add(x[:half], x[half:2 * half])
        if m % 2:
            s = jnp.concatenate([s, x[-1:]], axis=0)
        x = s
    return x[0]


def batch_prod(a, axis: int = -1):
    """Tree-reduce product along an axis (log-depth multiply graph)."""
    x = jnp.moveaxis(a, axis, 0)
    while x.shape[0] > 1:
        m = x.shape[0]
        half = m // 2
        s = mul(x[:half], x[half:2 * half])
        if m % 2:
            s = jnp.concatenate([s, x[-1:]], axis=0)
        x = s
    return x[0]


# -- PoW-grind helpers (field-specific candidate/threshold handling) ---------


def grind_set_lane(state, pos, cands_u32):
    """Write uint32 canonical candidates into state[:, pos].

    Values are stored in Montgomery form, so convert: mont = REDC(c * R2).
    """
    hi, lo = _mul32(cands_u32, jnp.full_like(cands_u32, np.uint32(R2)))
    mont = _redc(hi, lo)
    return state.at[:, pos].set(mont)


def grind_response_ok(resp, k: int):
    """canonical(resp) < 2^k for Montgomery-form resp."""
    canon = _redc(jnp.zeros_like(resp), resp)
    if k >= 31:
        return jnp.ones_like(resp, dtype=bool)
    return canon < jnp.uint32(1 << k)
