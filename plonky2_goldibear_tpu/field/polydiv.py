"""Host-side general polynomial division over a prime field.

Coefficient-form parity with the reference's polynomial division module
(field/src/polynomial/division.rs:12-131): ``div_rem`` (fast path via a
Newton-iteration power-series inverse of the reversed divisor),
``div_rem_long_division`` (schoolbook), ``divide_by_linear`` (Horner
synthetic division), and ``inv_mod_xn`` (Newton doubling).

Polynomials are Python lists of canonical ints (little-endian coefficient
order); p is passed explicitly, so the same code serves Goldilocks and
BabyBear.  The hot per-proof division paths run in values form on device
(fri/prover.py); this module covers the general coefficient-form API.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from . import host


def _trim(c: List[int]) -> List[int]:
    """Drop trailing zero coefficients (degree normalization)."""
    n = len(c)
    while n > 0 and c[n - 1] == 0:
        n -= 1
    return c[:n]


def poly_mul(a: Sequence[int], b: Sequence[int], p: int) -> List[int]:
    """Schoolbook product (host sizes are small; device muls use the NTT)."""
    a = _trim(list(a))
    b = _trim(list(b))
    if not a or not b:
        return []
    out = [0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        if ai == 0:
            continue
        for j, bj in enumerate(b):
            out[i + j] = (out[i + j] + ai * bj) % p
    return out


def poly_add(a: Sequence[int], b: Sequence[int], p: int) -> List[int]:
    n = max(len(a), len(b))
    return [((a[i] if i < len(a) else 0) + (b[i] if i < len(b) else 0)) % p
            for i in range(n)]


def poly_sub(a: Sequence[int], b: Sequence[int], p: int) -> List[int]:
    n = max(len(a), len(b))
    return [((a[i] if i < len(a) else 0) - (b[i] if i < len(b) else 0)) % p
            for i in range(n)]


def inv_mod_xn(a: Sequence[int], n: int, p: int) -> List[int]:
    """Power-series inverse of ``a`` modulo x^n by Newton doubling:
    b_{2k} = b_k * (2 - a * b_k) mod x^{2k}.  Requires a[0] != 0.
    (reference division.rs:90-131)."""
    assert n > 0, "n must be nonzero"
    a = list(a)
    assert a and a[0] != 0, "inverse doesn't exist (constant term is zero)"
    b = [host.finv(a[0], p)]
    k = 1
    while k < n:
        k = min(2 * k, n)
        ab = poly_mul(a[:k], b, p)[:k]
        # 2 - a*b  (mod x^k)
        corr = [(-c) % p for c in ab]
        corr[0] = (corr[0] + 2) % p
        b = poly_mul(b, corr, p)[:k]
    return b[:n]


def divide_by_linear(a: Sequence[int], z: int, p: int) -> List[int]:
    """(a(X) - a(z)) / (X - z) by Horner synthetic division
    (reference division.rs:74-88)."""
    acc = 0
    out: List[int] = []
    for c in reversed(list(a)):
        acc = (acc * z + c) % p
        out.append(acc)
    out.pop()           # the final accumulator is a(z), not a coefficient
    out.reverse()
    return out


def div_rem_long_division(a: Sequence[int], b: Sequence[int], p: int
                          ) -> Tuple[List[int], List[int]]:
    """Schoolbook long division: (quotient, remainder)
    (reference division.rs:42-71)."""
    a = _trim(list(a))
    b = _trim(list(b))
    if not b:
        raise ZeroDivisionError("division by zero polynomial")
    if not a:
        return [], []
    if len(a) < len(b):
        return [], a
    q = [0] * (len(a) - len(b) + 1)
    r = list(a)
    lead_inv = host.finv(b[-1], p)
    while r and len(r) >= len(b):
        c = r[-1] * lead_inv % p
        d = len(r) - len(b)
        q[d] = c
        for i, bc in enumerate(b):
            r[d + i] = (r[d + i] - c * bc) % p
        r = _trim(r)
    return q, r


def div_rem(a: Sequence[int], b: Sequence[int], p: int
            ) -> Tuple[List[int], List[int]]:
    """(quotient, remainder) via the reversal trick: rev(q) =
    rev(a) * inv_mod_xn(rev(b)) truncated to deg a - deg b + 1
    (reference division.rs:12-39).  Output matches long division exactly."""
    a = _trim(list(a))
    b = _trim(list(b))
    if not b:
        raise ZeroDivisionError("division by zero polynomial")
    if not a:
        return [], []
    if len(a) < len(b):
        return [], a
    if len(b) == 1:
        inv = host.finv(b[0], p)
        return [c * inv % p for c in a], []
    k = len(a) - len(b) + 1          # quotient length
    rev_a = a[::-1]
    rev_b = b[::-1]
    rev_b_inv = inv_mod_xn(rev_b, k, p)
    rev_q = poly_mul(rev_b_inv, rev_a[:k], p)[:k]
    rev_q += [0] * (k - len(rev_q))
    q = rev_q[::-1]
    r = _trim(poly_sub(a, poly_mul(q, b, p), p))
    return _trim(q), r
