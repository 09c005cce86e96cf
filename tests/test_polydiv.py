"""General polynomial division (field/polydiv.py) vs naive checks over both
fields (reference field/src/polynomial/division.rs:12-131)."""

import numpy as np

from plonky2_goldibear_tpu.field import polydiv as pd
from plonky2_goldibear_tpu.field.host import BABYBEAR, GOLDILOCKS


def _rand_poly(rng, n, p):
    return [int(v) for v in rng.integers(0, p, size=n, dtype=np.uint64)]


def test_div_rem_roundtrip_both_fields():
    rng = np.random.default_rng(31)
    for spec in (GOLDILOCKS, BABYBEAR):
        p = spec.p
        for na, nb in [(8, 3), (17, 5), (33, 33), (5, 9), (12, 1)]:
            a = _rand_poly(rng, na, p)
            b = _rand_poly(rng, nb, p)
            if not pd._trim(b):
                b[0] = 1
            q, r = pd.div_rem(a, b, p)
            # a == q*b + r, deg r < deg b
            recon = pd.poly_add(pd.poly_mul(q, b, p), r, p)
            assert pd._trim(recon) == pd._trim(a)
            assert len(pd._trim(r)) < len(pd._trim(b))
            # agrees with long division
            q2, r2 = pd.div_rem_long_division(a, b, p)
            assert q2 == pd._trim(q) or pd._trim(q2) == pd._trim(q)
            assert pd._trim(r2) == pd._trim(r)


def test_exact_division_no_remainder():
    rng = np.random.default_rng(32)
    p = GOLDILOCKS.p
    q = _rand_poly(rng, 7, p)
    b = _rand_poly(rng, 4, p)
    a = pd.poly_mul(q, b, p)
    qq, rr = pd.div_rem(a, b, p)
    assert pd._trim(qq) == pd._trim(q)
    assert rr == []


def test_divide_by_linear_matches_div_rem():
    rng = np.random.default_rng(33)
    p = BABYBEAR.p
    a = _rand_poly(rng, 9, p)
    z = 12345
    got = pd.divide_by_linear(a, z, p)
    # (a - a(z)) / (X - z)
    az = 0
    for c in reversed(a):
        az = (az * z + c) % p
    a_shift = list(a)
    a_shift[0] = (a_shift[0] - az) % p
    want, rem = pd.div_rem(a_shift, [(-z) % p, 1], p)
    assert rem == []
    assert pd._trim(got) == pd._trim(want)


def test_inv_mod_xn():
    rng = np.random.default_rng(34)
    p = GOLDILOCKS.p
    a = _rand_poly(rng, 6, p)
    a[0] = a[0] or 1
    for n in (1, 2, 5, 16):
        b = pd.inv_mod_xn(a, n, p)
        prod = pd.poly_mul(a, b, p)[:n]
        assert prod[0] == 1 and all(c == 0 for c in prod[1:])
