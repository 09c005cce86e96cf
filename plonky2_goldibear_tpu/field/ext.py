"""Device binomial extension fields F_p[X]/(X^D - W), generic over the base.

An extension array is a tuple of D base-field arrays (struct-of-arrays: each
coefficient keeps its own contiguous lanes — no tiny trailing dims that would
fight TPU tiling).

Counterpart of p3-field's ``BinomialExtensionField`` used by the reference
(SURVEY.md §2.1); the host semantic reference is ``host.ext_*``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from . import bb as bb_mod
from . import gl as gl_mod
from . import host


class ExtOps:
    """Extension-field operations over a device base-field module.

    ``base`` must provide: add, sub, neg, mul, mul_const, sqr, inv, select,
    zeros, ones, full, const, pow_const, eq, is_zero.
    """

    def __init__(self, base, spec: host.FieldSpec):
        self.base = base
        self.spec = spec
        self.D = spec.ext_degree
        self.W = spec.ext_w
        p, d, w = spec.p, spec.ext_degree, spec.ext_w
        z = pow(w, (p - 1) // d, p)
        # frobenius coefficient scalings: _frob_scale[c][i] = z^(c*i)
        self._frob_scale = [[pow(z, (c * i) % d, p) for i in range(d)]
                            for c in range(d)]

    # -- construction ------------------------------------------------------

    def zeros(self, shape):
        return tuple(self.base.zeros(shape) for _ in range(self.D))

    def ones(self, shape):
        return (self.base.ones(shape),) + tuple(
            self.base.zeros(shape) for _ in range(self.D - 1))

    def from_base(self, x):
        zero = self.base.zeros(x.shape if hasattr(x, "shape") else ())
        return (x,) + tuple(zero for _ in range(self.D - 1))

    def const(self, coeffs) -> Tuple:
        """Scalar ext constant from D host ints (or one int -> base embed)."""
        if isinstance(coeffs, int):
            coeffs = (coeffs,) + (0,) * (self.D - 1)
        assert len(coeffs) == self.D
        return tuple(self.base.const(c) for c in coeffs)

    def from_ints(self, coeff_arrays):
        """coeff_arrays: sequence of D host int arrays."""
        assert len(coeff_arrays) == self.D
        return tuple(self.base.from_ints(c) for c in coeff_arrays)

    def to_ints(self, x):
        return tuple(self.base.to_ints(c) for c in x)

    # -- ring ops ----------------------------------------------------------

    def add(self, a, b):
        return tuple(self.base.add(x, y) for x, y in zip(a, b))

    def sub(self, a, b):
        return tuple(self.base.sub(x, y) for x, y in zip(a, b))

    def neg(self, a):
        return tuple(self.base.neg(x) for x in a)

    def mul(self, a, b):
        d, w = self.D, self.W
        acc = [None] * (2 * d - 1)
        for i in range(d):
            for j in range(d):
                t = self.base.mul(a[i], b[j])
                k = i + j
                acc[k] = t if acc[k] is None else self.base.add(acc[k], t)
        out = list(acc[:d])
        for k in range(d, 2 * d - 1):
            out[k - d] = self.base.add(out[k - d], self.base.mul_const(acc[k], w))
        return tuple(out)

    def sqr(self, a):
        return self.mul(a, a)

    def scalar_mul(self, a, s):
        """ext * base-field array."""
        return tuple(self.base.mul(x, s) for x in a)

    def mul_const(self, a, coeffs):
        """ext * host constant (int -> base constant, tuple -> ext constant)."""
        if isinstance(coeffs, int):
            return tuple(self.base.mul_const(x, coeffs) for x in a)
        return self.mul(a, self.const(coeffs))

    def select(self, mask, a, b):
        return tuple(self.base.select(mask, x, y) for x, y in zip(a, b))

    def eq(self, a, b):
        r = None
        for x, y in zip(a, b):
            e = self.base.eq(x, y)
            r = e if r is None else (r & e)
        return r

    def is_zero(self, a):
        r = None
        for x in a:
            e = self.base.is_zero(x)
            r = e if r is None else (r & e)
        return r

    def frobenius(self, a, count: int = 1):
        scales = self._frob_scale[count % self.D]
        return tuple(x if s == 1 else self.base.mul_const(x, s)
                     for x, s in zip(a, scales))

    def inv(self, a):
        """Inverse via the norm map: conj(a) * N(a)^-1 with N(a) in the base
        field (batch-friendly: one base-field Fermat inversion)."""
        conj = None
        for i in range(1, self.D):
            f = self.frobenius(a, i)
            conj = f if conj is None else self.mul(conj, f)
        norm = self.mul(a, conj)[0]  # remaining coeffs are zero by theory
        ninv = self.base.inv(norm)
        return self.scalar_mul(conj, ninv)

    def div(self, a, b):
        return self.mul(a, self.inv(b))

    def pow_const(self, a, e: int):
        if e == 0:
            shape = a[0].shape
            return self.ones(shape)
        result = None
        base = a
        while e:
            if e & 1:
                result = base if result is None else self.mul(result, base)
            e >>= 1
            if e:
                base = self.sqr(base)
        return result

    def reshape(self, a, *shape):
        return tuple(x.reshape(*shape) for x in a)

    def getitem(self, a, idx):
        return tuple(x[idx] for x in a)


gl2 = ExtOps(gl_mod, host.GOLDILOCKS)
bb4 = ExtOps(bb_mod, host.BABYBEAR)
