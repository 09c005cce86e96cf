"""NTT tests vs naive polynomial evaluation (reference test strategy:
field/src/fft.rs:219-253, polynomial/mod.rs:478-516)."""

import numpy as np
import pytest

from plonky2_goldibear_tpu.field import bb, ext, fft, gl, host

RNG = np.random.default_rng(42)


def naive_eval(coeffs, x, p):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + int(c)) % p
    return acc


FIELDS = [(gl, host.GOLDILOCKS), (bb, host.BABYBEAR)]


@pytest.mark.parametrize("F,spec", FIELDS)
class TestFFT:
    def test_fft_matches_naive(self, F, spec):
        n_log, n = 4, 16
        coeffs = RNG.integers(0, spec.p, size=n, dtype=np.uint64)
        vals = F.to_ints(fft.fft(F, F.from_ints(coeffs)))
        g = spec.two_adic_generator(n_log)
        x = 1
        for k in range(n):
            assert int(vals[k]) == naive_eval(coeffs, x, spec.p), k
            x = x * g % spec.p

    def test_fft_batched(self, F, spec):
        n = 8
        coeffs = RNG.integers(0, spec.p, size=(3, 5, n), dtype=np.uint64)
        vals = F.to_ints(fft.fft(F, F.from_ints(coeffs)))
        one_row = F.to_ints(fft.fft(F, F.from_ints(coeffs[1, 2])))
        assert (vals[1, 2] == one_row).all()

    def test_ifft_roundtrip(self, F, spec):
        n = 32
        coeffs = RNG.integers(0, spec.p, size=n, dtype=np.uint64)
        back = F.to_ints(fft.ifft(F, fft.fft(F, F.from_ints(coeffs))))
        assert (back.astype(np.uint64) == coeffs).all()

    def test_coset_fft(self, F, spec):
        n_log, n = 3, 8
        shift = spec.coset_shift
        coeffs = RNG.integers(0, spec.p, size=n, dtype=np.uint64)
        vals = F.to_ints(fft.coset_fft(F, F.from_ints(coeffs), shift))
        g = spec.two_adic_generator(n_log)
        x = shift
        for k in range(n):
            assert int(vals[k]) == naive_eval(coeffs, x, spec.p), k
            x = x * g % spec.p
        back = F.to_ints(fft.coset_ifft(F, fft.coset_fft(
            F, F.from_ints(coeffs), shift), shift))
        assert (back.astype(np.uint64) == coeffs).all()

    def test_lde(self, F, spec):
        n, rate_bits = 8, 2
        coeffs = RNG.integers(0, spec.p, size=n, dtype=np.uint64)
        vals = F.to_ints(fft.lde_coset_fft(F, F.from_ints(coeffs), rate_bits))
        N = n << rate_bits
        g = spec.two_adic_generator(host.log2_strict(N))
        shift = spec.coset_shift
        for k in range(N):
            x = shift * pow(g, k, spec.p) % spec.p
            assert int(vals[k]) == naive_eval(coeffs, x, spec.p), k

    def test_reverse_index_bits(self, F, spec):
        n = 16
        a = np.arange(n, dtype=np.uint64)
        out = F.to_ints(fft.reverse_index_bits(F.from_ints(a)))
        perm = host.reverse_index_bits_perm(4)
        assert (out.astype(np.int64) == np.array(perm)).all()


def test_ext_fft_gl2():
    E, spec = ext.gl2, host.GOLDILOCKS
    n_log, n = 3, 8
    coeffs = [RNG.integers(0, spec.p, size=n, dtype=np.uint64)
              for _ in range(spec.ext_degree)]
    vals = E.to_ints(fft.ext_fft(E, E.from_ints(coeffs)))
    g = spec.two_adic_generator(n_log)
    # naive ext Horner at base-field points
    for k in range(n):
        x = host.ext_from_base(spec, pow(g, k, spec.p))
        acc = host.ext_zero(spec)
        for i in reversed(range(n)):
            c = tuple(int(coeffs[d][i]) for d in range(spec.ext_degree))
            acc = host.ext_add(spec, host.ext_mul(spec, acc, x), c)
        got = tuple(int(vals[d][k]) for d in range(spec.ext_degree))
        assert got == acc, k


def test_lde_zero_prefix_skip():
    """lde_coset_fft skips the first rate_bits rounds via the zero-prefix
    trick (reference field/src/fft.rs:168-205); result must equal the
    explicit pad + coset_fft."""
    import numpy as np
    from plonky2_goldibear_tpu.field import fft as fftm
    from plonky2_goldibear_tpu.field import gl

    rng = np.random.default_rng(7)
    for b, n, r in [(2, 64, 3), (1, 128, 2)]:
        c = rng.integers(0, gl.P, size=(b, n), dtype=np.uint64)
        out = fftm.lde_coset_fft(gl, gl.from_ints(c), r)
        padded = np.concatenate(
            [c, np.zeros((b, n * ((1 << r) - 1)), dtype=np.uint64)], axis=1)
        ref = fftm.coset_fft(gl, gl.from_ints(padded), gl.SPEC.coset_shift)
        np.testing.assert_array_equal(gl.to_ints(out), gl.to_ints(ref))
