"""Field-layer tests: device (jnp) arithmetic bit-exact vs host python ints,
field axioms, boundary values near p / 2^31 / 2^32 / 2^63 (mirroring the
reference's field_testing.rs / prime_field_testing.rs strategy, SURVEY.md §4).
"""

import numpy as np
import pytest

from plonky2_goldibear_tpu.field import bb, ext, gl, host

RNG = np.random.default_rng(0xF1E1D)


def rand_gl(n):
    return RNG.integers(0, host.GOLDILOCKS.p, size=n, dtype=np.uint64)


def rand_bb(n):
    return RNG.integers(0, host.BABYBEAR.p, size=n, dtype=np.uint64)


GL_BOUNDARY = np.array(
    [0, 1, 2, (1 << 31) - 1, 1 << 31, (1 << 32) - 1, 1 << 32, (1 << 32) + 1,
     (1 << 63) - 1, 1 << 63, host.GOLDILOCKS.p - 2, host.GOLDILOCKS.p - 1],
    dtype=np.uint64)
BB_BOUNDARY = np.array(
    [0, 1, 2, (1 << 27) - 1, 1 << 27, (1 << 30) - 1, 1 << 30,
     host.BABYBEAR.p - 2, host.BABYBEAR.p - 1], dtype=np.uint64)


def crossed(vals):
    """All pairs from vals (a-vector, b-vector)."""
    a = np.repeat(vals, len(vals))
    b = np.tile(vals, len(vals))
    return a, b


class TestGoldilocksDevice:
    p = host.GOLDILOCKS.p

    def _pairs(self):
        a = np.concatenate([GL_BOUNDARY, rand_gl(500)])
        b = np.concatenate([rand_gl(len(GL_BOUNDARY)), rand_gl(500)])
        ca, cb = crossed(GL_BOUNDARY)
        return np.concatenate([a, ca]), np.concatenate([b, cb])

    def test_roundtrip(self):
        a, _ = self._pairs()
        assert (gl.to_ints(gl.from_ints(a)) == a).all()

    def test_add_sub_neg(self):
        a, b = self._pairs()
        A, B = gl.from_ints(a), gl.from_ints(b)
        assert (gl.to_ints(gl.add(A, B)) ==
                (a.astype(object) + b.astype(object)) % self.p).all()
        assert (gl.to_ints(gl.sub(A, B)) ==
                (a.astype(object) - b.astype(object)) % self.p).all()
        assert (gl.to_ints(gl.neg(A)) == (-a.astype(object)) % self.p).all()

    def test_mul(self):
        a, b = self._pairs()
        A, B = gl.from_ints(a), gl.from_ints(b)
        expect = (a.astype(object) * b.astype(object)) % self.p
        assert (gl.to_ints(gl.mul(A, B)).astype(object) == expect).all()

    def test_inv(self):
        a = np.concatenate([rand_gl(64), GL_BOUNDARY[GL_BOUNDARY != 0]])
        A = gl.from_ints(a)
        got = gl.to_ints(gl.inv(A))
        expect = np.array([host.finv(int(x), self.p) for x in a], dtype=np.uint64)
        assert (got == expect).all()

    def test_pow(self):
        a = rand_gl(16)
        for e in [0, 1, 2, 3, 7, 12345, self.p - 2]:
            got = gl.to_ints(gl.pow_const(gl.from_ints(a), e))
            expect = np.array([pow(int(x), e, self.p) for x in a], dtype=np.uint64)
            assert (got == expect).all(), e

    def test_cumprod(self):
        a = rand_gl(33)
        got = gl.to_ints(gl.cumprod(gl.from_ints(a)))
        acc, expect = 1, []
        for x in a:
            acc = acc * int(x) % self.p
            expect.append(acc)
        assert (got == np.array(expect, dtype=np.uint64)).all()


class TestBabyBearDevice:
    p = host.BABYBEAR.p

    def _pairs(self):
        ca, cb = crossed(BB_BOUNDARY)
        return (np.concatenate([ca, rand_bb(500)]),
                np.concatenate([cb, rand_bb(500)]))

    def test_roundtrip(self):
        a, _ = self._pairs()
        assert (bb.to_ints(bb.from_ints(a)) == a).all()

    def test_ops(self):
        a, b = self._pairs()
        A, B = bb.from_ints(a), bb.from_ints(b)
        assert (bb.to_ints(bb.add(A, B)).astype(np.uint64) == (a + b) % self.p).all()
        assert (bb.to_ints(bb.sub(A, B)).astype(np.uint64) ==
                (a.astype(np.int64) - b.astype(np.int64)) % self.p).all()
        assert (bb.to_ints(bb.mul(A, B)).astype(np.uint64) == (a * b) % self.p).all()
        assert (bb.to_ints(bb.neg(A)).astype(np.uint64) ==
                (-a.astype(np.int64)) % self.p).all()

    def test_inv(self):
        a = np.concatenate([rand_bb(64), BB_BOUNDARY[BB_BOUNDARY != 0]])
        got = bb.to_ints(bb.inv(bb.from_ints(a)))
        expect = np.array([host.finv(int(x), self.p) for x in a], dtype=np.uint32)
        assert (got == expect).all()


@pytest.mark.parametrize("spec,E", [(host.GOLDILOCKS, ext.gl2),
                                    (host.BABYBEAR, ext.bb4)])
class TestExtensionField:
    def _rand_ext(self, spec, n):
        return [RNG.integers(0, spec.p, size=n, dtype=np.uint64)
                for _ in range(spec.ext_degree)]

    def test_mul_matches_host(self, spec, E):
        n = 64
        a = self._rand_ext(spec, n)
        b = self._rand_ext(spec, n)
        A, B = E.from_ints(a), E.from_ints(b)
        got = E.to_ints(E.mul(A, B))
        for i in range(n):
            av = tuple(int(c[i]) for c in a)
            bv = tuple(int(c[i]) for c in b)
            expect = host.ext_mul(spec, av, bv)
            assert tuple(int(g[i]) for g in got) == expect

    def test_inv(self, spec, E):
        n = 32
        a = self._rand_ext(spec, n)
        A = E.from_ints(a)
        got = E.to_ints(E.mul(A, E.inv(A)))
        for i in range(n):
            v = tuple(int(g[i]) for g in got)
            assert v == host.ext_one(spec)

    def test_frobenius_is_pth_power(self, spec, E):
        n = 8
        a = self._rand_ext(spec, n)
        A = E.from_ints(a)
        got = E.to_ints(E.frobenius(A))
        for i in range(n):
            av = tuple(int(c[i]) for c in a)
            expect = host.ext_pow(spec, av, spec.p)
            assert tuple(int(g[i]) for g in got) == expect


class TestHostExt:
    @pytest.mark.parametrize("spec", [host.GOLDILOCKS, host.BABYBEAR])
    def test_axioms(self, spec):
        import random
        rng = random.Random(7)
        for _ in range(20):
            a = host.ext_sample(spec, rng)
            b = host.ext_sample(spec, rng)
            c = host.ext_sample(spec, rng)
            ab_c = host.ext_mul(spec, host.ext_mul(spec, a, b), c)
            a_bc = host.ext_mul(spec, a, host.ext_mul(spec, b, c))
            assert ab_c == a_bc
            dist1 = host.ext_mul(spec, a, host.ext_add(spec, b, c))
            dist2 = host.ext_add(spec, host.ext_mul(spec, a, b),
                                 host.ext_mul(spec, a, c))
            assert dist1 == dist2
            assert host.ext_mul(spec, a, host.ext_inv(spec, a)) == host.ext_one(spec)

    @pytest.mark.parametrize("spec", [host.GOLDILOCKS, host.BABYBEAR])
    def test_two_adic_generator_orders(self, spec):
        for bits in [1, 2, 5, spec.two_adicity]:
            g = spec.two_adic_generator(bits)
            assert pow(g, 1 << bits, spec.p) == 1
            if bits > 0:
                assert pow(g, 1 << (bits - 1), spec.p) != 1

    def test_known_two_adic_generators(self):
        # Values published by p3-goldilocks / p3-baby-bear (the reference's deps)
        assert host.GOLDILOCKS.two_adic_generator(32) == 0x185629DCDA58878C
        assert host.BABYBEAR.two_adic_generator(27) == 0x1A427A41

    @pytest.mark.parametrize("spec", [host.GOLDILOCKS, host.BABYBEAR])
    def test_batch_inv(self, spec):
        import random
        rng = random.Random(3)
        xs = [rng.randrange(1, spec.p) for _ in range(37)]
        invs = host.batch_inv(xs, spec.p)
        assert all(x * y % spec.p == 1 for x, y in zip(xs, invs))

    def test_unique_coset_shifts(self):
        spec = host.GOLDILOCKS
        shifts = host.get_unique_coset_shifts(spec, 1 << 10, 8)
        # pairwise-distinct cosets: s_i / s_j must not be in the subgroup
        sub = set(host.two_adic_subgroup(spec, 10))
        for i in range(8):
            for j in range(i + 1, 8):
                q = shifts[i] * host.finv(shifts[j], spec.p) % spec.p
                assert q not in sub
