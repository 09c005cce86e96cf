"""Poseidon-GL known-answer tests against the reference's committed vectors
(plonky2/src/hash/poseidon_goldilocks.rs:1158-1189) and host-vs-device
consistency for the sponge APIs."""

import numpy as np

from plonky2_goldibear_tpu.field import gl, host
from plonky2_goldibear_tpu.hash import _poseidon_gl_constants as C
from plonky2_goldibear_tpu.hash import poseidon_gl as pos

RNG = np.random.default_rng(123)


def test_host_permutation_kats():
    for inp, expected in C.TEST_VECTORS:
        assert pos.permute_host(inp) == [x % host.GOLDILOCKS.p for x in expected]


def test_device_permutation_kats_batched():
    inputs = np.array([iv for iv, _ in C.TEST_VECTORS], dtype=np.uint64)
    expected = np.array([ov for _, ov in C.TEST_VECTORS], dtype=np.uint64)
    out = gl.to_ints(pos.permute(gl.from_ints(inputs)))
    assert (out == expected).all()


def test_device_permutation_large_batch():
    batch = RNG.integers(0, host.GOLDILOCKS.p, size=(64, 12), dtype=np.uint64)
    out = gl.to_ints(pos.permute(gl.from_ints(batch)))
    for i in [0, 17, 63]:
        assert list(out[i]) == pos.permute_host([int(x) for x in batch[i]])


def test_sponge_host_vs_device():
    for L in [1, 4, 5, 8, 9, 16, 20, 135]:
        inp = RNG.integers(0, host.GOLDILOCKS.p, size=(3, L), dtype=np.uint64)
        dev = gl.to_ints(pos.hash_no_pad(gl.from_ints(inp)))
        for b in range(3):
            assert list(dev[b]) == pos.hash_no_pad_host([int(x) for x in inp[b]])


def test_sponge_many_outputs():
    inp = RNG.integers(0, host.GOLDILOCKS.p, size=(2, 11), dtype=np.uint64)
    dev = gl.to_ints(pos.hash_n_to_m_no_pad(gl.from_ints(inp), 17))
    for b in range(2):
        assert list(dev[b]) == pos.hash_n_to_m_no_pad_host(
            [int(x) for x in inp[b]], 17)


def test_hash_or_noop():
    short = RNG.integers(0, host.GOLDILOCKS.p, size=(2, 3), dtype=np.uint64)
    dev = gl.to_ints(pos.hash_or_noop(gl.from_ints(short)))
    for b in range(2):
        assert list(dev[b]) == pos.hash_or_noop_host([int(x) for x in short[b]])
    assert pos.hash_or_noop_host([5, 6, 7]) == [5, 6, 7, 0]
    long = RNG.integers(0, host.GOLDILOCKS.p, size=(2, 6), dtype=np.uint64)
    dev = gl.to_ints(pos.hash_or_noop(gl.from_ints(long)))
    for b in range(2):
        assert list(dev[b]) == pos.hash_no_pad_host([int(x) for x in long[b]])


def test_two_to_one():
    x = RNG.integers(0, host.GOLDILOCKS.p, size=(5, 4), dtype=np.uint64)
    y = RNG.integers(0, host.GOLDILOCKS.p, size=(5, 4), dtype=np.uint64)
    dev = gl.to_ints(pos.two_to_one(gl.from_ints(x), gl.from_ints(y)))
    for b in range(5):
        assert list(dev[b]) == pos.two_to_one_host(
            [int(v) for v in x[b]], [int(v) for v in y[b]])
