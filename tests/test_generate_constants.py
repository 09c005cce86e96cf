"""generate_constants parity (reference plonky2/src/bin/generate_constants.rs):
the ChaCha8(seed=0) + rand-uniform pipeline must reproduce the Poseidon-GL
round-constant table bit-for-bit."""

from plonky2_goldibear_tpu.hash import _poseidon_gl_constants as C
from plonky2_goldibear_tpu.utils.generate_constants import (
    ChaCha8Rng, generate_poseidon_constants)


def test_round_constants_regenerate():
    assert generate_poseidon_constants() == list(C.ALL_ROUND_CONSTANTS)


def test_uniform_rejection_in_range():
    rng = ChaCha8Rng.seed_from_u64(123)
    p = 0xFFFFFFFF00000001
    vals = [rng.gen_range_u64(p) for _ in range(100)]
    assert all(0 <= v < p for v in vals)
    # small range exercises the zone rejection path
    small = [rng.gen_range_u64(10) for _ in range(100)]
    assert all(0 <= v < 10 for v in small)
