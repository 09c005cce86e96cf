"""Poseidon round-constant generation (reference
plonky2/src/bin/generate_constants.rs:1-31): sample 12*30 uniform Goldilocks
elements from ChaCha8 seeded with 0, using the exact RNG pipeline of the
Rust `rand`/`rand_chacha` crates so the output reproduces
ALL_ROUND_CONSTANTS bit-for-bit (pinned by tests/test_generate_constants.py
against the extracted table):

- ``seed_from_u64``: rand_core's PCG32-based seed expansion
- ChaCha8 block function (8 rounds), 64-bit block counter, zero nonce
- ``next_u64``: two consecutive u32 buffer words, low half first
- ``gen_range(0..p)``: Lemire widening-multiply rejection sampling
"""

from __future__ import annotations

from typing import List

MASK32 = 0xFFFFFFFF
MASK64 = 0xFFFFFFFFFFFFFFFF


def _seed_from_u64(state: int) -> bytes:
    """rand_core::SeedableRng::seed_from_u64 (PCG32 expansion)."""
    mul = 6364136223846793005
    inc = 11634580027462260723
    out = bytearray()
    for _ in range(8):                      # 32-byte seed, 4 bytes per step
        state = (state * mul + inc) & MASK64
        xorshifted = (((state >> 18) ^ state) >> 27) & MASK32
        rot = state >> 59
        x = ((xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))) & MASK32
        out += x.to_bytes(4, "little")
    return bytes(out)


def _rotl32(x: int, n: int) -> int:
    return ((x << n) | (x >> (32 - n))) & MASK32


def _chacha_block(key_words: List[int], counter: int, rounds: int) -> List[int]:
    """One ChaCha block: 16 output u32 words (state + initial state)."""
    state = ([0x61707865, 0x3320646E, 0x79622D32, 0x6B206574]
             + key_words
             + [counter & MASK32, (counter >> 32) & MASK32, 0, 0])
    x = list(state)

    def quarter(a, b, c, d):
        x[a] = (x[a] + x[b]) & MASK32
        x[d] = _rotl32(x[d] ^ x[a], 16)
        x[c] = (x[c] + x[d]) & MASK32
        x[b] = _rotl32(x[b] ^ x[c], 12)
        x[a] = (x[a] + x[b]) & MASK32
        x[d] = _rotl32(x[d] ^ x[a], 8)
        x[c] = (x[c] + x[d]) & MASK32
        x[b] = _rotl32(x[b] ^ x[c], 7)

    for _ in range(rounds // 2):
        quarter(0, 4, 8, 12)
        quarter(1, 5, 9, 13)
        quarter(2, 6, 10, 14)
        quarter(3, 7, 11, 15)
        quarter(0, 5, 10, 15)
        quarter(1, 6, 11, 12)
        quarter(2, 7, 8, 13)
        quarter(3, 4, 9, 14)
    return [(a + b) & MASK32 for a, b in zip(x, state)]


class ChaCha8Rng:
    """rand_chacha::ChaCha8Rng word stream (block counter from 0)."""

    def __init__(self, seed: bytes):
        assert len(seed) == 32
        self.key = [int.from_bytes(seed[i:i + 4], "little")
                    for i in range(0, 32, 4)]
        self.counter = 0
        self.buf: List[int] = []

    @classmethod
    def seed_from_u64(cls, s: int) -> "ChaCha8Rng":
        return cls(_seed_from_u64(s))

    def next_u32(self) -> int:
        if not self.buf:
            self.buf = _chacha_block(self.key, self.counter, 8)
            self.counter += 1
        return self.buf.pop(0)

    def next_u64(self) -> int:
        lo = self.next_u32()
        hi = self.next_u32()
        return (hi << 32) | lo

    def gen_range_u64(self, end: int) -> int:
        """rand 0.8 UniformInt::<u64>::sample_single(0, end): Lemire
        widening-multiply with single-sample zone."""
        rng_range = end
        lz = 64 - rng_range.bit_length()
        zone = ((rng_range << lz) - 1) & MASK64
        while True:
            v = self.next_u64()
            m = v * rng_range            # 128-bit widening multiply
            hi, lo = m >> 64, m & MASK64
            if lo <= zone:
                return hi


GOLDILOCKS_P = 0xFFFFFFFF00000001
N_CONSTANTS = 12 * 30


def generate_poseidon_constants(n: int = N_CONSTANTS,
                                p: int = GOLDILOCKS_P) -> List[int]:
    rng = ChaCha8Rng.seed_from_u64(0)
    return [rng.gen_range_u64(p) for _ in range(n)]


def main():
    constants = generate_poseidon_constants()
    for i in range(0, len(constants), 4):
        chunk = constants[i:i + 4]
        print(" ".join(f"{c:#018x}," for c in chunk))


if __name__ == "__main__":
    main()
