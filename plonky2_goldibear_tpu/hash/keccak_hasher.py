"""KeccakHash<N>: truncated Keccak-256 Merkle hasher + the hash-onion
pseudo-permutation used by the Fiat-Shamir challenger
(reference plonky2/src/hash/keccak.rs:14-126, hash_types.rs:269-275).

Digests are ``bytes`` of length HASH_SIZE (25 for Goldilocks). Keccak trees
are cheaper to verify natively but not recursion-friendly; the reference
uses them for outermost proofs (KeccakGoldilocksConfig). Full prover
integration (inner/outer hasher split) lands in a later round — this module
provides the hash/permutation primitives and the host Merkle path.
"""

from __future__ import annotations

from typing import List, Sequence

from ..field.host import GOLDILOCKS, FieldSpec
from ..utils.keccak import keccak256

HASH_SIZE = 25          # bytes, GL config (reference KeccakGoldilocksConfig)
WIDTH = 12
RATE = 8


def _elems_to_bytes(elems: Sequence[int]) -> bytes:
    return b"".join(int(e).to_bytes(8, "little") for e in elems)


def hash_no_pad_host(elems: Sequence[int], n: int = HASH_SIZE) -> bytes:
    return keccak256(_elems_to_bytes(elems))[:n]


def two_to_one_host(left: bytes, right: bytes, n: int = HASH_SIZE) -> bytes:
    return keccak256(bytes(left) + bytes(right))[:n]


def hash_or_noop_host(elems: Sequence[int],
                      spec: FieldSpec = GOLDILOCKS,
                      n: int = HASH_SIZE) -> bytes:
    if len(elems) <= spec.num_hash_out_elts:
        packed = _elems_to_bytes(elems)
        assert len(packed) <= n, "noop packing would overflow the digest"
        return packed + b"\x00" * (n - len(packed))
    return hash_no_pad_host(elems, n)


def digest_to_elements(digest: bytes, spec: FieldSpec = GOLDILOCKS
                       ) -> List[int]:
    """BytesHash -> field elements by 7-byte (GL) / 3-byte (BB) chunks
    (reference hash_types.rs:269-275) — used when observing byte digests in
    the field-native challenger."""
    chunk = 7 if spec.bits > 32 else 3
    return [int.from_bytes(digest[i:i + chunk], "little")
            for i in range(0, len(digest), chunk)]


def permute_host(state: Sequence[int],
                 spec: FieldSpec = GOLDILOCKS) -> List[int]:
    """Hash-onion pseudo-permutation with rejection sampling into F
    (reference keccak.rs:63-98)."""
    assert len(state) == WIDTH
    state_bytes = _elems_to_bytes(state)
    out: List[int] = []
    while len(out) < WIDTH:
        state_bytes = keccak256(state_bytes)
        for i in range(0, 32, 8):
            word = int.from_bytes(state_bytes[i:i + 8], "little")
            if word < spec.p and len(out) < WIDTH:
                out.append(word)
    return out


def merkle_root_host(leaves: List[List[int]], cap_height: int,
                     spec: FieldSpec = GOLDILOCKS):
    """Host Merkle-with-cap over byte digests."""
    level = [hash_or_noop_host(leaf, spec) for leaf in leaves]
    import math
    depth = level and int(math.log2(len(level))) or 0
    for _ in range(depth - cap_height):
        level = [two_to_one_host(level[2 * i], level[2 * i + 1])
                 for i in range(len(level) // 2)]
    return level
