"""KeccakHash<N>: truncated Keccak-256 Merkle hasher + the hash-onion
pseudo-permutation used by the Fiat-Shamir challenger
(reference plonky2/src/hash/keccak.rs:14-126, hash_types.rs:269-275).

Digests are ``bytes`` of length HASH_SIZE (25 for Goldilocks) on the host
and (..., 25) uint8 arrays on device. Keccak trees are cheaper to verify
natively but not recursion-friendly; the reference uses them for outermost
proofs (KeccakGoldilocksConfig: Hasher=KeccakHash<25>,
InnerHasher=Poseidon64Hash — config.rs:208-216). Device Merkle levels run
the batched keccak-f[1600] kernel (keccak_device.py).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..field import gl
from ..field.host import GOLDILOCKS, FieldSpec
from ..utils.keccak import keccak256
from . import keccak_device as kd

HASH_SIZE = 25          # bytes, GL config (reference KeccakGoldilocksConfig)
DIGEST_IS_BYTES = True  # serde: digests are HASH_SIZE raw bytes (BytesHash)
WIDTH = 12
RATE = 8
F = gl                  # leaf field (digests are bytes, not field elements)


def _elems_to_bytes(elems: Sequence[int]) -> bytes:
    return b"".join(int(e).to_bytes(8, "little") for e in elems)


def hash_no_pad_host(elems: Sequence[int], n: int = HASH_SIZE) -> bytes:
    return keccak256(_elems_to_bytes(elems))[:n]


def two_to_one_host(left: bytes, right: bytes, n: int = HASH_SIZE) -> bytes:
    return keccak256(bytes(left) + bytes(right))[:n]


def hash_or_noop_host(elems: Sequence[int],
                      spec: FieldSpec = GOLDILOCKS,
                      n: int = HASH_SIZE) -> bytes:
    # noop-pack when the raw bytes fit in the digest (reference
    # hash/hashing.rs hash_or_noop: inputs.len() * 8 <= HASH_SIZE)
    if len(elems) * 8 <= n:
        packed = _elems_to_bytes(elems)
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


# -- batched device Merkle API (same protocol as poseidon_gl/poseidon2_bb:
#    hash_or_noop / two_to_one on arrays, digests as (..., 25) uint8) -------


def hash_or_noop(leaves: gl.GL):
    """GL leaf rows (n, leaf_len) -> (n, 25) uint8 digests."""
    leaf_len = leaves.shape[-1]
    msg = kd.gl_to_bytes(leaves)            # (n, leaf_len*8) u8
    if leaf_len * 8 <= HASH_SIZE:
        import jax.numpy as jnp
        padw = HASH_SIZE - leaf_len * 8
        zeros = jnp.zeros(msg.shape[:-1] + (padw,), dtype=jnp.uint8)
        return jnp.concatenate([msg, zeros], axis=-1)
    return kd.keccak256_bytes(msg)[..., :HASH_SIZE]


def two_to_one(left, right):
    """(n, 25) u8 x2 -> (n, 25) u8."""
    import jax.numpy as jnp
    return kd.keccak256_bytes(
        jnp.concatenate([left, right], axis=-1))[..., :HASH_SIZE]


def digests_host(arr) -> List[bytes]:
    """Device digest level (n, 25) u8 -> list of 25-byte digests."""
    mat = np.asarray(arr, dtype=np.uint8)
    return [bytes(row.tobytes()) for row in mat]
