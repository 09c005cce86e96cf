"""Batched Keccak-f[1600] + Keccak-256 on device (jnp).

TPU-native counterpart of the keccak-hash crate the reference's
KeccakGoldilocksConfig Merkle trees use (plonky2/src/hash/keccak.rs:104-126).
Keccak is pure 64-bit XOR/rotate/AND-NOT — represented here as pairs of
uint32 lane planes, batched over N independent messages, so one Merkle level
(or one leaf batch) is a single fused elementwise kernel on the VPU.

State layout: two (..., 25) uint32 arrays (lo, hi), lane i = x + 5*y.
Messages are (..., L) uint8 arrays with static L (static shapes keep XLA
happy; every call site hashes fixed-size rows).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.keccak import _RC, _ROT

U8 = jnp.uint8
U32 = jnp.uint32

RATE_BYTES = 136          # Keccak-256: 1088-bit rate
RATE_LANES = RATE_BYTES // 8

# round constants as (lo, hi) u32 pairs, scan inputs
_RC_LO = np.array([rc & 0xFFFFFFFF for rc in _RC], dtype=np.uint32)
_RC_HI = np.array([rc >> 32 for rc in _RC], dtype=np.uint32)
# rotation offset for lane i = x + 5*y
_ROT_I = [_ROT[i % 5][i // 5] for i in range(25)]


def _rotl64(lo, hi, r: int):
    """Rotate a (lo, hi) u32-pair u64 left by static r."""
    r %= 64
    if r == 0:
        return lo, hi
    if r >= 32:
        lo, hi = hi, lo
        r -= 32
    if r == 0:
        return lo, hi
    s = np.uint32(r)
    t = np.uint32(32 - r)
    return (lo << s) | (hi >> t), (hi << s) | (lo >> t)


def _round(lanes, rc):
    """One Keccak round on 25 (lo, hi) pairs (lists of length 25)."""
    lo, hi = lanes
    # theta
    clo = [lo[x] ^ lo[x + 5] ^ lo[x + 10] ^ lo[x + 15] ^ lo[x + 20]
           for x in range(5)]
    chi_ = [hi[x] ^ hi[x + 5] ^ hi[x + 10] ^ hi[x + 15] ^ hi[x + 20]
            for x in range(5)]
    dlo, dhi = [], []
    for x in range(5):
        rl, rh = _rotl64(clo[(x + 1) % 5], chi_[(x + 1) % 5], 1)
        dlo.append(clo[(x - 1) % 5] ^ rl)
        dhi.append(chi_[(x - 1) % 5] ^ rh)
    lo = [lo[i] ^ dlo[i % 5] for i in range(25)]
    hi = [hi[i] ^ dhi[i % 5] for i in range(25)]
    # rho + pi: B[y + 5*((2x+3y)%5)] = rotl(A[x + 5y], rot[x][y])
    blo, bhi = [None] * 25, [None] * 25
    for x in range(5):
        for y in range(5):
            src = x + 5 * y
            dst = y + 5 * ((2 * x + 3 * y) % 5)
            blo[dst], bhi[dst] = _rotl64(lo[src], hi[src], _ROT_I[src])
    # chi
    lo = [blo[x + 5 * y] ^ (~blo[(x + 1) % 5 + 5 * y]
                            & blo[(x + 2) % 5 + 5 * y])
          for y in range(5) for x in range(5)]
    hi = [bhi[x + 5 * y] ^ (~bhi[(x + 1) % 5 + 5 * y]
                            & bhi[(x + 2) % 5 + 5 * y])
          for y in range(5) for x in range(5)]
    # iota
    lo[0] = lo[0] ^ rc[0]
    hi[0] = hi[0] ^ rc[1]
    return (lo, hi)


def keccak_f(state_lo, state_hi):
    """Batched keccak-f[1600]: (..., 25) u32 x2 -> same, scan over rounds."""

    def body(carry, rc):
        lo, hi = carry
        lanes = ([lo[..., i] for i in range(25)],
                 [hi[..., i] for i in range(25)])
        olo, ohi = _round(lanes, rc)
        return (jnp.stack(olo, axis=-1), jnp.stack(ohi, axis=-1)), None

    (lo, hi), _ = jax.lax.scan(
        body, (state_lo, state_hi),
        (jnp.asarray(_RC_LO), jnp.asarray(_RC_HI)))
    return lo, hi


def _bytes_to_lanes(block):
    """(..., 136) u8 -> (..., 17) u32 lo, hi."""
    b = block.astype(U32).reshape(*block.shape[:-1], RATE_LANES, 8)
    lo = (b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16)
          | (b[..., 3] << 24))
    hi = (b[..., 4] | (b[..., 5] << 8) | (b[..., 6] << 16)
          | (b[..., 7] << 24))
    return lo, hi


def _lanes_to_bytes(lo, hi):
    """(..., k) u32 x2 -> (..., 8k) u8."""
    parts = [lo & 0xFF, (lo >> 8) & 0xFF, (lo >> 16) & 0xFF, lo >> 24,
             hi & 0xFF, (hi >> 8) & 0xFF, (hi >> 16) & 0xFF, hi >> 24]
    out = jnp.stack(parts, axis=-1).astype(U8)
    return out.reshape(*lo.shape[:-1], lo.shape[-1] * 8)


def keccak256_bytes(msg):
    """Batched Keccak-256 (0x01 padding): (..., L) u8 -> (..., 32) u8.

    L is static; padding/absorption unroll over ceil((L+1)/136) blocks.
    """
    L = msg.shape[-1]
    nblocks = (L + 1 + RATE_BYTES - 1) // RATE_BYTES
    padded_len = nblocks * RATE_BYTES
    pad = np.zeros(padded_len - L, dtype=np.uint8)
    pad[0] ^= 0x01
    pad[-1] ^= 0x80
    batch = msg.shape[:-1]
    full = jnp.concatenate(
        [msg, jnp.broadcast_to(jnp.asarray(pad), batch + pad.shape)],
        axis=-1)

    lo = jnp.zeros(batch + (25,), dtype=U32)
    hi = jnp.zeros(batch + (25,), dtype=U32)
    for blk in range(nblocks):
        block = full[..., blk * RATE_BYTES:(blk + 1) * RATE_BYTES]
        blo, bhi = _bytes_to_lanes(block)
        lo = lo.at[..., :RATE_LANES].set(lo[..., :RATE_LANES] ^ blo)
        hi = hi.at[..., :RATE_LANES].set(hi[..., :RATE_LANES] ^ bhi)
        lo, hi = keccak_f(lo, hi)
    return _lanes_to_bytes(lo[..., :4], hi[..., :4])


def gl_to_bytes(gl_arr):
    """GL array (..., n) -> canonical little-endian bytes (..., 8n)."""
    return _lanes_to_bytes(gl_arr.lo, gl_arr.hi)
