"""Poseidon2-BabyBear width-16 Pallas kernel: the [NATIVE] BB hash tier.

One VMEM-resident pass runs the initial external layer plus all 8 full and
13 partial rounds on a (16, B) column batch — the BB analog of the
Goldilocks ``ops/poseidon_gl.py:_permute_cols`` kernel.  The arithmetic is
a single uint32 Montgomery limb (field/bb.py), so every op is canonical —
no lazy-reduction hazards.

The external linear layer is addition-only (M4 entries {1,2,3} become adds
and doublings, reference gates/poseidon2_babybear.rs:903-918), and the
internal layer multiplies by constants (INTERNAL_SCALE, 2^shift_i) — so a
round is dominated by the x^7 sbox (2 squarings + 2 Montgomery products).
Sums over the 16 state rows use log-depth pairwise modular adds on static
row slices (Mosaic has no u32 reductions).

Semantics are bit-identical to hash/poseidon2_bb.py:permute (the jnp
reference, KAT-tested against the reference's native evaluation
plonky2/src/gates/poseidon2_babybear.rs:700-860).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import bb
from ..hash import _poseidon2_bb_constants as C
from . import poseidon_gl as _pk

WIDTH = C.SPONGE_WIDTH            # 16
P_U32 = np.uint32(bb.P)
MU = bb.MU


def _mul32(a, b):
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    t01 = a0 * b1
    t10 = a1 * b0
    mid = ((a0 * b0) >> 16) + (t01 & 0xFFFF) + (t10 & 0xFFFF)
    lo = a * b
    hi = a1 * b1 + (t01 >> 16) + (t10 >> 16) + (mid >> 16)
    return hi, lo


def _mont_mul(a, b):
    hi, lo = _mul32(a, b)
    m = lo * MU
    mp_hi, _ = _mul32(m, jnp.full_like(m, P_U32))
    t = hi + mp_hi + (lo != 0).astype(jnp.uint32)
    return jnp.where(t >= P_U32, t - P_U32, t)


def _add(a, b):
    s = a + b
    return jnp.where(s >= P_U32, s - P_U32, s)


def _sub(a, b):
    d = a - b
    return jnp.where(a < b, d + P_U32, d)


def _sbox(x):
    x2 = _mont_mul(x, x)
    x3 = _mont_mul(x2, x)
    return _mont_mul(x3, _mont_mul(x2, x2))


def _external(state):
    """Blockwise M4 + congruence-class block sums on (16, B)."""
    blocks = []
    for i in range(0, WIDTH, 4):
        x0, x1, x2, x3 = (state[i + k:i + k + 1] for k in range(4))
        t01 = _add(x0, x1)
        t23 = _add(x2, x3)
        t0123 = _add(t01, t23)
        t01123 = _add(t0123, x1)
        t01233 = _add(t0123, x3)
        y3 = _add(t01233, _add(x0, x0))
        y1 = _add(t01123, _add(x2, x2))
        y0 = _add(t01123, t01)
        y2 = _add(t01233, t23)
        blocks.append((y0, y1, y2, y3))
    sums = [functools.reduce(_add, (blocks[j][k] for j in range(4)))
            for k in range(4)]
    rows = []
    for j in range(4):
        for k in range(4):
            rows.append(_add(blocks[j][k], sums[k]))
    return jnp.concatenate(rows, axis=0)


def _row_sum(state):
    """Log-depth modular sum over the 16 rows -> (1, B)."""
    x = state
    for half in (8, 4, 2, 1):
        x = _add(x[:half], x[half:2 * half])
    return x


@functools.lru_cache(maxsize=1)
def _mont_consts():
    def mont(v):
        return np.uint32(np.asarray(v, dtype=np.uint64) * np.uint64(bb.R)
                         % np.uint64(bb.P))

    ext = np.array([[int(mont(c)) for c in row]
                    for row in C.EXTERNAL_CONSTANTS],
                   dtype=np.uint32)[:, :, None]           # (8, 16, 1)
    internal = np.array([int(mont(c)) for c in C.INTERNAL_CONSTANTS],
                        dtype=np.uint32)[:, None, None]   # (13, 1, 1)
    scale = np.uint32(int(mont(C.INTERNAL_SCALE)))
    shifts = np.array([int(mont(1 << s)) for s in C.INTERNAL_DIAG_SHIFTS],
                      dtype=np.uint32)[:, None]           # (15, 1)
    return ext, internal, scale, shifts


def _permute_cols_body(ext_ref, int_ref, shifts_ref, state):
    scale = _mont_consts()[2]

    def full_round(r, st):
        st = _add(st, ext_ref[r])
        st = _sbox(st)
        return _external(st)

    def partial_round(r, st):
        s0 = _sbox(_add(st[0:1], int_ref[r]))
        st = jnp.concatenate([s0, st[1:]], axis=0)
        st = _mont_mul(st, jnp.full_like(st, scale))
        full = _row_sum(st)                     # sum of all 16 rows
        part = _sub(full, st[0:1])              # sum of rows 1..15
        head = _sub(part, st[0:1])
        tail = _add(jnp.broadcast_to(full, (WIDTH - 1, st.shape[1])),
                    _mont_mul(st[1:], shifts_ref[:]))
        return jnp.concatenate([head, tail], axis=0)

    state = _external(state)
    state = jax.lax.fori_loop(0, C.HALF_N_FULL_ROUNDS, full_round, state)
    state = jax.lax.fori_loop(0, C.N_PARTIAL_ROUNDS, partial_round, state)
    state = jax.lax.fori_loop(C.HALF_N_FULL_ROUNDS, C.N_FULL_ROUNDS_TOTAL,
                              full_round, state)
    return state


def _kernel(ext_ref, int_ref, shifts_ref, x_ref, o_ref):
    o_ref[:] = _permute_cols_body(ext_ref, int_ref, shifts_ref, x_ref[:])


B_TILE = 1 << 12   # lanes per grid step: 16 rows x 4096 x 4 B = 256 kB VMEM


@jax.jit
def permute_cols(state):
    """Full permutation on a (16, B) u32 Montgomery batch, B % 128 == 0."""
    w, b = state.shape
    assert w == WIDTH and b % 128 == 0, (w, b)
    ext, internal, _, shifts = _mont_consts()
    b_tile = b if b <= B_TILE else B_TILE
    while b % b_tile:
        b_tile //= 2
    grid = (b // b_tile,)
    dspec = pl.BlockSpec((WIDTH, b_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[cspec, cspec, cspec, dspec],
        out_specs=dspec,
        out_shape=jax.ShapeDtypeStruct((WIDTH, b), jnp.uint32),
        interpret=_pk._INTERPRET,
    )(jnp.asarray(ext), jnp.asarray(internal), jnp.asarray(shifts), state)
