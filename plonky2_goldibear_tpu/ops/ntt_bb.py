"""Fused BabyBear NTT Pallas kernel (the [NATIVE] FFT tier for BB).

Same stage structure as the Goldilocks kernel (ops/ntt.py — lane stages via
static rolls + iota-bit selects, sublane stages via block reshapes, one VMEM
pass for all log2(n) stages), but the arithmetic is a single uint32
Montgomery limb (field/bb.py): butterfly = one 32x32 mul + REDC + canonical
add/sub.  No lazy reduction is used anywhere — every stage value stays
canonical (< p), so the Goldilocks lazy-sub hazard class (ops/ntt.py:_canon)
cannot arise here.

Twiddles are stored in Montgomery form so mont_mul(mont(a), mont(w)) =
mont(a*w) keeps the whole transform in-domain; the jnp reference path
(field/fft.py + field/bb.py) uses the identical representation, so outputs
are bit-identical (integer NTTs are exact).

Reference parity: the packed-SIMD butterfly role of field/src/fft.rs:98-160
for the BabyBear field (monty-31, p3-baby-bear); the reference is generic
over both fields end-to-end (README.md:1-8).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import bb
from ..field import fft as jfft
from ..field import host
from . import poseidon_gl as _pk

LANES = 128
LANE_STAGES = 7
FUSE_LIMIT = 1 << 16             # max stacked elements per grid step

P_U32 = np.uint32(bb.P)
MU = bb.MU
R = bb.R


def _mul32(a, b):
    """32x32 -> 64 full product as (hi, lo) uint32 (16-bit partials)."""
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
    """Montgomery product of canonical residues: canonical output."""
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


@functools.lru_cache(maxsize=32)
def _twiddle_tables(n_log: int) -> Tuple[np.ndarray, ...]:
    """Montgomery-form twiddles: (tsmall (7,128) u32, tbig (sum_d,128) u32,
    per-stage row offsets) — layout identical to ops/ntt.py."""
    rows = jfft._root_rows_host("babybear", n_log)

    def mont(a):
        return ((a.astype(np.uint64) * np.uint64(R)) % np.uint64(bb.P)
                ).astype(np.uint32)

    tsmall = np.zeros((LANE_STAGES, LANES), dtype=np.uint32)
    for s in range(min(LANE_STAGES, n_log)):
        h = 1 << s
        j = np.arange(LANES)
        tsmall[s] = mont(rows[s][j % h])
    blocks = []
    offsets = {}
    off = 0
    for s in range(LANE_STAGES, n_log):
        h = 1 << s
        d = h // LANES
        blocks.append(mont(rows[s]).reshape(d, LANES))
        offsets[s] = (off, d)
        off += d
    tbig = (np.concatenate(blocks, axis=0) if blocks
            else np.zeros((1, LANES), dtype=np.uint32))
    return tsmall, tbig, tuple(sorted(offsets.items()))


def _ntt_stages(x, tsmall, tbig, offsets, n_log: int, start_stage: int = 0):
    """All DIT stages on a stacked (B*N/128, 128) u32 tile of bit-reversed
    polys (canonical Montgomery residues throughout)."""
    total_rows = x.shape[0]
    lane_bits = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    for s in range(start_stage, min(LANE_STAGES, n_log)):
        h = 1 << s
        w = tsmall[s:s + 1]                               # (1, 128)
        t_down = pltpu.roll(x, LANES - h, 1)              # [j] = x[j+h]
        t_up = pltpu.roll(x, h, 1)
        bit = ((lane_bits >> s) & 1) == 1
        a = jnp.where(bit, t_up, x)        # the even element of the pair
        b = jnp.where(bit, x, t_down)      # the odd element of the pair
        m = _mont_mul(b, w)
        x = jnp.where(bit, _sub(a, m), _add(a, m))

    for s in range(max(LANE_STAGES, start_stage), n_log):
        h = 1 << s
        d = h // LANES
        off = dict(offsets)[s][0]
        w = tbig[off:off + d].reshape(1, d, LANES)
        nb = total_rows // (2 * d)
        xv = x.reshape(nb, 2 * d, LANES)
        even = xv[:, :d]
        odd = xv[:, d:]
        m = _mont_mul(odd, w)
        x = jnp.concatenate([_add(even, m), _sub(even, m)],
                            axis=1).reshape(total_rows, LANES)
    return x


def _ntt_kernel(ts, tb, x_ref, o_ref, *, n_log, offsets, start_stage=0):
    o_ref[:] = _ntt_stages(x_ref[:], ts[:], tb[:], offsets, n_log,
                           start_stage)


@functools.partial(jax.jit, static_argnames=("n_log", "start_stage"))
def _fft_fused(x, n_log: int, start_stage: int = 0):
    """Batched BB NTT of bit-reversed input; x u32 (B, N), N = 128..FUSE_LIMIT."""
    b_count, n = x.shape
    assert n == 1 << n_log and n >= LANES
    rows_per_poly = n // LANES
    pad_b = 0
    if rows_per_poly < 8:
        k = 8 // rows_per_poly
        pad_b = (-b_count) % k
        if pad_b:
            x = jnp.concatenate(
                [x, jnp.zeros((pad_b, n), jnp.uint32)], axis=0)
            b_count += pad_b
    b_tile = 1
    while (b_tile * 2 <= b_count and b_count % (b_tile * 2) == 0
           and b_tile * 2 * n <= FUSE_LIMIT):
        b_tile *= 2
    assert b_tile * rows_per_poly >= 8 or b_tile == b_count, \
        (b_count, n, b_tile)
    grid = (b_count // b_tile,)
    tile_rows = b_tile * rows_per_poly

    tsmall_np, tbig_np, offsets = _twiddle_tables(n_log)
    x2 = x.reshape(b_count * rows_per_poly, LANES)
    dspec = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    osh = jax.ShapeDtypeStruct((b_count * rows_per_poly, LANES), jnp.uint32)
    kern = functools.partial(_ntt_kernel, n_log=n_log, offsets=offsets,
                             start_stage=start_stage)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[cspec, cspec, dspec],
        out_specs=dspec,
        out_shape=osh,
        interpret=_pk._INTERPRET,
    )(jnp.asarray(tsmall_np), jnp.asarray(tbig_np), x2)
    out = out.reshape(b_count, n)
    if pad_b:
        out = out[:b_count - pad_b]
    return out


def fft(x, zero_prefix_log: int = 0):
    """Forward BB NTT over the last axis of u32 (..., N): natural order
    in/out, bit-exact to field/fft.py:fft(bb, x)."""
    shape = x.shape
    n = shape[-1]
    n_log = host.log2_strict(n)
    flat = x.reshape(-1, n)
    if n <= FUSE_LIMIT:
        r = zero_prefix_log
        if r:
            n_small = n >> r
            small = flat[..., :n_small]
            small = jfft.reverse_index_bits(small, axis=-1)
            rev = jnp.repeat(small, 1 << r, axis=-1)
        else:
            rev = jfft.reverse_index_bits(flat, axis=-1)
        out = _fft_fused(rev, n_log, start_stage=zero_prefix_log)
    else:
        out = _fft_four_step(flat, n_log)
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# four-step decomposition for N > FUSE_LIMIT
# ---------------------------------------------------------------------------


def _four_step_twiddles(n_log: int, r: int, c: int):
    """T[k1, i2] = w_N^(k1*i2) (Montgomery form, traced cumprod ladder —
    see ops/ntt.py:_four_step_twiddles for why not eager under the tunnel)."""
    w = host.BABYBEAR.two_adic_generator(n_log)
    pw = jfft.powers(bb, w, c)                      # (c,) mont
    tiled = jnp.broadcast_to(pw, (r - 1, c))
    body = bb.cumprod(tiled, axis=0)                # row k = pw^(k+1)
    return jnp.concatenate([bb.ones((1, c)), body], axis=0)


def _fft_four_step(x, n_log: int):
    b_count, n = x.shape
    r_log = n_log // 2
    c_log = n_log - r_log
    assert 7 <= r_log and c_log <= host.log2_strict(FUSE_LIMIT), n_log
    r, c = 1 << r_log, 1 << c_log
    A = x.reshape(b_count, r, c)
    At = A.transpose(0, 2, 1)                       # (B, c, r)
    Bt = fft(At)                                    # NTT along r per column
    T = _four_step_twiddles(n_log, r, c)            # (r, c)
    Bt = bb.mul(Bt, T.T[None])
    Bv = Bt.transpose(0, 2, 1)                      # (B, r, c)
    D = fft(Bv)                                     # row NTTs along c
    return D.transpose(0, 2, 1).reshape(b_count, n)
