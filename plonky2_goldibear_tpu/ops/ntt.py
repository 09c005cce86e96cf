"""Fused Goldilocks NTT Pallas kernel (the [NATIVE] FFT tier).

The jnp NTT in ``field/fft.py`` runs one XLA pass per butterfly stage —
log2(n) full HBM round trips.  This kernel runs ALL stages of a poly (or a
stacked batch of polys) in one VMEM pass, the TPU analog of the reference's
packed-SIMD butterfly kernel (field/src/fft.rs:98-160).

Layout: a length-N poly is viewed as an (N/128, 128) u32-limb tile — element
i at (i//128, i%128).  DIT butterflies on bit-reversed input pair elements
i, i+h:

- h < 128 (lane stages): partners sit in the same row; pair via two static
  lane-rolls + an iota-bit select, twiddles are one broadcast (1, 128) row.
- h >= 128 (sublane stages): partners are h/128 rows apart; pair via a
  sublane reshape (nb, 2d, 128) -> even/odd halves, exactly the jnp stage
  structure but on VMEM values.  Twiddles are a (d, 128) block broadcast over
  the block dim.

Multiple polys are stacked along rows (poly stride N/128 is a multiple of
every block size, so stage reshapes never mix polys).  Bit-reversal and
coset/LDE scaling stay outside in XLA (cheap gathers/elementwise against the
fused stage pipeline).

For N > FUSE_LIMIT (VMEM cap) the transform runs as a four-step NTT at the
XLA level: column NTTs -> twiddle matrix -> transpose -> row NTTs, each
column/row pass a stacked invocation of this kernel.  Integer NTTs are exact,
so any decomposition is bit-identical to field/fft.py:fft (tested).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import fft as jfft
from ..field import host
from ..field.gl import GL
from ..field import gl
from .poseidon_gl import _mul, _INTERPRET as _  # noqa: F401  (shared limb mul)
from . import poseidon_gl as _pk

LANES = 128
LANE_STAGES = 7                  # h = 1..64 handled by lane rolls
FUSE_LIMIT = 1 << 16             # max stacked elements per grid step
# (Mosaic compile time grows superlinearly with the fused size: 2^16 ~ 14 s,
# 2^18 -> minutes; larger transforms run as a batched four-step instead)


@functools.lru_cache(maxsize=32)
def _twiddle_tables(n_log: int) -> Tuple[np.ndarray, ...]:
    """(tsmall (7,128), tbig (sum_d,128), per-stage row offsets) as u64."""
    rows = jfft._root_rows_host("goldilocks", n_log)
    tsmall = np.zeros((LANE_STAGES, LANES), dtype=np.uint64)
    for s in range(min(LANE_STAGES, n_log)):
        h = 1 << s
        j = np.arange(LANES)
        tsmall[s] = rows[s][j % h]
    blocks = []
    offsets = {}
    off = 0
    for s in range(LANE_STAGES, n_log):
        h = 1 << s
        d = h // LANES
        blocks.append(rows[s].reshape(d, LANES))
        offsets[s] = (off, d)
        off += d
    tbig = (np.concatenate(blocks, axis=0) if blocks
            else np.zeros((1, LANES), dtype=np.uint64))
    return tsmall, tbig, tuple(sorted(offsets.items()))


def _limbs(a: np.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return (jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32)),
            jnp.asarray((a >> np.uint64(32)).astype(np.uint32)))


def _canon(a: GL) -> GL:
    """One conditional subtract of p: [0, 2^64) lazy -> canonical (< p).

    The butterfly's gl.add/gl.sub are only exact when their operands keep
    the sum below 2^64 + p (add) resp. the difference above -p (sub);
    a lazy _mul output in [p, 2^64) fed to gl.sub(a, m) with small a wraps
    a second time and corrupts the result by 2^32-1.  Real prover columns
    (sigmas) are full of zeros, which makes a = 0 common and turned this
    into the round-3 on-TPU vanishing-check failure (bisect matrix in
    /tmp/bisect_tpu.log; minimal repro scripts/shrink_ntt_fail.py).
    Canonicalizing m restores the invariant that every stage value is < p,
    which makes both gl.add and gl.sub exact (4 extra VPU ops per butterfly
    against the ~30-op limb multiply)."""
    lo, hi = gl._cond_sub_p(a.lo, a.hi, gl._geq_p(a.lo, a.hi))
    return GL(lo, hi)


def _ntt_stages(x: GL, tsmall: GL, tbig: GL, offsets, n_log: int,
                rows_per_poly: int, start_stage: int = 0) -> GL:
    """All DIT stages on a stacked (B*N/128, 128) tile of bit-reversed polys."""
    total_rows = x.lo.shape[0]
    lane_bits = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    for s in range(start_stage, min(LANE_STAGES, n_log)):
        h = 1 << s
        w = GL(tsmall.lo[s:s + 1], tsmall.hi[s:s + 1])      # (1, 128)
        t_down = GL(pltpu.roll(x.lo, LANES - h, 1),
                    pltpu.roll(x.hi, LANES - h, 1))          # [j] = x[j+h]
        t_up = GL(pltpu.roll(x.lo, h, 1), pltpu.roll(x.hi, h, 1))
        bit = ((lane_bits >> s) & 1) == 1
        a = gl.select(bit, t_up, x)        # the even element of the pair
        b = gl.select(bit, x, t_down)      # the odd element of the pair
        m = _canon(_mul(b, w))
        top = gl.add(a, m)
        bot = gl.sub(a, m)
        x = gl.select(bit, bot, top)

    for s in range(max(LANE_STAGES, start_stage), n_log):
        h = 1 << s
        d = h // LANES
        off = dict(offsets)[s][0]
        w = GL(tbig.lo[off:off + d].reshape(1, d, LANES),
               tbig.hi[off:off + d].reshape(1, d, LANES))
        nb = total_rows // (2 * d)
        xv = GL(x.lo.reshape(nb, 2 * d, LANES), x.hi.reshape(nb, 2 * d, LANES))
        even = GL(xv.lo[:, :d], xv.hi[:, :d])
        odd = GL(xv.lo[:, d:], xv.hi[:, d:])
        m = _canon(_mul(odd, w))
        top = gl.add(even, m)
        bot = gl.sub(even, m)
        x = GL(jnp.concatenate([top.lo, bot.lo], axis=1).reshape(total_rows, LANES),
               jnp.concatenate([top.hi, bot.hi], axis=1).reshape(total_rows, LANES))
    return x


def _ntt_kernel(ts_lo, ts_hi, tb_lo, tb_hi, x_lo, x_hi, o_lo, o_hi, *,
                n_log, rows_per_poly, offsets, start_stage=0):
    x = GL(x_lo[:], x_hi[:])
    out = _ntt_stages(x, GL(ts_lo[:], ts_hi[:]), GL(tb_lo, tb_hi),
                      offsets, n_log, rows_per_poly, start_stage)
    # one canonicalization at the end (stage arithmetic is lazy, < 2^64)
    lo, hi = gl._cond_sub_p(out.lo, out.hi, gl._geq_p(out.lo, out.hi))
    o_lo[:] = lo
    o_hi[:] = hi


@functools.partial(jax.jit, static_argnames=("n_log", "start_stage"))
def _fft_fused(x: GL, n_log: int, start_stage: int = 0) -> GL:
    """Batched NTT of bit-reversed input; x GL (B, N), N = 128..FUSE_LIMIT."""
    b_count, n = x.lo.shape
    assert n == 1 << n_log and n >= LANES
    rows_per_poly = n // LANES
    # Mosaic block floor: the sublane dim of a block must be a multiple of 8
    # (or the whole array).  For short polys (rows_per_poly < 8) pad the
    # batch with zero polys so a multiple-of-8-row tile always exists.
    pad_b = 0
    if rows_per_poly < 8:
        k = 8 // rows_per_poly
        pad_b = (-b_count) % k
        if pad_b:
            zz = jnp.zeros((pad_b, n), jnp.uint32)
            x = GL(jnp.concatenate([x.lo, zz], axis=0),
                   jnp.concatenate([x.hi, zz], axis=0))
            b_count += pad_b
    # pick the largest power-of-two batch tile that divides B within budget
    b_tile = 1
    while (b_tile * 2 <= b_count and b_count % (b_tile * 2) == 0
           and b_tile * 2 * n <= FUSE_LIMIT):
        b_tile *= 2
    assert b_tile * rows_per_poly >= 8 or b_tile == b_count, \
        (b_count, n, b_tile)
    grid = (b_count // b_tile,)
    tile_rows = b_tile * rows_per_poly

    tsmall_np, tbig_np, offsets = _twiddle_tables(n_log)
    ts_lo, ts_hi = _limbs(tsmall_np)
    tb_lo, tb_hi = _limbs(tbig_np)

    x2_lo = x.lo.reshape(b_count * rows_per_poly, LANES)
    x2_hi = x.hi.reshape(b_count * rows_per_poly, LANES)
    dspec = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    osh = jax.ShapeDtypeStruct((b_count * rows_per_poly, LANES), jnp.uint32)
    kern = functools.partial(_ntt_kernel, n_log=n_log,
                             rows_per_poly=rows_per_poly, offsets=offsets,
                             start_stage=start_stage)
    lo, hi = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[cspec, cspec, cspec, cspec, dspec, dspec],
        out_specs=(dspec, dspec),
        out_shape=(osh, osh),
        interpret=_pk._INTERPRET,
    )(ts_lo, ts_hi, tb_lo, tb_hi, x2_lo, x2_hi)
    out = GL(lo.reshape(b_count, n), hi.reshape(b_count, n))
    if pad_b:
        out = GL(out.lo[:b_count - pad_b], out.hi[:b_count - pad_b])
    return out


def fft(x: GL, zero_prefix_log: int = 0) -> GL:
    """Forward NTT over the last axis of GL (..., N): natural order in/out.

    Bit-exact to field/fft.py:fft(gl, x) — exercised by tests and by the
    oracle commit path on TPU.  ``zero_prefix_log`` = r skips the first r
    stages for LDE inputs (only the first N/2^r coefficients nonzero): those
    rounds reduce to replicating each coefficient over its 2^r-block.
    """
    shape = x.lo.shape
    n = shape[-1]
    n_log = host.log2_strict(n)
    flat = GL(x.lo.reshape(-1, n), x.hi.reshape(-1, n))
    if n <= FUSE_LIMIT:
        r = zero_prefix_log
        if r:
            n_small = n >> r
            small = GL(flat.lo[..., :n_small], flat.hi[..., :n_small])
            small = jfft.reverse_index_bits(small, axis=-1)
            rev = GL(jnp.repeat(small.lo, 1 << r, axis=-1),
                     jnp.repeat(small.hi, 1 << r, axis=-1))
        else:
            rev = jfft.reverse_index_bits(flat, axis=-1)
        out = _fft_fused(rev, n_log, start_stage=zero_prefix_log)
    else:
        out = _fft_four_step(flat, n_log)
    return GL(out.lo.reshape(shape), out.hi.reshape(shape))


# ---------------------------------------------------------------------------
# four-step decomposition for N > FUSE_LIMIT (the 2^24 bench case)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def _four_step_split(n_log: int) -> Tuple[int, int]:
    # balanced split: both factors must be >= 128 (kernel floor) and fuseable
    r_log = n_log // 2
    c_log = n_log - r_log
    assert 7 <= r_log and c_log <= host.log2_strict(FUSE_LIMIT), n_log
    return r_log, c_log


def _four_step_twiddles(n_log: int, r: int, c: int) -> GL:
    """T[k1, i2] = w_N^(k1*i2) as GL (r, c), as TRACED device ops (host power
    row + one on-device cumprod ladder).  Never build this eagerly: under the
    axon tunnel every eager primitive is a separate HTTP remote-compile round
    trip (see ops/ntt_mxu._twiddles)."""
    w = host.GOLDILOCKS.two_adic_generator(n_log)
    pw = jfft.powers(gl, w, c)                      # (c,) host constant
    tiled = GL(jnp.broadcast_to(pw.lo, (r - 1, c)),
               jnp.broadcast_to(pw.hi, (r - 1, c)))
    body = gl.cumprod(tiled, axis=0)                # row k = pw^(k+1)
    ones = gl.ones((1, c))
    return GL(jnp.concatenate([ones.lo, body.lo], axis=0),
              jnp.concatenate([ones.hi, body.hi], axis=0))


def _fft_four_step(x: GL, n_log: int) -> GL:
    """N = R*C: column NTTs -> twiddle -> row NTTs -> index transpose,
    batched over leading polys (the prover's big LDEs).

    X[k2*R + k1] = sum_i2 w_C^(i2 k2) [w_N^(i2 k1) sum_i1 A[i1,i2] w_R^(i1 k1)]
    """
    b_count, n = x.lo.shape
    r_log, c_log = _four_step_split(n_log)
    r, c = 1 << r_log, 1 << c_log
    A = GL(x.lo.reshape(b_count, r, c), x.hi.reshape(b_count, r, c))
    # column NTTs: transpose so columns become the transform axis
    At = GL(A.lo.transpose(0, 2, 1), A.hi.transpose(0, 2, 1))  # (B, c, r)
    Bt = fft(At)                                  # NTT along r per column
    T = _four_step_twiddles(n_log, r, c)          # (r, c)
    Bt = gl.mul(Bt, GL(T.lo.T[None], T.hi.T[None]))
    Bv = GL(Bt.lo.transpose(0, 2, 1), Bt.hi.transpose(0, 2, 1))  # (B, r, c)
    D = fft(Bv)                                   # row NTTs along c
    # X[k2*R + k1] = D[k1, k2] -> transpose -> flatten
    out = GL(D.lo.transpose(0, 2, 1).reshape(b_count, n),
             D.hi.transpose(0, 2, 1).reshape(b_count, n))
    return out
