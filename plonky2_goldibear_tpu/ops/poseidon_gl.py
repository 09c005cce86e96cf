"""Fused Poseidon-Goldilocks Pallas kernels (the [NATIVE] hashing tier).

The jnp device path in ``hash/poseidon_gl.py`` materializes the 12-lane state
to HBM after every one of the 30 rounds (and after every sponge absorb); at
2^13+ leaf batches that is ~50x more HBM traffic than the state itself.  These
kernels keep the whole permutation (and the whole 17-permute leaf sponge) in
VMEM, mirroring the role of the reference's hand-fused AVX2 permutation
(plonky2/src/hash/arch/x86_64/poseidon_goldilocks_avx2_bmi2.rs — one register-
resident round pipeline).

Layout: column-major.  A batch of B states is GL (12, B) — batch along the
128-wide lane axis, the 12 state elements along sublanes — so every
elementwise sbox op runs at full lane occupancy and the MDS layer is a
contraction over sublanes.

MDS strategy (TPU-first): the MDS circulant row sums are 256 (+8 on the
diagonal), so a 16-bit limb plane contracted with the 12x12 matrix stays
< 256 * (2^16 - 1) < 2^24 — exactly representable in f32.  We therefore run
the MDS as ONE fp32 (12,12)@(12,4B) matmul on the MXU (precision=HIGHEST,
exact for 24-bit integers), handling the single diagonal entry (+8 on lane 0)
on the VPU in i32.  The MXU is otherwise idle during hashing, so the MDS
becomes nearly free and the VPU budget is spent on the x^7 sbox limb math.

Semantics are identical to hash/poseidon_gl.py:permute (naive schedule,
reference plonky2/src/hash/poseidon_goldilocks.rs:95-108) — tested bit-exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import gl
from ..field.gl import GL
from ..hash import _poseidon_gl_constants as C

WIDTH = C.SPONGE_WIDTH      # 12
RATE = C.SPONGE_RATE        # 8
NUM_HASH_OUT = 4
HALF_FULL = C.HALF_N_FULL_ROUNDS          # 4
N_PARTIAL = C.N_PARTIAL_ROUNDS            # 22
N_ROUNDS = 2 * HALF_FULL + N_PARTIAL      # 30

# Round constants as (30, 12, 1) u32 limb planes (broadcast against (12, B)).
# Kept as NUMPY at module level: this module is imported lazily from inside
# jit traces (the hash-layer dispatch), and a module-level jnp.asarray would
# then be created as an inner-trace constant and leak as a stale tracer into
# every later trace.  jnp conversion happens per call in _consts().
_RC = np.array(C.ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(N_ROUNDS, WIDTH, 1)
_RC_LO_NP = (_RC & 0xFFFFFFFF).astype(np.uint32)
_RC_HI_NP = (_RC >> 32).astype(np.uint32)
# Round constants as 16-bit planes (30, 4, 12, 1) i32: rc(r+1) is added in
# the MDS epilogue's i32 plane stage (one i32 add per plane instead of a
# 15-op u64 modular add per element).  Row r holds rc of round r+1; the last
# row is zero (no constant after the final round's MDS).
_RC16_NP = np.zeros((N_ROUNDS, 4, WIDTH, 1), dtype=np.int32)
for _k in range(4):
    _RC16_NP[:N_ROUNDS - 1, _k] = (
        (_RC[1:] >> np.uint64(16 * _k)) & np.uint64(0xFFFF)).astype(np.int32)

# MDS circulant as a dense (12, 12) f32 matrix, diagonal handled separately.
_CIRC = np.zeros((WIDTH, WIDTH), dtype=np.float32)
for _r in range(WIDTH):
    for _j in range(WIDTH):
        _CIRC[_r, _j] = C.MDS_MATRIX_CIRC[(_j - _r) % WIDTH]
_DIAG0 = int(C.MDS_MATRIX_DIAG[0])  # 8; all other diagonal entries are 0
assert all(d == 0 for d in C.MDS_MATRIX_DIAG[1:])


def _reduce128_nc(n0, n1, n2, n3) -> GL:
    """gl._reduce128 without the final canonical subtraction.

    Output is < 2^64 and correct mod p; every in-kernel consumer (the 16-bit
    plane splits and the next multiplication) accepts any u64, so we
    canonicalize only once at permutation exit instead of after each of the
    ~400 multiplies.
    """
    t0lo, t0hi, borrow = gl._sub64(n0, n1, n3, jnp.zeros_like(n3))
    adj = jnp.where(borrow != 0, gl.MASK32, np.uint32(0))
    nlo = t0lo - adj
    nb = (t0lo < adj).astype(jnp.uint32)
    t0lo, t0hi = nlo, t0hi - nb
    t1lo = jnp.zeros_like(n2) - n2
    t1hi = n2 - (n2 != 0).astype(jnp.uint32)
    lo, hi, carry = gl._add64(t0lo, t0hi, t1lo, t1hi)
    adj = jnp.where(carry != 0, gl.MASK32, np.uint32(0))
    nlo = lo + adj
    c = (nlo < lo).astype(jnp.uint32)
    return GL(nlo, hi + c)


def _mul(a: GL, b: GL) -> GL:
    """gl.mul with the lazy (non-canonical) reduction."""
    ll_hi, ll_lo = gl._mul32(a.lo, b.lo)
    lh_hi, lh_lo = gl._mul32(a.lo, b.hi)
    hl_hi, hl_lo = gl._mul32(a.hi, b.lo)
    hh_hi, hh_lo = gl._mul32(a.hi, b.hi)
    n0 = ll_lo
    t1 = ll_hi + lh_lo
    c1a = (t1 < ll_hi).astype(jnp.uint32)
    n1 = t1 + hl_lo
    c1b = (n1 < t1).astype(jnp.uint32)
    t2 = lh_hi + hl_hi
    c2a = (t2 < lh_hi).astype(jnp.uint32)
    t2b = t2 + hh_lo
    c2b = (t2b < t2).astype(jnp.uint32)
    carry12 = c1a + c1b
    n2 = t2b + carry12
    c2c = (n2 < t2b).astype(jnp.uint32)
    n3 = hh_hi + c2a + c2b + c2c
    return _reduce128_nc(n0, n1, n2, n3)


def _sqr(a: GL) -> GL:
    """Goldilocks squaring: one fewer 32x32 product than gl.mul."""
    lo, hi = a.lo, a.hi
    ll_hi, ll_lo = gl._mul32(lo, lo)
    lh_hi, lh_lo = gl._mul32(lo, hi)
    hh_hi, hh_lo = gl._mul32(hi, hi)
    # n = ll + 2*lh*2^32 + hh*2^64
    n0 = ll_lo
    t1 = lh_lo + lh_lo
    c1a = lh_lo >> 31                      # carry of the doubling
    n1 = ll_hi + t1
    c1b = (n1 < ll_hi).astype(jnp.uint32)
    t2 = lh_hi + lh_hi
    c2a = lh_hi >> 31
    t2b = t2 + hh_lo
    c2b = (t2b < t2).astype(jnp.uint32)
    n2 = t2b + c1a + c1b
    c2c = (n2 < t2b).astype(jnp.uint32)
    n3 = hh_hi + c2a + c2b + c2c
    return _reduce128_nc(n0, n1, n2, n3)


def _sbox(x: GL) -> GL:
    x2 = _sqr(x)
    x3 = _mul(x2, x)
    x4 = _sqr(x2)
    return _mul(x3, x4)


def _mds_cols(state: GL, circ, rc16=None) -> GL:
    """MDS on a (12, B) column batch: fp32 MXU matmul over 16-bit limb planes.

    Plane sums are < 256*(2^16-1) < 2^24, exact in f32 at HIGHEST precision.
    The diagonal +8 on row 0 is added in integer afterwards, as is the next
    round's constant (``rc16``: (4, 12, 1) i32 planes) — one i32 add per
    plane replaces a 15-op u64 modular add per element.
    """
    b = state.lo.shape[-1]
    # Mosaic has no u32->f32 cast; values are < 2^16 so go through i32.
    planes = [
        (state.lo & 0xFFFF).astype(jnp.int32).astype(jnp.float32),
        (state.lo >> 16).astype(jnp.int32).astype(jnp.float32),
        (state.hi & 0xFFFF).astype(jnp.int32).astype(jnp.float32),
        (state.hi >> 16).astype(jnp.int32).astype(jnp.float32),
    ]
    x = jnp.concatenate(planes, axis=1)                  # (12, 4B) f32
    y = jax.lax.dot_general(
        circ, x, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)              # (12, 4B), < 2^24
    accs = []
    d = jnp.int32(_DIAG0)
    for k in range(4):
        a = y[:, k * b:(k + 1) * b].astype(jnp.int32)
        # diagonal: out[0] += 8 * state[0], per 16-bit plane
        row0 = a[0:1] + d * planes[k][0:1].astype(jnp.int32)
        a = jnp.concatenate([row0, a[1:]], axis=0)
        if rc16 is not None:
            a = a + rc16[k]
        accs.append(a.astype(jnp.uint32))
    a0, a1, a2, a3 = accs
    # recombine a0 + a1*2^16 + a2*2^32 + a3*2^48  (< 2^75) into 96-bit words
    a1lo, a1hi = a1 << 16, a1 >> 16
    a3lo, a3hi = a3 << 16, a3 >> 16
    n0 = a0 + a1lo
    c0 = (n0 < a0).astype(jnp.uint32)
    n1a = a2 + a1hi + c0
    n1 = n1a + a3lo
    c1 = (n1 < n1a).astype(jnp.uint32)
    n2 = a3hi + c1
    return _reduce128_nc(n0, n1, n2, jnp.zeros_like(n2))


def _permute_cols(state: GL, consts) -> GL:
    """The full 30-round permutation on a (12, B) batch, VMEM-resident.

    ``consts`` = (rc_lo_ref, rc_hi_ref, rc16_ref, circ): round-constant VMEM
    refs (indexed per round — Mosaic supports dynamic indexing only on refs,
    not on loaded values) and the loaded circulant matrix.

    Round schedule is rc-folded: rc(0) is added once at entry (u64 add),
    then every round is sbox -> MDS-with-rc(r+1)-epilogue, bit-identical to
    the reference's add_rc -> sbox -> MDS order.
    """
    rc_lo_ref, rc_hi_ref, rc16_ref, circ = consts

    state = gl.add(state, GL(rc_lo_ref[0], rc_hi_ref[0]))

    def full_round(r, state: GL) -> GL:
        state = _sbox(state)
        return _mds_cols(state, circ, rc16_ref[r])

    def partial_round(r, state: GL) -> GL:
        b = state.lo.shape[-1]
        s0 = GL(state.lo[0:1], state.hi[0:1])
        if b >= 1024:
            # (1, B) wastes 7/8 sublanes on every sbox op; fold lanes into
            # sublanes for the single-row x^7 (8x fewer vector instructions).
            # Mosaic can't shape-cast (1,B)->(8,B/8); use strided lane-rolls:
            # fold row k <- lanes [k*c,(k+1)*c), unfold via disjoint-row sum.
            c = b // 8
            rows = jax.lax.broadcasted_iota(jnp.int32, (8, b), 0)

            def roll_by_row(x, base):
                # shift row k right by k*base (mod b).  pltpu.roll's stride=
                # mode miscompiles for strides that are multiples of 128, so
                # decompose k into bits: 3 plain rolls + row-mask selects.
                for j in range(3):
                    s = (base << j) % b
                    if s == 0:
                        continue
                    rolled = pltpu.roll(x, s, 1)
                    x = jnp.where((rows >> j) & 1 == 1, rolled, x)
                return x

            def fold(v):
                x8 = jnp.concatenate([v] * 8, axis=0)
                return roll_by_row(x8, b - c)[:, :c]

            def unfold(v):
                p = jnp.concatenate(
                    [v, jnp.zeros((8, b - c), v.dtype)], axis=1)
                p = roll_by_row(p, c)
                # u32 reductions are unimplemented in Mosaic; rows are
                # disjoint so an i32 bitwise-exact sum is fine
                s = jnp.sum(p.astype(jnp.int32), axis=0, keepdims=True)
                return s.astype(jnp.uint32)

            s0 = GL(fold(s0.lo), fold(s0.hi))
            s0 = _sbox(s0)
            s0 = GL(unfold(s0.lo), unfold(s0.hi))
        else:
            s0 = _sbox(s0)
        state = GL(jnp.concatenate([s0.lo, state.lo[1:]], axis=0),
                   jnp.concatenate([s0.hi, state.hi[1:]], axis=0))
        return _mds_cols(state, circ, rc16_ref[r])

    state = jax.lax.fori_loop(0, HALF_FULL, full_round, state)
    state = jax.lax.fori_loop(HALF_FULL, HALF_FULL + N_PARTIAL,
                              partial_round, state)
    state = jax.lax.fori_loop(HALF_FULL + N_PARTIAL, N_ROUNDS,
                              full_round, state)
    # single canonicalization for the whole permutation (lazy reduction)
    lo, hi = gl._cond_sub_p(state.lo, state.hi,
                            gl._geq_p(state.lo, state.hi))
    return GL(lo, hi)


# --------------------------------------------------------------------------
# Kernels
# --------------------------------------------------------------------------

_INTERPRET = False  # set True to debug on CPU


def _const_specs():
    cs = pl.BlockSpec(memory_space=pltpu.VMEM)
    return [cs, cs, cs, cs]


def _consts():
    return (jnp.asarray(_RC_LO_NP), jnp.asarray(_RC_HI_NP),
            jnp.asarray(_RC16_NP), jnp.asarray(_CIRC))


def _permute_kernel(rc_lo_ref, rc_hi_ref, rc16_ref, circ_ref, lo_ref, hi_ref,
                    out_lo_ref, out_hi_ref):
    consts = (rc_lo_ref, rc_hi_ref, rc16_ref, circ_ref[:])
    out = _permute_cols(GL(lo_ref[:], hi_ref[:]), consts)
    out_lo_ref[:] = out.lo
    out_hi_ref[:] = out.hi


def _pick_tile(n: int, cap: int) -> int:
    """Largest power-of-two tile <= cap that divides n (n % 128 == 0)."""
    t = 128
    while t * 2 <= cap and n % (t * 2) == 0:
        t *= 2
    return min(t, n)


@functools.partial(jax.jit, static_argnames=("tile",))
def permute_cols(state: GL, tile: int | None = None) -> GL:
    """Batched permutation; state GL (12, N) with N a multiple of 128."""
    n = state.lo.shape[-1]
    if tile is None:
        # double-buffered (12, tile) u32 in/out planes + ~40 temp arrays of
        # (12, tile) u32 during the sbox chain: keep the worst case < 12 MB
        tile = _pick_tile(n, 4096)
    tile = min(tile, n)
    assert n % tile == 0, (n, tile)
    grid = (n // tile,)
    spec = pl.BlockSpec((WIDTH, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((WIDTH, tile * grid[0]), jnp.uint32)
    lo, hi = pl.pallas_call(
        _permute_kernel,
        grid=grid,
        in_specs=_const_specs() + [spec, spec],
        out_specs=(spec, spec),
        out_shape=(out_shape, out_shape),
        interpret=_INTERPRET,
    )(*_consts(), state.lo, state.hi)
    return GL(lo, hi)


def _leaves_kernel(rc_lo_ref, rc_hi_ref, rc16_ref, circ_ref, lo_ref, hi_ref,
                   out_lo_ref, out_hi_ref, *, leaf_len):
    """Overwrite-mode sponge over a (leaf_len, B) column batch, all in VMEM."""
    b = lo_ref.shape[-1]
    n_full = leaf_len // RATE
    rem = leaf_len - n_full * RATE
    consts = (rc_lo_ref, rc_hi_ref, rc16_ref, circ_ref[:])
    state = GL(jnp.zeros((WIDTH, b), jnp.uint32),
               jnp.zeros((WIDTH, b), jnp.uint32))

    def absorb(k, st: GL) -> GL:
        chunk_lo = lo_ref[pl.ds(k * RATE, RATE), :]
        chunk_hi = hi_ref[pl.ds(k * RATE, RATE), :]
        st = GL(jnp.concatenate([chunk_lo, st.lo[RATE:]], axis=0),
                jnp.concatenate([chunk_hi, st.hi[RATE:]], axis=0))
        return _permute_cols(st, consts)

    state = jax.lax.fori_loop(0, n_full, absorb, state)
    if rem:
        chunk_lo = lo_ref[pl.ds(n_full * RATE, rem), :]
        chunk_hi = hi_ref[pl.ds(n_full * RATE, rem), :]
        state = GL(jnp.concatenate([chunk_lo, state.lo[rem:]], axis=0),
                   jnp.concatenate([chunk_hi, state.hi[rem:]], axis=0))
        state = _permute_cols(state, consts)
    out_lo_ref[:] = state.lo[:NUM_HASH_OUT]
    out_hi_ref[:] = state.hi[:NUM_HASH_OUT]


@functools.partial(jax.jit, static_argnames=("tile",))
def hash_cols_no_pad(inputs: GL, tile: int | None = None) -> GL:
    """Column-batch sponge hash: GL (L, N) -> digests GL (4, N).

    Semantics = hash_n_to_m_no_pad(num_outputs=4) on each column (reference
    hash/hashing.rs:100-124), fused: one kernel per N/tile columns with the
    state resident in VMEM across all ceil(L/8) permutations.
    """
    leaf_len, n = inputs.lo.shape
    if tile is None:
        # VMEM budget: the grid pipeline DOUBLE-BUFFERS the two u32 input
        # planes of (leaf_len, tile), so the input footprint alone is
        # 2 (buffers) * 2 (limbs) * 4 B = 16 B per element; leave headroom
        # for the permutation temporaries (~40 u32 arrays of (12, tile)).
        budget = 10 << 20
        per_col = 16 * leaf_len + 16 * NUM_HASH_OUT + 4 * 40 * WIDTH
        tile = _pick_tile(n, max(128, budget // per_col))
    tile = min(tile, n)
    assert n % tile == 0, (n, tile)
    grid = (n // tile,)
    in_spec = pl.BlockSpec((leaf_len, tile), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((NUM_HASH_OUT, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((NUM_HASH_OUT, n), jnp.uint32)
    lo, hi = pl.pallas_call(
        functools.partial(_leaves_kernel, leaf_len=leaf_len),
        grid=grid,
        in_specs=_const_specs() + [in_spec, in_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(out_shape, out_shape),
        interpret=_INTERPRET,
    )(*_consts(), inputs.lo, inputs.hi)
    return GL(lo, hi)


def two_to_one_cols(x: GL, y: GL) -> GL:
    """Merkle compression on column digests: x, y GL (4, N) -> GL (4, N)."""
    n = x.lo.shape[-1]
    zeros = jnp.zeros((WIDTH - 2 * NUM_HASH_OUT, n), jnp.uint32)
    state = GL(jnp.concatenate([x.lo, y.lo, zeros], axis=0),
               jnp.concatenate([x.hi, y.hi, zeros], axis=0))
    out = permute_cols(state)
    return out[:NUM_HASH_OUT]


# --------------------------------------------------------------------------
# fused tree-tail kernel: all small upper levels in ONE kernel invocation
# --------------------------------------------------------------------------

TAIL_W = 512   # level width at (and below) which the tail kernel takes over


def _tree_tail_kernel(rc_lo_ref, rc_hi_ref, rc16_ref, circ_ref,
                      lo_ref, hi_ref, *out_refs, num_layers):
    """Input: digests GL (4, W) in bit-reversed node order.  Runs
    ``num_layers`` two_to_one levels entirely in VMEM and writes each
    level's digests (still bit-reversed) to its own output ref.

    Pairing of a bit-reversed level of width w puts node pair (2i, 2i+1) at
    columns (j, j + w/2) with j = rev(2i), and the PARENT of that pair lands
    at column j of the parent level — so one roll by w/2 aligns every
    partner onto its pair and the parent level is the output's j < w/2
    PREFIX.  While w/2 >= 128 the halves are tile-aligned slices; below one
    lane tile Mosaic cannot lower sub-tile vector offsets (concat "offset
    mismatch"), so deep levels keep the vector 128 lanes wide with only the
    leading w lanes valid (the wasted lanes hash garbage) — emitted 128
    wide, prefix-sliced by the caller in XLA.
    """
    consts = (rc_lo_ref, rc_hi_ref, rc16_ref, circ_ref[:])
    cur = GL(lo_ref[:], hi_ref[:])
    w = cur.lo.shape[-1]
    zrows = WIDTH - 2 * NUM_HASH_OUT
    for k in range(num_layers):
        h = w // 2
        if h >= 128:
            # dense halves: slices at 128-multiples are tile-aligned
            zeros = jnp.zeros((zrows, h), jnp.uint32)
            st = GL(
                jnp.concatenate([cur.lo[:, :h], cur.lo[:, h:], zeros], axis=0),
                jnp.concatenate([cur.hi[:, :h], cur.hi[:, h:], zeros], axis=0))
            out = _permute_cols(st, consts)
            cur = GL(out.lo[:NUM_HASH_OUT], out.hi[:NUM_HASH_OUT])
        else:
            # narrow: fixed 128 lanes, valid prefix w; partner j+h -> j
            lanes = cur.lo.shape[-1]   # 128 (or the sub-128 tail input)
            zeros = jnp.zeros((zrows, lanes), jnp.uint32)
            rl = pltpu.roll(cur.lo, lanes - h, 1)
            rh = pltpu.roll(cur.hi, lanes - h, 1)
            st = GL(jnp.concatenate([cur.lo, rl, zeros], axis=0),
                    jnp.concatenate([cur.hi, rh, zeros], axis=0))
            out = _permute_cols(st, consts)
            cur = GL(out.lo[:NUM_HASH_OUT], out.hi[:NUM_HASH_OUT])
        out_refs[2 * k][:] = cur.lo
        out_refs[2 * k + 1][:] = cur.hi
        w = h


@functools.partial(jax.jit, static_argnames=("num_layers",))
def tree_tail_cols(d: GL, num_layers: int):
    """digests GL (4, W) bit-reversed -> [GL (4, W/2), ..., GL (4, W/2^L)],
    every level bit-reversed, computed by one pallas_call."""
    w = d.lo.shape[-1]
    assert w >= (1 << num_layers) and num_layers >= 1 and w >= 128
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    shapes = []
    widths = []      # (emitted_width, valid_width) per level
    cw = w
    for _ in range(num_layers):
        h = cw // 2
        widths.append((h, h) if h >= 128 else (128, h))
        cw = h
    for ww, _ in widths:
        s = jax.ShapeDtypeStruct((NUM_HASH_OUT, ww), jnp.uint32)
        shapes.extend([s, s])
    outs = pl.pallas_call(
        functools.partial(_tree_tail_kernel, num_layers=num_layers),
        in_specs=_const_specs() + [spec, spec],
        out_specs=tuple(spec for _ in shapes),
        out_shape=tuple(shapes),
        interpret=_INTERPRET,
    )(*_consts(), d.lo, d.hi)
    levels = []
    for k, (ww, valid) in enumerate(widths):
        lv = GL(outs[2 * k], outs[2 * k + 1])
        if valid < ww:
            lv = GL(lv.lo[:, :valid], lv.hi[:, :valid])
        levels.append(lv)
    return levels


def _bitrev_cols(x: GL, inverse: bool = False) -> GL:
    """Permute the column axis of GL (4, W) by index bit-reversal."""
    from ..field import fft as jfft
    from ..field import host as _host

    n = x.lo.shape[-1]
    perm = jfft._bitrev_perm(_host.log2_strict(n))  # involution: inv == fwd
    return GL(x.lo[:, perm], x.hi[:, perm])


def build_levels_cols(d0: GL, num_layers: int):
    """Internal Merkle levels from leaf digests GL (n, 4) row-major natural:
    returns [level_1, ..., cap] each as GL (w, 4) row-major natural order.

    Pipeline: one transpose+bit-reversal up front, then every level is a
    contiguous-halves two_to_one (bit-reversed pairing) — big levels as grid
    kernels, all levels of width <= TAIL_W fused into ONE kernel — and one
    un-reversal gather + transpose per emitted level (O(digests) data
    movement; the digest tree total is < 2x the leaf-digest row).
    """
    n = d0.lo.shape[0]
    cur = _bitrev_cols(GL(d0.lo.T, d0.hi.T))            # (4, n) bitrev
    levels_cols = []
    w = n
    layers_left = num_layers
    while layers_left > 0 and w > TAIL_W:
        half = w // 2
        cur = two_to_one_cols(cur[:, :half], cur[:, half:])
        levels_cols.append(cur)
        w = half
        layers_left -= 1
    if layers_left > 0:
        levels_cols.extend(tree_tail_cols(cur, layers_left))
    out = []
    for lv in levels_cols:
        nat = _bitrev_cols(lv)
        out.append(GL(nat.lo.T, nat.hi.T))              # (w, 4) natural rows
    return out
