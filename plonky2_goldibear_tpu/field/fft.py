"""Device NTT / iFFT / coset LDE over two-adic fields.

Radix-2 decimation-in-time over the last axis, batched over all leading axes.
Field elements are pytrees (GL = (lo, hi) NamedTuple, BB = single uint32
array, extensions = tuples), so the structural ops (reshape / concat /
permute) are generic ``tree_map``s while the butterfly arithmetic goes
through the field module ``F``.

Conventions (matching the reference's, field/src/fft.rs:50-94):
- ``fft(coeffs)[k] = p(g^k)`` with g = two_adic_generator(log n), natural
  order output.
- ``ifft`` = forward fft + index reversal (k -> n-k) + scale by n^-1.
- ``coset_fft(coeffs, shift)``: evaluations on the coset shift * <g>
  (field/src/polynomial/mod.rs:116).
- ``lde``: zero-pad by 2^rate_bits then coset-fft on the generator coset
  (field/src/polynomial/mod.rs:84-88).

The current implementation is pure-jnp (one pass per stage); the Pallas
multi-stage fused kernel lives in ``ops/`` (later rounds) and must match this
bit-exactly.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from . import bb as bb_mod
from . import gl as gl_mod
from . import host

tree_map = jax.tree_util.tree_map


def _tmap(f, *trees):
    return tree_map(f, *trees)


def treshape(x, shape):
    return _tmap(lambda a: a.reshape(shape), x)


def tconcat(xs, axis):
    return tree_map(lambda *leaves: jnp.concatenate(leaves, axis=axis), *xs)


def ttake(x, idx, axis):
    return _tmap(lambda a: jnp.take(a, idx, axis=axis), x)


def tshape(x):
    return jax.tree_util.tree_leaves(x)[0].shape


def _field_mod(F):
    """Resolve the scalar field module for twiddle construction."""
    return F


@lru_cache(maxsize=64)
def _root_rows_host(field_name: str, n_log: int):
    """Host twiddle table: row s has the 2^s twiddles w_{2^(s+1)}^j,
    j = 0..2^s-1 (mirrors fft_root_table, reference field/src/fft.rs:12-31)."""
    spec = host.GOLDILOCKS if field_name == "goldilocks" else host.BABYBEAR
    rows = []
    for s in range(n_log):
        g = spec.two_adic_generator(s + 1)
        row = np.empty(1 << s, dtype=np.uint64)
        acc = 1
        for j in range(1 << s):
            row[j] = acc
            acc = acc * g % spec.p
        rows.append(row)
    return rows


def root_table(F, n_log: int):
    """Device twiddle table for field module F (gl or bb)."""
    rows = _root_rows_host(F.SPEC.name, n_log)
    return [F.from_ints(r) for r in rows]


@lru_cache(maxsize=64)
def _bitrev_perm_host(n_log: int):
    return np.asarray(host.reverse_index_bits_perm(n_log), dtype=np.int32)


def _bitrev_perm(n_log: int):
    """Bit-reversal permutation COMPUTED ON DEVICE from an iota.

    A host-constant index array becomes a 2^n_log * 4-byte literal embedded
    in every containing program — 32 MB at n=2^23, which OOMed the remote
    compile helper on large-domain commits.  Above 2^16 (256 kB literal),
    n_log shift/or steps on an iota produce the same indices with no
    literal at all; small tables stay host constants (cheaper compiles on
    the XLA:CPU test backend)."""
    if n_log <= 16:
        return jnp.asarray(_bitrev_perm_host(n_log))
    i = jax.lax.iota(jnp.uint32, 1 << n_log)
    r = jnp.zeros_like(i)
    for _ in range(n_log):
        r = (r << 1) | (i & 1)
        i = i >> 1
    return r.astype(jnp.int32)


def reverse_index_bits(x, axis: int = -1):
    """Permute an axis by index bit-reversal (reference util/src/lib.rs:76)."""
    n = tshape(x)[axis]
    return ttake(x, _bitrev_perm(host.log2_strict(n)), axis)


FORCE_JNP = False  # set True to bypass the ops/ kernel (tests, cpu-pinned)


def _use_pallas_ntt(F, n: int) -> bool:
    """Trace-time dispatch to the fused ops/ kernels (TPU, GL or BB,
    n>=256): ops/ntt.py for Goldilocks, ops/ntt_bb.py for BabyBear.

    PLONKY2_TPU_DISABLE_NTT=1 forces the jnp path (TPU-prove bisection).
    Trace-time decision: flipping the env var does not affect programs
    already jitted in this process."""
    from ..utils.envflags import env_flag

    if FORCE_JNP or env_flag("PLONKY2_TPU_DISABLE_NTT"):
        return False
    return ((F is gl_mod or F is bb_mod) and n >= 256
            and jax.default_backend() == "tpu")


def fft(F, x, roots=None, zero_prefix_log: int = 0):
    """Forward NTT over the last axis.  x: field pytree (..., n).

    ``zero_prefix_log`` = r declares that only the first n/2^r coefficients
    are (possibly) nonzero — the LDE case.  The first r DIT rounds on such
    input just replicate each coefficient across its 2^r-block, so they are
    replaced by one repeat and skipped (reference field/src/fft.rs:168-205).
    """
    n = tshape(x)[-1]
    n_log = host.log2_strict(n)
    if n == 1:
        return x
    if _use_pallas_ntt(F, n):
        from ..utils.envflags import env_flag

        if F is gl_mod:
            from ..ops import ntt as ntt_ops
        else:
            from ..ops import ntt_bb as ntt_ops

        out = ntt_ops.fft(x, zero_prefix_log=zero_prefix_log)
        if env_flag("PLONKY2_TPU_NTT_CHECK"):
            # shadow-compare against the jnp semantic reference in-trace:
            # catches divergence on the *actual prove data* (shapes AND
            # values), which random-input audits can miss.  NOTE: needs a
            # backend with host-callback support (not the axon tunnel).
            ref = _fft_jnp(F, x, None, zero_prefix_log)
            bad = jnp.sum(jnp.logical_not(
                jax.tree_util.tree_reduce(
                    jnp.logical_and,
                    tree_map(lambda a, b: a == b, out, ref))))
            jax.debug.print(
                "NTT_CHECK shape=" + str(tshape(x)) + " r="
                + str(zero_prefix_log) + " mismatches={bad}", bad=bad)
        return out
    out = _fft_jnp(F, x, roots, zero_prefix_log)
    if F is gl_mod:
        _maybe_dump_ntt(x, out, zero_prefix_log)
    return out


_DUMP_SEQ = [0]


def _maybe_dump_ntt(x, out, r: int):
    """PLONKY2_TPU_NTT_DUMP=<dir>: save every jnp-path GL NTT call's real
    input+output to <dir>/ntt_<seq>.npz (ordered io_callback; CPU-backend
    debugging aid for replaying real prove data through the ops/ kernel)."""
    import os

    d = os.environ.get("PLONKY2_TPU_NTT_DUMP")
    if not d:
        return
    from jax.experimental import io_callback

    seq = _DUMP_SEQ[0]
    _DUMP_SEQ[0] += 1

    def _save(xlo, xhi, olo, ohi, _seq=seq, _r=r, _d=d):
        np.savez(os.path.join(_d, f"ntt_{_seq:04d}.npz"),
                 xlo=np.asarray(xlo), xhi=np.asarray(xhi),
                 olo=np.asarray(olo), ohi=np.asarray(ohi),
                 r=np.int32(_r))

    io_callback(_save, None, x.lo, x.hi, out.lo, out.hi, ordered=True)


def _fft_jnp(F, x, roots=None, zero_prefix_log: int = 0):
    """The pure-jnp NTT body (semantic reference for the ops/ kernel)."""
    n = tshape(x)[-1]
    n_log = host.log2_strict(n)
    if roots is None:
        roots = root_table(F, n_log)
    shape = tshape(x)
    batch = shape[:-1]
    r = zero_prefix_log
    if r:
        n_small = n >> r
        small = _tmap(lambda a: a[..., :n_small], x)
        small = reverse_index_bits(small, axis=-1)
        x = _tmap(lambda a: jnp.repeat(a, 1 << r, axis=-1), small)
    else:
        x = reverse_index_bits(x, axis=-1)
    for s in range(r, n_log):
        half = 1 << s          # half block
        m = half * 2
        nblocks = n // m
        xv = treshape(x, batch + (nblocks, 2, half))
        even = _tmap(lambda a: a[..., 0, :], xv)
        odd = _tmap(lambda a: a[..., 1, :], xv)
        w = roots[s]           # (half,) — broadcasts against (..., nblocks, half)
        t = F.mul(odd, w)
        top = F.add(even, t)
        bot = F.sub(even, t)
        x = treshape(tconcat([top, bot], axis=-1), batch + (n,))
    return x


def ifft(F, x, roots=None):
    """Inverse NTT: values (..., n) -> coefficients."""
    n = tshape(x)[-1]
    n_log = host.log2_strict(n)
    y = fft(F, x, roots)
    # index reversal: coeffs[k] = y[(n - k) % n] / n.  Computed from an
    # iota (n is a power of two) — a host index array would be a 4n-byte
    # literal in every containing program (see _bitrev_perm).
    i = jax.lax.iota(jnp.int32, n)
    idx = (n - i) & (n - 1)
    y = ttake(y, idx, axis=-1)
    n_inv = host.finv(n, F.SPEC.p)
    return F.mul(y, F.const(n_inv))


@lru_cache(maxsize=64)
def _power_vector_host(field_name: str, base_val: int, n: int):
    spec = host.GOLDILOCKS if field_name == "goldilocks" else host.BABYBEAR
    out = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        out[i] = acc
        acc = acc * base_val % spec.p
    return out


def powers(F, base_val: int, n: int):
    """Device vector [1, b, b^2, ..., b^(n-1)] for a host constant b.

    Computed ON DEVICE via a log-depth cumprod ladder: a host power table
    is a 8n-byte literal embedded in every containing program (64 MB for
    the 2^23-point FRI combine), which OOMed the remote compile helper.
    Integer cumprod is exact, so this is bit-identical to the host table.
    Tables up to 2^16 stay host-side: the literal is <= 0.5 MB (harmless)
    and the cumprod ladder trips XLA:CPU's algebraic-simplifier loop
    pathology ("stuck in a circular simplification loop", minutes per
    compile) on the test backend."""
    if n <= (1 << 16):
        return F.from_ints(_power_vector_host(F.SPEC.name,
                                              base_val % F.SPEC.p, n))
    b = F.full((n - 1,), base_val)
    body = F.cumprod(b, axis=0)          # [b, b^2, ..., b^(n-1)]
    return tconcat([F.ones((1,)), body], axis=0)


def coset_fft(F, coeffs, shift: int, roots=None):
    """Evaluations of p on the coset shift * <g>: fft(shift^i * c_i)."""
    n = tshape(coeffs)[-1]
    scaled = F.mul(coeffs, powers(F, shift, n))
    return fft(F, scaled, roots)


def coset_ifft(F, values, shift: int, roots=None):
    """Inverse of coset_fft."""
    n = tshape(values)[-1]
    coeffs = ifft(F, values, roots)
    shift_inv = host.finv(shift % F.SPEC.p, F.SPEC.p)
    return F.mul(coeffs, powers(F, shift_inv, n))


def pad_coeffs(coeffs, new_n: int):
    """Zero-pad the coefficient axis to new_n (lde, reference
    field/src/polynomial/mod.rs:62)."""
    shape = tshape(coeffs)
    n = shape[-1]
    assert new_n >= n
    pad = [(0, 0)] * (len(shape) - 1) + [(0, new_n - n)]
    return _tmap(lambda a: jnp.pad(a, pad), coeffs)


def lde_coset_fft(F, coeffs, rate_bits: int, shift: int = None, roots=None):
    """Low-degree extension: zero-pad x 2^rate_bits then coset-fft on the
    generator coset (the PolynomialBatch commit path, reference
    fri/oracle.rs:125-150).  The padding is virtual: coset scaling touches
    only the n real coefficients and the FFT skips its first rate_bits
    rounds (zero-prefix optimization, field/src/fft.rs:168-205)."""
    if shift is None:
        shift = F.SPEC.coset_shift
    n = tshape(coeffs)[-1]
    scaled = F.mul(coeffs, powers(F, shift, n))
    padded = pad_coeffs(scaled, n << rate_bits)
    return fft(F, padded, roots, zero_prefix_log=rate_bits)


# -- extension-field transforms (componentwise over the base field) ---------


def ext_fft(E, x, roots=None):
    """NTT of an extension-coefficient poly over a base-field domain: the
    butterflies only multiply by base twiddles, so each of the D coefficient
    arrays transforms independently."""
    return tuple(fft(E.base, c, roots) for c in x)


def ext_ifft(E, x, roots=None):
    return tuple(ifft(E.base, c, roots) for c in x)


def ext_coset_fft(E, x, shift: int, roots=None):
    return tuple(coset_fft(E.base, c, shift, roots) for c in x)


def ext_coset_ifft(E, x, shift: int, roots=None):
    return tuple(coset_ifft(E.base, c, shift, roots) for c in x)
