"""Polynomial-batch commitment oracle: IFFT -> coset LDE -> Merkle-with-cap.

Capability parity with the reference's ``PolynomialBatch``
(plonky2/src/fri/oracle.rs:29-184): commit to a batch of polynomials by
low-degree-extending each one onto the coset ``shift * <g>`` at rate
``2^rate_bits``, transposing to per-point leaf rows, bit-reversing the leaf
order, and Merkle-hashing with a cap.

TPU-first shape discipline: polynomials live as (num_polys, n) field pytrees
(last axis = transform axis, leading axis = batch), the whole commit is one
jittable function (`commit_values` / `commit_coeffs`), and every step is a
batched kernel — per-column NTTs, one transpose, one gather (bit-reversal),
log2(lde_size) hashing rounds.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fft as fftm
from ..field import host
from ..hash import merkle, poseidon_gl

tree_map = jax.tree_util.tree_map

# Salt size when zero-knowledge blinding is on (reference fri/oracle.rs:25,
# plonk/plonk_common.rs:43).
SALT_SIZE = 4


def transpose_tree(x):
    """(num_polys, n) -> (n, num_polys) on every leaf of a field pytree."""
    return tree_map(lambda a: a.T, x)


def lde_values(F, coeffs, rate_bits: int, shift: Optional[int] = None,
               roots=None):
    """Coset LDE of a coefficient batch: (num_polys, n) -> (num_polys, n<<rate_bits)."""
    return fftm.lde_coset_fft(F, coeffs, rate_bits, shift, roots)


def leaves_from_lde(F, lde):
    """LDE values (num_polys, m) -> Merkle leaf rows (m, num_polys) in
    bit-reversed point order (reference fri/oracle.rs:110-121: transpose then
    reverse_index_bits_in_place)."""
    leaves = transpose_tree(lde)
    return fftm.reverse_index_bits(leaves, axis=0)


def commit_coeffs(F, coeffs, rate_bits: int, cap_height: int,
                  shift: Optional[int] = None, hasher=poseidon_gl, roots=None):
    """Jittable core: coefficient batch -> (lde, leaves, digest levels)."""
    lde = lde_values(F, coeffs, rate_bits, shift, roots)
    leaves = leaves_from_lde(F, lde)
    m = fftm.tshape(leaves)[0]
    num_layers = host.log2_strict(m) - cap_height
    levels = merkle.build_levels(leaves, num_layers, hasher)
    return lde, leaves, levels


def commit_values(F, values, rate_bits: int, cap_height: int,
                  shift: Optional[int] = None, hasher=poseidon_gl):
    """Jittable: IFFT the value batch then commit (returns coeffs too)."""
    coeffs = fftm.ifft(F, values)
    return (coeffs,) + commit_coeffs(F, coeffs, rate_bits, cap_height,
                                     shift, hasher)


def commit_values_streaming(F, values, rate_bits: int, cap_height: int,
                            shift: Optional[int] = None,
                            hasher=poseidon_gl):
    """Memory-lean commit for large domains: (coeffs, digest levels).

    ``commit_values`` materializes the full LDE **and** its (m, num_polys)
    leaf transpose — ~25 GB HBM for a 2^20-degree 135-poly batch, which
    exceeds a single v5e.  The overwrite-mode sponge absorbs leaf rows in
    RATE-sized chunks anyway, so this version streams RATE polys at a
    time: per block one coset LDE + transpose + one permutation of the
    (m, WIDTH) sponge states; peak extra memory is one RATE-column LDE
    block plus the states, independent of num_polys.  Leaf digests (and
    hence the cap) are bit-identical to ``commit_values``.

    Trade-off: the LDE values and leaf rows are NOT retained — FRI query
    extraction must re-derive leaf columns from ``coeffs`` (or re-run the
    block LDE); the full prover keeps using ``commit_values`` below the
    memory ceiling and the sharded multi-chip commit above it
    (parallel/sharded.py).  Jittable; reference analog fri/oracle.rs:68-91.
    """
    sh = F.SPEC.coset_shift if shift is None else shift
    rate = hasher.RATE
    width = hasher.WIDTH
    num_out = hasher.NUM_HASH_OUT
    coeffs = fftm.ifft(F, values)
    num_polys, n = fftm.tshape(coeffs)
    assert num_polys > num_out, "streaming commit expects a hashed leaf"
    m = n << rate_bits
    state = F.zeros((m, width))
    for j in range(0, num_polys, rate):
        blk = tree_map(lambda a: a[j:j + rate], coeffs)
        lde = lde_values(F, blk, rate_bits, sh)
        rows = leaves_from_lde(F, lde)                 # (m, k)
        k = fftm.tshape(rows)[-1]
        state = fftm.tconcat(
            [rows, tree_map(lambda a: a[..., k:], state)], axis=-1)
        state = hasher.permute(state)
    d0 = tree_map(lambda a: a[..., :num_out], state)   # leaf digests (m, 4)
    num_layers = host.log2_strict(m) - cap_height
    # build_levels hashes its input rows with hash_or_noop, which is the
    # identity on digest-width rows — so feeding digests is exact
    levels = merkle.build_levels(d0, num_layers, hasher)
    return coeffs, levels


_commit_values_streaming_jit = jax.jit(
    commit_values_streaming, static_argnums=(0, 2, 3, 4, 5))


def commit_coeffs_streaming(F, coeffs, rate_bits: int, cap_height: int,
                            shift: Optional[int] = None,
                            hasher=poseidon_gl):
    """Streaming commit from coefficients: (digest levels,) only.
    Same block-sponge schedule as ``commit_values_streaming`` (bit-identical
    caps to the dense ``commit_coeffs``); reference fri/oracle.rs:95-123."""
    sh = F.SPEC.coset_shift if shift is None else shift
    rate = hasher.RATE
    width = hasher.WIDTH
    num_out = hasher.NUM_HASH_OUT
    num_polys, n = fftm.tshape(coeffs)
    assert num_polys > num_out, "streaming commit expects a hashed leaf"
    m = n << rate_bits
    state = F.zeros((m, width))
    for j in range(0, num_polys, rate):
        blk = tree_map(lambda a: a[j:j + rate], coeffs)
        lde = lde_values(F, blk, rate_bits, sh)
        rows = leaves_from_lde(F, lde)
        k = fftm.tshape(rows)[-1]
        state = fftm.tconcat(
            [rows, tree_map(lambda a: a[..., k:], state)], axis=-1)
        state = hasher.permute(state)
    d0 = tree_map(lambda a: a[..., :num_out], state)
    num_layers = host.log2_strict(m) - cap_height
    return merkle.build_levels(d0, num_layers, hasher)


_commit_coeffs_streaming_jit = jax.jit(
    commit_coeffs_streaming, static_argnums=(0, 2, 3, 4, 5))


class StreamingTree:
    """Merkle tree holding digest levels only (no leaf rows).

    ``levels`` matches a dense MerkleTree's digest levels bit-for-bit
    (levels[0] is the per-leaf digest row), so sibling chains for query
    proofs gather identically (``prove_batch`` delegates to MerkleTree's
    fused device gather); leaf ROWS are re-derived from polynomial
    coefficients by the large-domain query path
    (plonk/prover_large.py)."""

    def __init__(self, F, levels, cap_height: int, hasher):
        self._field = F
        self.levels = levels
        self.cap_height = cap_height
        self.hasher = hasher
        m = fftm.tshape(levels[0])[0]
        self.num_layers = host.log2_strict(m) - cap_height
        self.cap = levels[-1]
        self._host_levels = None

    @property
    def _F(self):
        return getattr(self.hasher, "F", self._field)

    def cap_host(self):
        return merkle.MerkleTree.cap_host(self)

    def _levels_host(self):
        return merkle.MerkleTree._levels_host(self)

    def prove_batch(self, leaf_indices):
        return merkle.MerkleTree.prove_batch(self, leaf_indices)


class StreamingPolynomialBatch:
    """Memory-lean FRI oracle for large domains: coefficients + digest
    levels resident; the LDE and leaf rows are NEVER materialized
    (re-derived blockwise by the large-domain prover).  Cap/coeffs are
    bit-identical to ``PolynomialBatch`` (reference fri/oracle.rs:29-123;
    capability target: BASELINE configs with 2^24-point LDEs that exceed
    single-chip HBM in dense form)."""

    def __init__(self, F, coeffs, rate_bits: int, cap_height: int,
                 shift: Optional[int] = None, hasher=poseidon_gl,
                 levels=None):
        self.F = F
        self.coeffs = coeffs
        self.rate_bits = rate_bits
        self.cap_height = cap_height
        self.blinding = False
        self.shift = F.SPEC.coset_shift if shift is None else shift
        self.hasher = hasher
        if levels is None:
            levels = _commit_coeffs_streaming_jit(
                F, coeffs, rate_bits, cap_height, self.shift, hasher)
        self.num_polys, self.degree = fftm.tshape(coeffs)
        self.degree_bits = host.log2_strict(self.degree)
        self.lde_size = self.degree << rate_bits
        self.tree = StreamingTree(F, levels, cap_height, hasher)

    @classmethod
    def from_values(cls, F, values, rate_bits: int, cap_height: int,
                    shift: Optional[int] = None, hasher=poseidon_gl):
        sh = F.SPEC.coset_shift if shift is None else shift
        coeffs, levels = _commit_values_streaming_jit(
            F, values, rate_bits, cap_height, sh, hasher)
        return cls(F, coeffs, rate_bits, cap_height, sh, hasher,
                   levels=levels)

    def cap_host(self):
        return self.tree.cap_host()


def _salted_tree(F, lde, salt, cap_height: int, hasher):
    salted = fftm.tconcat([lde, salt], axis=0)
    leaves = leaves_from_lde(F, salted)
    m = fftm.tshape(leaves)[0]
    num_layers = host.log2_strict(m) - cap_height
    levels = merkle.build_levels(leaves, num_layers, hasher)
    return salted, leaves, levels


def commit_coeffs_salted(F, coeffs, salt, rate_bits: int, cap_height: int,
                         shift: Optional[int] = None, hasher=poseidon_gl):
    lde = lde_values(F, coeffs, rate_bits, shift)
    return _salted_tree(F, lde, salt, cap_height, hasher)


def commit_values_salted(F, values, salt, rate_bits: int, cap_height: int,
                         shift: Optional[int] = None, hasher=poseidon_gl):
    coeffs = fftm.ifft(F, values)
    return (coeffs,) + commit_coeffs_salted(F, coeffs, salt, rate_bits,
                                            cap_height, shift, hasher)


def _random_salt(F, m: int):
    from ..iop import generator as gen

    if gen._NONRANDOM_COUNTER is not None:
        # deterministic mode: draw per poly then per element, mirroring the
        # reference's salt_polynomials -> PolynomialValues::rand order
        # (fri/oracle.rs:139-149)
        p = F.SPEC.p
        vals = np.array(
            [[gen.rand_field_element(p) for _ in range(m)]
             for _ in range(SALT_SIZE)], dtype=np.uint64)
        return F.from_ints(vals)
    rng = np.random.default_rng()
    return F.from_ints(rng.integers(0, F.SPEC.p, size=(SALT_SIZE, m),
                                    dtype=np.uint64))


# One compiled program per (field, rate, cap, shift, hasher, shapes); modules
# are hashable so they ride along as static args.
_commit_coeffs_jit = jax.jit(
    commit_coeffs, static_argnums=(0, 2, 3, 4, 5))
_commit_values_jit = jax.jit(
    commit_values, static_argnums=(0, 2, 3, 4, 5))
_commit_coeffs_salted_jit = jax.jit(
    commit_coeffs_salted, static_argnums=(0, 3, 4, 5, 6))
_commit_values_salted_jit = jax.jit(
    commit_values_salted, static_argnums=(0, 3, 4, 5, 6))


def commit_coeffs_cached(F, coeffs, rate_bits, cap_height, shift, hasher):
    return _commit_coeffs_jit(F, coeffs, rate_bits, cap_height, shift,
                              hasher)


class PolynomialBatch:
    """Committed batch of polynomials (the FRI oracle).

    Stores coefficients (for openings), the natural-order LDE values (for
    strided quotient-domain reads, reference fri/oracle.rs:153-170), and the
    Merkle tree over bit-reversed leaf rows.
    """

    def __init__(self, F, coeffs, rate_bits: int, cap_height: int,
                 shift: Optional[int] = None, hasher=poseidon_gl, roots=None,
                 blinding: bool = False, _precomputed=None):
        self.F = F
        self.coeffs = coeffs
        self.rate_bits = rate_bits
        self.cap_height = cap_height
        self.blinding = blinding
        self.shift = F.SPEC.coset_shift if shift is None else shift
        self.hasher = hasher
        if _precomputed is None:
            if blinding:
                salt = _random_salt(F, fftm.tshape(coeffs)[-1] << rate_bits)
                lde, leaves, levels = _commit_coeffs_salted_jit(
                    F, coeffs, salt, rate_bits, cap_height, self.shift,
                    hasher)
            else:
                lde, leaves, levels = commit_coeffs_cached(
                    F, coeffs, rate_bits, cap_height, self.shift, hasher)
            self.lde = lde
        else:
            self.lde, leaves, levels = _precomputed
        self.num_polys, self.lde_size = fftm.tshape(self.lde)
        self.degree = fftm.tshape(coeffs)[-1]
        self.degree_bits = host.log2_strict(self.degree)
        self.tree = merkle.MerkleTree(leaves, cap_height, hasher,
                                      levels=levels)

    @classmethod
    def from_values(cls, F, values, rate_bits: int, cap_height: int,
                    shift: Optional[int] = None, hasher=poseidon_gl,
                    roots=None, blinding: bool = False):
        """Values on the 2-adic subgroup -> IFFT -> commit, as one fused
        jitted program (reference fri/oracle.rs:68-91).  With blinding, the
        SALT_SIZE random value columns (reference fri/oracle.rs:139-149)
        enter the same fused program as a traced argument, so the
        compilation is randomness-independent."""
        sh = F.SPEC.coset_shift if shift is None else shift
        if blinding:
            salt = _random_salt(F, fftm.tshape(values)[-1] << rate_bits)
            coeffs, lde, leaves, levels = _commit_values_salted_jit(
                F, values, salt, rate_bits, cap_height, sh, hasher)
            return cls(F, coeffs, rate_bits, cap_height, sh, hasher,
                       blinding=True, _precomputed=(lde, leaves, levels))
        coeffs, lde, leaves, levels = _commit_values_jit(
            F, values, rate_bits, cap_height, sh, hasher)
        return cls(F, coeffs, rate_bits, cap_height, sh, hasher,
                   _precomputed=(lde, leaves, levels))

    # -- host-side reads -----------------------------------------------------

    def get_lde_values(self, index: int, step: int = 1) -> List[int]:
        """All polys' LDE values at natural-order point ``index * step``
        (reference fri/oracle.rs:153-170).  One device gather + one transfer
        of a single column — never materializes the LDE on the host (the
        query path proper batches all 28 indices in merkle.prove_batch)."""
        col = jax.tree_util.tree_map(lambda a: a[:, index * step], self.lde)
        return [int(v) for v in self.F.to_ints(col)]

    def cap_host(self):
        return self.tree.cap_host()
