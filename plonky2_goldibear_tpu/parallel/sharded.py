"""Multi-chip sharded commit pipeline: column-parallel NTT -> all_to_all ->
point-parallel Merkle hashing -> all_gathered cap.

The reference's only parallelism is rayon shared-memory work stealing
(maybe_rayon, SURVEY.md §2.2).  The TPU-native counterpart (SURVEY.md §5.8):

- a 1-D ``jax.sharding.Mesh`` axis ``"x"`` over chips;
- **column parallelism** for the NTT/LDE phase: each chip owns a slice of the
  polynomial batch and runs full-length transforms locally (the transform
  axis is unsharded — no cross-chip butterflies needed at this scale);
- one **all_to_all** to reshard from (polys sharded, points replicated-local)
  to (points sharded, polys local) for leaf hashing — this is the transpose
  boundary, the analog of a sequence-parallel reshard;
- **point parallelism** for Merkle: each chip hashes its contiguous block of
  bit-reversed leaves and reduces it to its slice of the cap;
- one **all_gather** of the cap (the cap — not the root — is the natural
  multi-chip commitment boundary, reference hash/merkle_tree.rs:14-19).

Bit-reversal across chips uses the index split rev_m(q·N + r) =
rev_N(r)·(m/N) + rev_{m/N}(q): globally bit-reversed leaf block ``b`` is the
stride-N slice ``r = rev_N(b)`` locally bit-reversed — so the global
permutation is a local gather plus the all_to_all's axis split, no extra
collective.

Requires cap_height >= log2(num_devices) so each chip owns whole cap
subtrees.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import fft as fftm
from ..field import host
from ..hash import merkle, poseidon_gl

tree_map = jax.tree_util.tree_map


def make_mesh(n_devices: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("x",))


def _commit_local(F, hasher, coeffs, rate_bits, cap_height, shift, n_dev,
                  n_log_total):
    """Per-shard body (runs under shard_map).

    coeffs: (num_polys / n_dev, n) local slice.  Returns this chip's cap
    slice, replicated leaf block handling via all_to_all.
    """
    lde = fftm.lde_coset_fft(F, coeffs, rate_bits, shift)
    m = fftm.tshape(lde)[-1]
    mlocal = m // n_dev
    lg_dev = host.log2_strict(n_dev)
    # split point axis: (polys_l, m) -> (polys_l, mlocal, n_dev) [q, r]
    x = tree_map(lambda a: a.reshape(a.shape[0], mlocal, n_dev), lde)
    # local bit-reversal of q axis and rev of r axis
    qperm = np.array([host.reverse_bits(i, host.log2_strict(mlocal))
                      for i in range(mlocal)], dtype=np.int32)
    rperm = np.array([host.reverse_bits(i, lg_dev)
                      for i in range(n_dev)], dtype=np.int32)
    x = tree_map(lambda a: a[:, qperm][:, :, rperm], x)
    # all_to_all: split r axis over chips, concat polys axis
    # result: (num_polys, mlocal) = globally bit-reversed leaf block b=this chip
    x = tree_map(
        lambda a: jax.lax.all_to_all(a, "x", split_axis=2, concat_axis=0,
                                     tiled=True),
        x)
    leaves = tree_map(lambda a: a.reshape(a.shape[0], mlocal).T, x)
    # local subtree reduction to the cap slice; the out_spec P("x") assembles
    # the full cap from the per-chip slices (no all_gather needed — the cap
    # layer is naturally sharded by leaf block, and GSPMD replicates it
    # lazily if a consumer needs it)
    num_layers = host.log2_strict(mlocal) - (cap_height - lg_dev)
    levels = merkle.build_levels(leaves, num_layers, hasher)
    return levels[-1]


def sharded_commit(F, coeffs, rate_bits: int, cap_height: int, mesh: Mesh,
                   shift=None, hasher=poseidon_gl):
    """Commit a (num_polys, n) coefficient batch sharded over mesh axis "x".

    Returns the replicated Merkle cap (2^cap_height, num_hash_out) pytree.
    """
    n_dev = mesh.devices.size
    if shift is None:
        shift = F.SPEC.coset_shift
    num_polys, n = fftm.tshape(coeffs)
    assert num_polys % n_dev == 0, (num_polys, n_dev)
    lg_dev = host.log2_strict(n_dev)
    assert cap_height >= lg_dev, "cap must cover the device axis"
    n_log_total = host.log2_strict(n) + rate_bits
    body = partial(_commit_local, F, hasher, rate_bits=rate_bits,
                   cap_height=cap_height, shift=shift, n_dev=n_dev,
                   n_log_total=n_log_total)
    fn = jax.shard_map(
        lambda c: body(c),
        mesh=mesh,
        in_specs=(P("x", None),),
        out_specs=P("x", None),
    )
    return jax.jit(fn)(coeffs)


# ---------------------------------------------------------------------------
# GSPMD-sharded prover phases beyond the commit (SURVEY §5.8 / VERDICT r1 #7)
#
# The quotient evaluation and the FRI fold are pure jitted programs over
# (polys, points) / (points,) arrays; sharding the POINT axis over the mesh
# and letting GSPMD insert the collectives (the roll in zs_pp_next becomes a
# collective-permute halo exchange; reductions over the poly axis stay
# local) is the idiomatic TPU scaling story — no hand-written per-shard
# bodies needed.  These helpers place the operands with a NamedSharding and
# invoke the SAME compiled phase programs the single-chip prover uses, so
# sharded and unsharded results are bit-identical by construction.
# ---------------------------------------------------------------------------


def points_sharding(mesh: Mesh):
    """NamedSharding that splits the trailing (points) axis over "x"."""
    return NamedSharding(mesh, P(None, "x"))


def shard_lde(lde, mesh: Mesh):
    """Place a (polys, m) LDE pytree with the point axis sharded."""
    s = points_sharding(mesh)
    return tree_map(lambda a: jax.device_put(a, s), lde)


def sharded_quotient(kern, ldes, args, mesh: Mesh):
    """Run a ProverKernels.quotient_fn with point-sharded oracle LDEs.

    kern: plonk.prover.ProverKernels;  ldes: (cs_lde, wires_lde, zs_pp_lde);
    args: the remaining quotient_fn arguments (pi, betas, gammas, alphas,
    deltas, lut_re).  Returns the quotient chunk batch (replicated layout
    decided by GSPMD).
    """
    cs, wires, zs_pp = (shard_lde(x, mesh) for x in ldes)
    return kern.quotient_fn(cs, wires, zs_pp, *args)


def sharded_fold_round(F, arity: int, beta_pows, shift: int, coeffs,
                       mesh: Mesh):
    """One FRI fold round with the coefficient axis sharded over "x".

    The (m,) -> (m/arity, arity) reshape keeps shard boundaries aligned as
    long as (m / n_dev) % arity == 0; GSPMD then runs the beta reduction
    locally and the coset FFT with its own collectives.
    """
    from ..fri import prover as fri_prover

    s = NamedSharding(mesh, P("x"))
    coeffs = tuple(tree_map(lambda a: jax.device_put(a, s), c)
                   for c in coeffs)
    return fri_prover._fold_round_jit(F, arity, beta_pows, shift, coeffs)


def prove_sharded(prover_data, common, inputs, mesh: Mesh, F=None,
                  hasher=None):
    """ONE proof produced cooperatively by every device of ``mesh``
    (SURVEY §5.8; reference parity bar maybe_rayon/src/lib.rs:30 — the
    parallel backend covers the *whole* prover, not isolated phases).

    TPU-native composition: the dense wire matrix enters with its point
    (row) axis sharded over the mesh, so every per-phase jitted program —
    IFFT/LDE + Merkle commit, partial-product scans, whole-domain quotient
    evaluation, opening sums, FRI combine/fold — compiles under GSPMD with
    the operand shardings and runs SPMD with XLA-inserted collectives
    (all_to_all at the leaf transpose, collective-permute for next-row
    rolls, all_gathers where a phase needs replication).  Fiat-Shamir stays
    replicated on host, so the proof is byte-identical to the single-chip
    prover's for the same witness (cross-checked in dryrun stage 5 and
    tests/test_sharded_prove.py)."""
    from ..field import gl as gl_mod
    from ..iop.generator import generate_partial_witness
    from ..plonk import prover as plonk_prover

    F = F if F is not None else gl_mod
    h = hasher if hasher is not None else poseidon_gl
    partition = generate_partial_witness(inputs, prover_data, common)
    plonk_prover.set_lookup_wires(prover_data, common, partition)
    publics = partition.get_targets(prover_data.public_inputs)
    witness = partition.full_witness()
    wires = F.from_ints(witness)
    wires = tree_map(lambda a: jax.device_put(a, points_sharding(mesh)),
                     wires)
    host_matrix = witness if common.num_lookup_polys != 0 else None
    return plonk_prover._internal_prove(
        prover_data, common, wires, host_matrix, publics, F, h, h)


def dp_commit_batch(F, coeffs_batch, rate_bits: int, cap_height: int,
                    mesh: Mesh, shift=None, hasher=poseidon_gl):
    """Data-parallel batch-of-proofs commit: (B, polys, n) with B sharded.

    The cheap pod-scale win: B independent circuits' wire batches, one per
    device, each running the full single-chip commit locally (vmap of the
    fused commit program; no cross-device traffic at all).  Returns the
    (B, 2^cap_height, hash_width) cap batch.
    """
    from ..fri import oracle

    if shift is None:
        shift = F.SPEC.coset_shift
    s = NamedSharding(mesh, P("x", None, None))
    coeffs_batch = tree_map(lambda a: jax.device_put(a, s), coeffs_batch)

    def one(coeffs):
        _, _, levels = oracle.commit_coeffs(F, coeffs, rate_bits,
                                            cap_height, shift, hasher)
        return levels[-1]

    return jax.jit(jax.vmap(one))(coeffs_batch)
