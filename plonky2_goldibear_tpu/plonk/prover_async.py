"""Async prover pipeline: device-resident Fiat-Shamir, one final fetch.

Same proof algebra and transcript schedule as plonk/prover.py
(reference plonky2/src/plonk/prover.rs:136-446) but with the challenger on
device (hash/device_challenger.py): every phase — commits, partial
products, quotient, openings, the whole FRI opening proof including the PoW
grind and query gathers — is dispatched asynchronously, and the proof is
assembled from ONE blocking device->host transfer at the end.  Behind the
TPU tunnel a blocking fetch costs ~28 ms; the sync path pays ~12-15 of
them per proof (0.4+ s of pure latency), the async path pays one.

Safety checks that the sync path asserts eagerly (zeta outside the
subgroup, PoW response grind bits, the anti-#456 permutation-argument
denominators) become device flags validated after the final fetch; the
anti-#456 retry (prover.rs:64-134) re-runs the pipeline, as rare as in the
reference.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import numpy as np

from ..field import ext as ext_mod
from ..field import fft as fftm
from ..fri import prover as fri_prover
from ..fri.oracle import PolynomialBatch
from ..hash import poseidon_gl
from ..hash.device_challenger import DeviceChallenger
from .proof import (FriInitialTreeProof, FriProof, FriQueryRound,
                    FriQueryStep, OpeningSet, Proof, ProofWithPublicInputs)

tree_map = jax.tree_util.tree_map


def _ext_ops(F):
    return ext_mod.gl2 if F.SPEC.name == "goldilocks" else ext_mod.bb4


def available(F, hasher, config) -> bool:
    """Async FS needs a device permutation (algebraic hasher)."""
    return hasattr(hasher, "permute") and hasattr(hasher, "NUM_HASH_OUT")


# --------------------------------------------------------------------------
# opening-set program: evals at zeta / g*zeta in FRI observation order
# --------------------------------------------------------------------------


def _openings_async_body(F, common, cs_coeffs, wires_coeffs, zs_pp_coeffs,
                         quot_coeffs, zeta):
    from .prover import _ext_powers_traced

    E = _ext_ops(F)
    spec = common.spec
    g = spec.two_adic_generator(common.degree_bits)
    zeta_next = tuple(F.mul_const(c, g) for c in zeta)

    # zeta^n != 1 (prover.rs:332: opening point must avoid the subgroup)
    zz = zeta
    for _ in range(common.degree_bits):
        zz = E.mul(zz, zz)
    one = F.ones(())
    zero = F.zeros(())
    in_subgroup = F.eq(zz[0], one)
    for c in zz[1:]:
        in_subgroup = in_subgroup & F.eq(c, zero)
    zeta_ok = ~in_subgroup

    n = fftm.tshape(cs_coeffs)[-1]
    pows_z = _ext_powers_traced(E, zeta, n)
    pows_zn = _ext_powers_traced(E, zeta_next, n)

    def ev(coeffs, pows):
        return tuple(
            F.batch_sum(F.mul(coeffs, tree_map(lambda a: a[None, :], p)),
                        axis=-1)
            for p in pows)

    cs_ev = ev(cs_coeffs, pows_z)
    wires_ev = ev(wires_coeffs, pows_z)
    zs_pp_ev = ev(zs_pp_coeffs, pows_z)
    zs_pp_next_ev = ev(zs_pp_coeffs, pows_zn)
    quot_ev = ev(quot_coeffs, pows_z)

    pp1 = common.partial_products_range()[1]
    lk0 = common.num_zs_partial_products_polys()
    nch = common.config.num_challenges

    b0 = tuple(
        jax_concat([cs_ev[d], wires_ev[d],
                    tree_map(lambda a: a[:pp1], zs_pp_ev[d]),
                    quot_ev[d],
                    tree_map(lambda a: a[lk0:], zs_pp_ev[d])])
        for d in range(E.D))
    b1 = tuple(
        jax_concat([tree_map(lambda a: a[:nch], zs_pp_next_ev[d]),
                    tree_map(lambda a: a[lk0:], zs_pp_next_ev[d])])
        for d in range(E.D))
    return b0, b1, _flat(b0), _flat(b1), zeta_next, zeta_ok


def jax_concat(parts):
    return fftm.tconcat(parts, axis=0)


def _flat(comps):
    """(D arrays of (P,)) -> flat (P*D,), element-major (ext-element order,
    matching Challenger.observe_extension_elements)."""
    import jax.numpy as jnp

    stacked = tree_map(lambda *xs: jnp.stack(xs, axis=0), *comps)  # (D, P)
    return tree_map(lambda a: a.T.reshape(-1), stacked)


# --------------------------------------------------------------------------
# final gather: flags + caps + openings + final poly + query data, ONE fetch
# --------------------------------------------------------------------------


def _finalize_body(F, n_lde, arity_bits_list, commit_caps, fold_caps,
                   b0_flat, b1_flat, final_flat, pow_witness, pow_ok,
                   zeta_ok, any_zero, query_ch, trees_leaves, trees_levels):
    import jax.numpy as jnp

    def flag(b):
        return F.from_u32(jnp.asarray(b).reshape(1).astype(jnp.uint32))

    chunks = [flag(zeta_ok), flag(pow_ok), flag(~any_zero),
              tree_map(lambda a: a.reshape(1), pow_witness)]
    for cap in commit_caps + fold_caps:
        chunks.append(tree_map(lambda a: a.reshape(-1), cap))
    chunks.append(b0_flat)
    chunks.append(b1_flat)
    chunks.append(final_flat)

    # query indices: x mod n_lde (power of two) from the low challenge limb
    idx = F.index_low_bits(query_ch, n_lde)
    cur = idx
    idx_per_tree = []
    n_oracles = len(trees_leaves) - len(arity_bits_list)
    for _ in range(n_oracles):
        idx_per_tree.append(idx)
    for ab in arity_bits_list:
        cur = cur >> ab
        idx_per_tree.append(cur)

    for leaves, levels, ix in zip(trees_leaves, trees_levels, idx_per_tree):
        rows = tree_map(lambda a: a[ix], leaves)
        chunks.append(tree_map(lambda a: a.reshape(-1), rows))
        cix = ix
        for lv in levels:
            sib = cix ^ 1
            chunks.append(tree_map(lambda a: a[sib].reshape(-1), lv))
            cix = cix >> 1
    return fftm.tconcat(chunks, axis=0)


# --------------------------------------------------------------------------
# the async prove
# --------------------------------------------------------------------------


def internal_prove_async(prover_data, common, wires_values,
                         witness, public_inputs: List[int], F, hasher,
                         inner_hasher=None) -> ProofWithPublicInputs:
    """``wires_values``: dense (num_wires, degree) device matrix;
    ``witness``: host matrix for lookup circuits, else None."""
    from . import vanishing
    from .prover import _kernels, compute_lookup_polys

    spec = common.spec
    config = common.config
    E = _ext_ops(F)
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height
    nch = config.num_challenges
    inner_hasher = inner_hasher or hasher
    zk = config.zero_knowledge

    kern = _kernels(prover_data, common, F, hasher)
    public_inputs_hash = inner_hasher.hash_no_pad_host(public_inputs)

    dc = DeviceChallenger(F, hasher)
    dc.observe_host_ints(list(prover_data.circuit_digest))
    dc.observe_host_ints(list(public_inputs_hash))

    wires_commitment = PolynomialBatch.from_values(
        F, wires_values, rate_bits, cap_height, hasher=hasher, blinding=zk)
    cap_size = 1 << cap_height
    dw = hasher.NUM_HASH_OUT
    dc.observe_cap(wires_commitment.tree.cap, cap_size, dw)

    betas = dc.get_n_challenges(nch)
    gammas = dc.get_n_challenges(nch)

    has_lookup = common.num_lookup_polys != 0
    deltas_dev = F.zeros((0,))
    deltas_host: List[int] = []
    if has_lookup:
        additional = dc.get_n_challenges(2 * nch)
        deltas_dev = fftm.tconcat([betas, gammas, additional], axis=0)
        # lookup polys are host-computed: ONE sync fetch of the deltas
        deltas_host = [int(x) for x in F.to_ints(deltas_dev)]

    routed = tree_map(lambda a: a[:config.num_routed_wires], wires_values)
    zs_partial_products, any_zero = kern.pp_fn(routed, betas, gammas)

    lut_re_evals = []
    if has_lookup:
        import jax.numpy as jnp

        lookup_cols = []
        for i in range(nch):
            lookup_cols.extend(compute_lookup_polys(
                common, prover_data, witness,
                deltas_host[4 * i:4 * (i + 1)]))
        lookup_arr = F.from_ints(np.array(lookup_cols, dtype=np.uint64))
        zs_partial_products = tree_map(
            lambda a, b: jnp.concatenate([a, b], axis=0),
            zs_partial_products, lookup_arr)
        lut_re_evals = vanishing.get_lut_re_evals(common, deltas_host)

    zs_pp_commitment = PolynomialBatch.from_values(
        F, zs_partial_products, rate_bits, cap_height, hasher=hasher,
        blinding=zk)
    dc.observe_cap(zs_pp_commitment.tree.cap, cap_size, dw)

    alphas = dc.get_n_challenges(nch)

    flat_lut_re = [v for evs in lut_re_evals for v in evs]
    quotient_chunks = kern.quotient_fn(
        prover_data.constants_sigmas_commitment.lde,
        wires_commitment.lde, zs_pp_commitment.lde,
        to_arr_f(F, public_inputs_hash), betas, gammas, alphas, deltas_dev,
        to_arr_f(F, flat_lut_re))
    quotient_commitment = PolynomialBatch(
        F, quotient_chunks, rate_bits, cap_height, hasher=hasher,
        blinding=zk)
    dc.observe_cap(quotient_commitment.tree.cap, cap_size, dw)

    zeta = dc.get_extension_challenge(E.D)

    oracles = [prover_data.constants_sigmas_commitment, wires_commitment,
               zs_pp_commitment, quotient_commitment]

    opening_fn = _get_openings_jit(F, common, prover_data)
    b0, b1, b0_flat, b1_flat, zeta_next, zeta_ok = opening_fn(
        oracles[0].coeffs, oracles[1].coeffs, oracles[2].coeffs,
        oracles[3].coeffs, zeta)
    P0 = _batch0_len(common)
    P1 = _batch1_len(common)
    dc.observe_array(b0_flat, P0 * E.D)
    dc.observe_array(b1_flat, P1 * E.D)

    instance = common.get_fri_instance(tuple([0] * E.D))
    fold_trees, final_coeffs, pow_witness, pow_ok, query_ch = \
        fri_prover.prove_openings_async(
            F, instance, oracles, dc, common.fri_params, (b0, b1),
            (zeta, zeta_next), hasher)

    # ---- final gather: ONE blocking fetch ----
    keep = fftm.tshape(final_coeffs[0])[-1]
    finalize = _get_finalize_jit(F, common, prover_data)
    all_trees = [o.tree for o in oracles] + list(fold_trees)
    mega = finalize(
        tuple(c.tree.cap for c in
              (wires_commitment, zs_pp_commitment, quotient_commitment)),
        tuple(t.cap for t in fold_trees),
        b0_flat, b1_flat, _flat(final_coeffs),
        pow_witness, tree_map(lambda a: a[0], pow_ok), zeta_ok, any_zero,
        query_ch,
        tuple(t.leaves for t in all_trees),
        tuple(tuple(t.levels[:t.num_layers]) for t in all_trees))
    flat = F.to_ints(mega)

    return _assemble_proof(F, common, prover_data, flat, all_trees,
                           fold_trees, keep, public_inputs, P0, P1,
                           cap_size, dw)


def to_arr_f(F, vals):
    return F.from_ints(np.fromiter((int(v) for v in vals), dtype=np.uint64,
                                   count=len(vals)))


def _batch0_len(common):
    return (common.num_preprocessed_polys() + common.config.num_wires
            + common.partial_products_range()[1]
            + common.num_quotient_polys() + common.num_all_lookup_polys())


def _batch1_len(common):
    return common.config.num_challenges + common.num_all_lookup_polys()


def _get_openings_jit(F, common, prover_data):
    cache = getattr(prover_data, "_async_jits", None)
    if cache is None:
        cache = prover_data._async_jits = {}
    fn = cache.get("openings")
    if fn is None:
        from functools import partial

        fn = jax.jit(partial(_openings_async_body, F, common))
        cache["openings"] = fn
    return fn


def _get_finalize_jit(F, common, prover_data):
    cache = getattr(prover_data, "_async_jits", None)
    if cache is None:
        cache = prover_data._async_jits = {}
    fn = cache.get("finalize")
    if fn is None:
        from functools import partial

        n_lde = common.degree << common.config.fri_config.rate_bits
        fn = jax.jit(partial(
            _finalize_body, F, n_lde,
            tuple(common.fri_params.reduction_arity_bits)))
        cache["finalize"] = fn
    return fn


def _assemble_proof(F, common, prover_data, flat, all_trees, fold_trees,
                    keep, public_inputs, P0, P1, cap_size, dw):
    from .prover import InvZeroPermArg

    E = _ext_ops(F)
    spec = common.spec
    pos = 0

    def take(n):
        nonlocal pos
        out = flat[pos:pos + n]
        pos += n
        return out

    zeta_ok, pow_ok, perm_ok = int(take(1)[0]), int(take(1)[0]), \
        int(take(1)[0])
    pow_witness = int(take(1)[0])
    if not perm_ok:
        raise InvZeroPermArg()
    assert zeta_ok, "opening point is in subgroup"
    assert pow_ok, "PoW grind response check failed"

    def take_cap():
        c = take(cap_size * dw).reshape(cap_size, dw)
        return [[int(x) for x in row] for row in c]

    wires_cap = take_cap()
    zs_pp_cap = take_cap()
    quotient_cap = take_cap()
    fold_caps = [take_cap() for _ in fold_trees]

    b0_vals = take(P0 * E.D).reshape(P0, E.D)
    b1_vals = take(P1 * E.D).reshape(P1, E.D)
    final_vals = take(keep * E.D).reshape(keep, E.D)
    final_poly = [tuple(int(x) for x in row) for row in final_vals]

    nq = common.fri_params.config.num_query_rounds
    tree_data = []
    for t in all_trees:
        rows = take(nq * t.leaf_len).reshape(nq, t.leaf_len)
        leaf_rows = [[int(x) for x in row] for row in rows]
        chains = [[] for _ in range(nq)]
        for _ in range(t.num_layers):
            lvl = take(nq * dw).reshape(nq, dw)
            for q in range(nq):
                chains[q].append([int(x) for x in lvl[q]])
        tree_data.append((leaf_rows, chains))
    assert pos == len(flat), (pos, len(flat))

    # openings
    def ext_rows(vals):
        return [tuple(int(x) for x in row) for row in vals]

    b0_ext = ext_rows(b0_vals)
    b1_ext = ext_rows(b1_vals)
    c0, c1 = common.constants_range()
    s0, s1 = common.sigmas_range()
    z0, z1 = common.zs_range()
    pp0, pp1 = common.partial_products_range()
    lk0 = common.num_zs_partial_products_polys()
    npre = common.num_preprocessed_polys()
    nw = common.config.num_wires
    nq_polys = common.num_quotient_polys()
    nch = common.config.num_challenges
    o = 0
    pre = b0_ext[o:o + npre]; o += npre
    wires_ev = b0_ext[o:o + nw]; o += nw
    zs_pp_ev = b0_ext[o:o + pp1]; o += pp1
    quot_ev = b0_ext[o:o + nq_polys]; o += nq_polys
    lookups_ev = b0_ext[o:]
    openings = OpeningSet(
        constants=pre[c0:c1], plonk_sigmas=pre[s0:s1], wires=wires_ev,
        plonk_zs=zs_pp_ev[z0:z1], plonk_zs_next=b1_ext[:nch],
        partial_products=zs_pp_ev[pp0:pp1], quotient_polys=quot_ev,
        lookup_zs=lookups_ev, lookup_zs_next=b1_ext[nch:])

    n_oracles = len(all_trees) - len(fold_trees)
    rounds = []
    for q in range(nq):
        evals_proofs = [(tree_data[t][0][q], tree_data[t][1][q])
                        for t in range(n_oracles)]
        steps = []
        for i in range(len(fold_trees)):
            leaf = tree_data[n_oracles + i][0][q]
            evals = [tuple(leaf[j * E.D + d] for d in range(E.D))
                     for j in range(len(leaf) // E.D)]
            steps.append(FriQueryStep(
                evals=evals, merkle_proof=tree_data[n_oracles + i][1][q]))
        rounds.append(FriQueryRound(
            initial_trees_proof=FriInitialTreeProof(
                evals_proofs=evals_proofs),
            steps=steps))

    opening_proof = FriProof(
        commit_phase_merkle_caps=fold_caps,
        query_round_proofs=rounds,
        final_poly=final_poly,
        pow_witness=pow_witness)
    proof = Proof(
        wires_cap=wires_cap,
        plonk_zs_partial_products_cap=zs_pp_cap,
        quotient_polys_cap=quotient_cap,
        openings=openings,
        opening_proof=opening_proof)
    return ProofWithPublicInputs(proof=proof, public_inputs=public_inputs)
