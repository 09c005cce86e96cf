"""Data-parallel batched prover: N proofs of one circuit, one per device.

The single-proof prover (plonk/prover.py:_internal_prove) alternates host
Fiat-Shamir with per-phase jitted device programs.  Here every device phase
runs ONCE for the whole batch — ``jax.vmap`` lifts the existing jitted
phase bodies over a leading proof axis, and that axis is sharded across the
mesh (``NamedSharding(mesh, P("x"))``), so GSPMD executes each proof's
slice on its own device with no cross-device collectives (proofs are
independent).  Host transcripts stay per-proof; batched device->host
fetches happen once per phase boundary (caps, openings, final polys).

This is the first half of the BASELINE configs[4] scale target (256 proofs
batch-DP); the reference's analog is running independent prover processes
(maybe_rayon parallelism, reference plonky2/src/plonk/prover.rs:136).

Scope: full parity with the sequential prover — zk (per-proof blinding
salts, drawn in the sequential prover's global stream order so proofs stay
byte-identical, reference fri/oracle.rs:139-149) and lookup circuits
(per-proof delta transcripts + device-scan lookup polys, reference
prover.rs:283-299,555-674) included.  Same proof bytes as N sequential
``prove`` calls given the same witnesses/stream, so the standard verifier
accepts each proof.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..field import fft as fftm
from ..field import gl as gl_mod
from ..field import host
from ..fri import oracle
from ..fri import prover as fri_prover
from ..hash import merkle, poseidon_gl
from ..hash.challenger import Challenger
from ..iop.generator import generate_partial_witness
from ..plonk import prover as plonk_prover
from ..plonk.proof import OpeningSet, Proof, ProofWithPublicInputs

tree_map = jax.tree_util.tree_map


def _shard_b(mesh, x):
    """Shard the leading (proof) axis of every leaf over the mesh axis."""
    def put(a):
        spec = P("x") if a.ndim >= 1 else P()
        return jax.device_put(a, NamedSharding(mesh, spec))
    return tree_map(put, x)


def _slice_b(tree, b):
    return tree_map(lambda a: a[b], tree)


def _oracle_from_precomputed(F, coeffs, rate_bits, cap_height, hasher,
                             lde, leaves, levels):
    return oracle.PolynomialBatch(
        F, coeffs, rate_bits, cap_height, hasher=hasher,
        _precomputed=(lde, leaves, levels))


def dp_prove_batch(prover_data, common, inputs_list, mesh,
                   F=gl_mod, hasher=poseidon_gl,
                   witnesses_publics=None) -> List[ProofWithPublicInputs]:
    """Prove the same circuit for each PartialWitness in ``inputs_list``,
    batching every device phase across proofs (sharded over ``mesh``).

    ``witnesses_publics``: optional list of (full_witness ndarray,
    public_inputs) pairs; when given, witness generation is skipped (the
    generator fills unset wires from the global random stream, so callers
    that need byte-reproducible proofs pin the witness here).

    Returns one ProofWithPublicInputs per witness, each of which verifies
    with the standard single-proof verifier."""
    spec = common.spec
    config = common.config
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height
    nch = config.num_challenges
    degree = common.degree
    shift = spec.coset_shift
    E = plonk_prover._ext_ops(F)
    zk = config.zero_knowledge
    has_lookup = common.num_lookup_polys != 0

    kern = plonk_prover._kernels(prover_data, common, F, hasher)

    # ---- host: witness generation per proof --------------------------------
    # zk salts draw per proof HERE, in the exact global-stream order the
    # sequential prover consumes them (witgen, then wires/zs/quotient salts,
    # per proof) so deterministic-mode proofs stay byte-identical.
    lde_size = degree << rate_bits

    def draw_salts():
        return (oracle._random_salt(F, lde_size),
                oracle._random_salt(F, lde_size),
                oracle._random_salt(F, lde_size))

    witnesses = []
    publics = []
    pi_hashes = []
    salts = []
    if witnesses_publics is not None:
        for w, pub in witnesses_publics:
            witnesses.append(w)
            publics.append(pub)
            pi_hashes.append(hasher.hash_no_pad_host(pub))
            if zk:
                salts.append(draw_salts())
    else:
        for pw in inputs_list:
            partition = generate_partial_witness(pw, prover_data, common)
            if has_lookup:
                plonk_prover.set_lookup_wires(prover_data, common, partition)
            publics.append(partition.get_targets(prover_data.public_inputs))
            witnesses.append(partition.full_witness())
            pi_hashes.append(hasher.hash_no_pad_host(publics[-1]))
            if zk:
                salts.append(draw_salts())
    B = len(witnesses)

    def to_arr(vals):
        return F.from_ints(np.fromiter((int(v) for v in vals),
                                       dtype=np.uint64,
                                       count=max(len(vals), 0)))

    def stack_ints(rows):
        return F.from_ints(np.array(rows, dtype=np.uint64))

    # ---- phase 1: batched wires commit -------------------------------------
    wires_b = _shard_b(mesh, F.from_ints(np.stack(witnesses)))  # (B, W, D)

    def stack_f(arrs):
        return _shard_b(mesh, tree_map(lambda *ls: jnp.stack(ls), *arrs))

    if zk:
        commit_values_b = jax.jit(jax.vmap(
            lambda v, s: oracle.commit_values_salted(
                F, v, s, rate_bits, cap_height, shift, hasher)))
        w_coeffs, w_lde, w_leaves, w_levels = commit_values_b(
            wires_b, stack_f([s[0] for s in salts]))
    else:
        commit_values_b = jax.jit(jax.vmap(
            lambda v: oracle.commit_values(F, v, rate_bits, cap_height,
                                           shift, hasher)))
        w_coeffs, w_lde, w_leaves, w_levels = commit_values_b(wires_b)
    wires_caps = [merkle.MerkleTree(_slice_b(w_leaves, b), cap_height,
                                    hasher, levels=_slice_b(w_levels, b))
                  for b in range(B)]

    challengers = []
    betas_b, gammas_b, deltas_b = [], [], []
    for b in range(B):
        ch = Challenger(spec=spec, permute=hasher.permute_host,
                        width=hasher.WIDTH, rate=hasher.RATE)
        ch.observe_hash(prover_data.circuit_digest)
        ch.observe_hash(pi_hashes[b])
        ch.observe_cap(wires_caps[b].cap_host())
        betas_b.append(ch.get_n_challenges(nch))
        gammas_b.append(ch.get_n_challenges(nch))
        if has_lookup:
            # reuse betas and gammas as the first deltas (prover.rs:283-299)
            additional = ch.get_n_challenges(2 * nch)
            deltas_b.append(list(betas_b[-1]) + list(gammas_b[-1])
                            + additional)
        else:
            deltas_b.append([])
        challengers.append(ch)

    # ---- phase 2: batched partial products ---------------------------------
    routed_b = tree_map(lambda a: a[:, :config.num_routed_wires], wires_b)
    pp_b = jax.jit(jax.vmap(lambda r, be, ga: kern.pp_fn(r, be, ga)))
    zs_pp_b, any_zero_b = pp_b(routed_b, stack_ints(betas_b),
                               stack_ints(gammas_b))
    if bool(np.asarray(jax.device_get(any_zero_b)).any()):
        raise plonk_prover.InvZeroPermArg(
            "dp_prove_batch: permutation argument hit a zero denominator")

    lut_re_b = []
    if has_lookup:
        from ..plonk import vanishing
        lookup_rows_b = []
        for b in range(B):
            cols = []
            for i in range(nch):
                cols.extend(plonk_prover.compute_lookup_polys(
                    common, prover_data, witnesses[b],
                    deltas_b[b][4 * i:4 * (i + 1)]))
            lookup_rows_b.append(np.array(cols, dtype=np.uint64))
            lut_re_b.append([v for evs in vanishing.get_lut_re_evals(
                common, deltas_b[b]) for v in evs])
        lookup_arr_b = _shard_b(mesh, F.from_ints(np.stack(lookup_rows_b)))
        zs_pp_b = tree_map(lambda a, l: jnp.concatenate([a, l], axis=1),
                           zs_pp_b, lookup_arr_b)

    # ---- phase 3: batched Z/partial-product commit -------------------------
    if zk:
        z_coeffs, z_lde, z_leaves, z_levels = commit_values_b(
            zs_pp_b, stack_f([s[1] for s in salts]))
    else:
        z_coeffs, z_lde, z_leaves, z_levels = commit_values_b(zs_pp_b)
    zs_trees = [merkle.MerkleTree(_slice_b(z_leaves, b), cap_height, hasher,
                                  levels=_slice_b(z_levels, b))
                for b in range(B)]
    alphas_b = []
    for b in range(B):
        challengers[b].observe_cap(zs_trees[b].cap_host())
        alphas_b.append(challengers[b].get_n_challenges(nch))

    # ---- phase 4: batched quotient -----------------------------------------
    cs_lde = prover_data.constants_sigmas_commitment.lde
    quot_b_fn = jax.vmap(
        lambda wl, zl, pi, be, ga, al, de, lr: kern.quotient_fn(
            cs_lde, wl, zl, pi, be, ga, al, de, lr),
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0))
    quot_coeffs_b = quot_b_fn(
        w_lde, z_lde, stack_ints(pi_hashes), stack_ints(betas_b),
        stack_ints(gammas_b), stack_ints(alphas_b), stack_ints(deltas_b),
        stack_ints(lut_re_b if has_lookup else [[] for _ in range(B)]))

    if zk:
        commit_coeffs_b = jax.jit(jax.vmap(
            lambda c, s: oracle.commit_coeffs_salted(
                F, c, s, rate_bits, cap_height, shift, hasher)))
        q_lde, q_leaves, q_levels = commit_coeffs_b(
            quot_coeffs_b, stack_f([s[2] for s in salts]))
    else:
        commit_coeffs_b = jax.jit(jax.vmap(
            lambda c: oracle.commit_coeffs(F, c, rate_bits, cap_height,
                                           shift, hasher)))
        q_lde, q_leaves, q_levels = commit_coeffs_b(quot_coeffs_b)
    zetas = []
    for b in range(B):
        q_tree = merkle.MerkleTree(_slice_b(q_leaves, b), cap_height,
                                   hasher, levels=_slice_b(q_levels, b))
        challengers[b].observe_cap(q_tree.cap_host())
        zeta = challengers[b].get_extension_challenge()
        assert host.ext_pow(spec, zeta, degree) != host.ext_one(spec)
        zetas.append(zeta)

    # ---- phase 5: batched opening evaluation -------------------------------
    g = spec.two_adic_generator(common.degree_bits)
    zetas_next = [host.ext_scalar_mul(spec, z, g) for z in zetas]
    cs_coeffs = prover_data.constants_sigmas_commitment.coeffs

    def pts_of(zs):
        """List of B host ext tuples -> batched ext scalar (D x (B,))."""
        return tuple(
            tree_map(lambda a: a[:, d],
                     F.from_ints(np.array([list(z) for z in zs],
                                          dtype=np.uint64)))
            for d in range(E.D))

    point_ids = (0, 0, 0, 1, 0)
    eval_b = jax.jit(jax.vmap(
        lambda wc, zc, qc, pts: plonk_prover._eval_commitments_jit(
            F, point_ids, (cs_coeffs, wc, zc, zc, qc), pts),
        in_axes=(0, 0, 0, 0)))
    all_evals_b = eval_b(w_coeffs, z_coeffs, quot_coeffs_b,
                         (pts_of(zetas), pts_of(zetas_next)))

    # ONE stacked fetch for all proofs' opening values
    flat = [a for evals in all_evals_b for a in evals]     # list of (B, P_i)
    widths = [fftm.tshape(a)[-1] for a in flat]
    stacked_host = F.to_ints(tree_map(
        lambda *ls: jnp.concatenate(ls, axis=-1), *flat))  # (B, sum P_i)

    c0, c1 = common.constants_range()
    s0, s1 = common.sigmas_range()
    z0, z1 = common.zs_range()
    pp0, pp1 = common.partial_products_range()
    lk0 = common.num_zs_partial_products_polys()

    openings_list = []
    for b in range(B):
        pieces = []
        off = 0
        for w in widths:
            pieces.append(stacked_host[b, off:off + w])
            off += w
        it = iter(range(len(flat)))

        def unpack():
            idxs = [next(it) for _ in range(E.D)]
            num = len(pieces[idxs[0]])
            return [tuple(int(pieces[i][j]) for i in idxs)
                    for j in range(num)]

        cs_eval = unpack()
        wires_eval = unpack()
        zs_eval = unpack()
        zs_next_eval = unpack()
        q_eval = unpack()
        openings_list.append(OpeningSet(
            constants=cs_eval[c0:c1], plonk_sigmas=cs_eval[s0:s1],
            wires=wires_eval, plonk_zs=zs_eval[z0:z1],
            plonk_zs_next=zs_next_eval[z0:z1],
            partial_products=zs_eval[pp0:pp1], quotient_polys=q_eval,
            lookup_zs=zs_eval[lk0:], lookup_zs_next=zs_next_eval[lk0:]))

    # ---- phase 6: FRI (batched combine + per-round batched fold/commit) ----
    proofs = []
    alphas_fri = []
    instances = []
    for b in range(B):
        fri_openings = openings_list[b].to_fri_openings()
        for batch_vals in fri_openings:
            challengers[b].observe_extension_elements(batch_vals)
        inst = common.get_fri_instance(zetas[b])
        for batch, vals in zip(inst.batches, fri_openings):
            batch.values = vals
        instances.append(inst)
        alphas_fri.append(challengers[b].get_extension_challenge())

    batch_indices = tuple(
        tuple((p.oracle_index, p.polynomial_index)
              for p in batch.polynomials)
        for batch in instances[0].batches)

    def fri_host_args(b):
        inst = instances[b]
        alpha = alphas_fri[b]
        reduced = [fri_prover.reduce_openings(spec, bt.values, alpha)
                   for bt in inst.batches]
        weights = [[host.ext_pow(spec, alpha, j) for j in range(len(polys))]
                   for polys in batch_indices]
        points = [tuple(bt.point) for bt in inst.batches]
        shift_pows = [host.ext_pow(spec, alpha, len(polys))
                      for polys in batch_indices]
        return reduced, weights, points, shift_pows

    per = [fri_host_args(b) for b in range(B)]

    def stack_ext_scalars(vals):
        """B host ext tuples -> batched ext scalar (components (B,))."""
        arr = F.from_ints(np.array([list(v) for v in vals], dtype=np.uint64))
        return tuple(tree_map(lambda a: a[:, d], arr) for d in range(E.D))

    weights_b = [
        tuple(
            F.from_ints(np.array([[per[b][1][k][j][d]
                                   for j in range(len(batch_indices[k]))]
                                  for b in range(B)], dtype=np.uint64))
            for d in range(E.D))
        for k in range(len(batch_indices))]
    red_b = [stack_ext_scalars([per[b][0][k] for b in range(B)])
             for k in range(len(batch_indices))]
    pts_b = [stack_ext_scalars([per[b][2][k] for b in range(B)])
             for k in range(len(batch_indices))]
    sp_b = [stack_ext_scalars([per[b][3][k] for b in range(B)])
            for k in range(len(batch_indices))]

    combine_b = jax.jit(jax.vmap(
        lambda wl, zl, ql, w8, ro, pt, sp: fri_prover._combine_and_ifft(
            F, batch_indices, shift, (cs_lde, wl, zl, ql), w8, ro, pt, sp),
        in_axes=(0, 0, 0, 0, 0, 0, 0)))
    values_b, coeffs_b = combine_b(w_lde, z_lde, q_lde, weights_b, red_b,
                                   pts_b, sp_b)

    fri_params = common.fri_params
    trees_per_proof = [[] for _ in range(B)]
    cur_shift = shift
    for arity_bits in fri_params.reduction_arity_bits:
        arity = 1 << arity_bits
        rc_b = jax.jit(jax.vmap(
            lambda v: fri_prover._round_commit_jit(F, v, arity, cap_height,
                                                   hasher)))
        r_leaves, r_levels = rc_b(values_b)
        betas_fri = []
        for b in range(B):
            tree = merkle.MerkleTree(_slice_b(r_leaves, b), cap_height,
                                     hasher, levels=_slice_b(r_levels, b))
            challengers[b].observe_cap(tree.cap_host())
            trees_per_proof[b].append(tree)
            betas_fri.append(challengers[b].get_extension_challenge())
        beta_pows_b = tuple(
            stack_ext_scalars([host.ext_pow(spec, betas_fri[b], r)
                               for b in range(B)])
            for r in range(arity))
        cur_shift = pow(cur_shift, arity, spec.p)
        fold_b = jax.jit(jax.vmap(
            lambda bp, c: fri_prover._fold_round_jit(F, arity, bp,
                                                     cur_shift, c)))
        coeffs_b, values_b = fold_b(beta_pows_b, coeffs_b)

    # final coefficients (batched fetch)
    m = fftm.tshape(coeffs_b[0])[-1]
    keep = m >> fri_params.config.rate_bits
    final_host = E.to_ints(tuple(tree_map(lambda a: a[:, :keep], c)
                                 for c in coeffs_b))   # D x (B, keep)
    fri_proofs = []
    for b in range(B):
        final_poly = [tuple(int(final_host[d][b, i]) for d in range(E.D))
                      for i in range(keep)]
        ch = challengers[b]
        ch.observe_extension_elements(final_poly)
        pow_witness = fri_prover.fri_proof_of_work(F, ch, fri_params.config,
                                                   hasher)
        ch.observe_element(pow_witness)
        pow_response = ch.get_challenge()
        min_lz = fri_params.config.proof_of_work_bits + (64 - spec.bits)
        assert fri_prover._leading_zeros64(pow_response) >= min_lz
        n_lde = fri_params.lde_size
        x_indices = [r % n_lde for r in ch.get_n_challenges(
            fri_params.config.num_query_rounds)]
        initial_trees = [
            prover_data.constants_sigmas_commitment,
            _mk_oracle(F, _slice_b(w_coeffs, b), rate_bits, cap_height,
                       hasher, _slice_b(w_lde, b), _slice_b(w_leaves, b),
                       _slice_b(w_levels, b)),
            _mk_oracle(F, _slice_b(z_coeffs, b), rate_bits, cap_height,
                       hasher, _slice_b(z_lde, b), _slice_b(z_leaves, b),
                       _slice_b(z_levels, b)),
            _mk_oracle(F, _slice_b(quot_coeffs_b, b), rate_bits, cap_height,
                       hasher, _slice_b(q_lde, b), _slice_b(q_leaves, b),
                       _slice_b(q_levels, b)),
        ]
        query_rounds = fri_prover._query_rounds(
            E, initial_trees, trees_per_proof[b], x_indices, fri_params)
        from ..plonk.proof import FriProof
        fri_proofs.append(FriProof(
            commit_phase_merkle_caps=[t.cap_host()
                                      for t in trees_per_proof[b]],
            query_round_proofs=query_rounds,
            final_poly=final_poly,
            pow_witness=pow_witness))

    for b in range(B):
        proofs.append(ProofWithPublicInputs(
            proof=Proof(
                wires_cap=wires_caps[b].cap_host(),
                plonk_zs_partial_products_cap=zs_trees[b].cap_host(),
                quotient_polys_cap=merkle.MerkleTree(
                    _slice_b(q_leaves, b), cap_height, hasher,
                    levels=_slice_b(q_levels, b)).cap_host(),
                openings=openings_list[b],
                opening_proof=fri_proofs[b]),
            public_inputs=publics[b]))
    return proofs


def _mk_oracle(F, coeffs, rate_bits, cap_height, hasher, lde, leaves,
               levels):
    return oracle.PolynomialBatch(
        F, coeffs, rate_bits, cap_height, hasher=hasher,
        _precomputed=(lde, leaves, levels))
