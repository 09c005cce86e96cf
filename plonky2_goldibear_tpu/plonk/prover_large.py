"""Large-domain prover: end-to-end proofs at degrees whose dense LDEs
exceed single-chip HBM (reference capability match fri/oracle.rs:68-123 +
fri/prover.rs:190-255; BASELINE configs with 2^23+-point LDEs).

No oracle ever materializes its LDE or leaf rows:

- **Commits** stream RATE-poly blocks through the overwrite-mode leaf
  sponge (fri/oracle.py commit_*_streaming) — caps bit-identical to the
  dense commit; the oracle keeps coefficients + Merkle digest levels only
  (StreamingPolynomialBatch).
- **Quotient** evaluates per SUB-COSET of the quotient domain: natural
  index k = j*qdf + c is the point shift*w^c*g_n^j, so sub-coset c is one
  n-point FFT of shift-scaled coefficients; the next-row rotation (k+qdf)
  stays inside a sub-coset (roll by one in j) and Z_H is CONSTANT on it.
  The per-gate quotient programs (plonk/prover.py:_quotient_split_fns) run
  UNCHANGED on each block with (step=1, next_step=1, m=n).  Quotient
  coefficients recombine from the per-sub-coset IFFTs by a size-qdf
  inverse DFT across sub-cosets: with sigma_c = shift*w^c and omega = w^n,
      ifft(vals_c)[t] * sigma_c^-t = sum_s q_{t+s*n} * shift^{s*n} *
                                     omega^{c*s},
  so q_{t+s*n} = shift^{-s*n}/qdf * sum_c (...) * omega^{-c*s}.
- **FRI combine** accumulates the reduced codeword per sub-coset of the
  LDE domain (same FFT trick), then one full-size ext IFFT (the combined
  codeword is a single ext vector — small).  Fold rounds and their commit
  trees are unchanged (they operate on ext vectors of <= lde_size).
- **Query rounds** re-derive each oracle's 28 leaf rows by direct
  evaluation of the coefficients at the queried points (one (Q,n) power
  table + one contraction per oracle); sibling chains gather from the
  stored digest levels (StreamingTree.prove_batch).

Scope: non-zk, non-lookup circuits (asserted).  Bit-identical to the
dense prover at any degree (tests/test_prover_large.py cross-checks at a
small degree); an on-chip 2^20 run is scripts/large_prove_onchip.py.
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fft as fftm
from ..field import gl as gl_mod
from ..field import host
from ..fri import prover as fri_prover
from ..fri.oracle import StreamingPolynomialBatch
from ..hash import poseidon_gl
from ..hash.challenger import Challenger
from ..iop.generator import generate_partial_witness
from ..plonk import prover as plonk_prover
from ..plonk.proof import (FriProof, Proof, ProofWithPublicInputs,
                           FriQueryRound, FriQueryStep, FriInitialTreeProof)

tree_map = jax.tree_util.tree_map


# --------------------------------------------------------------------------
# sub-coset evaluation: values of a coefficient batch on shift_c * <g_n>
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0,))
def _subcoset_values_jit(F, coeffs, shift_pows):
    """(P, n) coeffs -> values on the coset {shift_c * g_n^j}: one plain
    FFT of shift-scaled coefficients.  shift_pows = [shift_c^t]_t enters
    traced, so ONE compilation serves every sub-coset."""
    scaled = F.mul(coeffs, tree_map(lambda a: a[None, :], shift_pows))
    return fftm.fft(F, scaled)


@partial(jax.jit, static_argnums=(0,))
def _quotient_block_tail_jit(F, rest_stack, contribs, zh_inv_c):
    """total = rest + sum(gate contribs); divide by the (constant-on-block)
    Z_H value; plain IFFT.  Returns B_c = ifft(q_values_c): (nch, n)."""
    total = rest_stack
    for c in contribs:
        total = F.add(total, c)
    q_values = F.mul(total, zh_inv_c)
    return fftm.ifft(F, q_values)


@partial(jax.jit, static_argnums=(0, 1))
def _recombine_chunks_jit(F, qdf, B_stack, inv_sigma_pows, omega_neg,
                          shift_neg_sn):
    """Per-sub-coset IFFTs -> quotient chunk rows (nch*qdf, n).

    B_stack: (R, nch, n); inv_sigma_pows: (R, n) = sigma_c^-t;
    omega_neg: (R, R) = qdf^-1 * omega^(-c*s); shift_neg_sn: (R,) =
    shift^(-s*n).  chunk_s = shift^(-s*n)/R * sum_c B_c * sigma_c^-t *
    omega^(-c*s)."""
    A = F.mul(B_stack, tree_map(lambda a: a[:, None, :], inv_sigma_pows))
    nch = fftm.tshape(B_stack)[1]
    rows = []
    for i in range(nch):
        A_i = tree_map(lambda a: a[:, i, :], A)            # (R, n)
        for s in range(qdf):
            coefs = tree_map(lambda a: a[:, s], omega_neg)  # (R,)
            term = F.batch_sum(
                F.mul(A_i, tree_map(lambda a: a[:, None], coefs)), axis=0)
            rows.append(F.mul(term,
                              tree_map(lambda a: a[s], shift_neg_sn)))
    return tree_map(lambda *ls: jnp.stack(ls, axis=0), *rows)


def _blocked_quotient(F, common, kern, cs_coeffs, wires_coeffs, zs_coeffs,
                      pi, betas, gammas, alphas):
    """Quotient coefficients without a resident LDE (see module doc)."""
    spec = common.spec
    p = spec.p
    n = common.degree
    qdb = kern.qdb
    R = 1 << qdb
    qdf = common.quotient_degree_factor
    assert R == qdf, (R, qdf)
    assert common.quotient_degree == qdf * n
    w = spec.two_adic_generator(common.degree_bits + qdb)
    g_n = spec.two_adic_generator(common.degree_bits)
    shift = spec.coset_shift
    omega = pow(w, n, p)                       # order-R root of unity
    gf_n = pow(shift, n, p)
    rest, gate_fns, _ = plonk_prover._quotient_split_fns(F, common)
    empty = F.from_ints(np.zeros((0,), dtype=np.uint64))

    B_list = []
    inv_sig_list = []
    for c in range(R):
        sigma_c = (shift * pow(w, c, p)) % p
        shift_pows = fftm.powers(F, sigma_c, n)
        xs_c = F.mul_const(fftm.powers(F, g_n, n), sigma_c)
        zh_c = (gf_n * pow(omega, c, p) - 1) % p
        zh_inv_c = F.from_ints(np.array([pow(zh_c, p - 2, p)],
                                        dtype=np.uint64))
        zh_inv_c = tree_map(lambda a: a[0], zh_inv_c)
        l0_c = _l0_block_jit(F, xs_c, zh_c, n % p)
        cs_vals = _subcoset_values_jit(F, cs_coeffs, shift_pows)
        wires_vals = _subcoset_values_jit(F, wires_coeffs, shift_pows)
        zs_vals = _subcoset_values_jit(F, zs_coeffs, shift_pows)
        rest_stack = rest(cs_vals, wires_vals, zs_vals, pi, betas, gammas,
                          alphas, empty, empty, xs_c, l0_c, 1, 1, n)
        contribs = tuple(
            gate_fns[gi](cs_vals, wires_vals, pi, alphas, 1, n)
            for gi in range(len(common.gates)))
        B_list.append(_quotient_block_tail_jit(F, rest_stack, contribs,
                                               zh_inv_c))
        inv_sig_list.append(fftm.powers(F, pow(sigma_c, p - 2, p), n))

    B_stack = tree_map(lambda *ls: jnp.stack(ls, axis=0), *B_list)
    inv_sigma_pows = tree_map(lambda *ls: jnp.stack(ls, axis=0),
                              *inv_sig_list)
    r_inv = pow(R, p - 2, p)
    # omega has multiplicative order R: omega^(-cs) = omega^((R - cs) mod R)
    omega_neg = F.from_ints(np.array(
        [[(pow(omega, (R - (c * s) % R) % R, p) * r_inv) % p
          for s in range(R)] for c in range(R)], dtype=np.uint64))
    shift_neg_sn = F.from_ints(np.array(
        [pow(pow(gf_n, s, p), p - 2, p) for s in range(R)],
        dtype=np.uint64))
    return _recombine_chunks_jit(F, qdf, B_stack, inv_sigma_pows,
                                 omega_neg, shift_neg_sn)


@partial(jax.jit, static_argnums=(0, 2, 3))
def _l0_block_jit(F, xs_c, zh_c: int, n_mod_p: int):
    """l_0 on a sub-coset: zh_c * inv(n * (x - 1)) (matches
    plonk/prover.py ProverKernels.l_0 elementwise)."""
    p = F.SPEC.p
    x_minus_1 = F.add(xs_c, F.full((), p - 1))
    return F.mul_const(F.inv(F.mul_const(x_minus_1, n_mod_p)), zh_c)


# --------------------------------------------------------------------------
# streamed FRI combine
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0, 1))
def _combine_block_jit(F, batch_indices, coeff_batches, shift_pows, xs_c,
                       weights, red_opens, points, shift_pows_alpha):
    """One LDE sub-coset's slice of the reduced FRI codeword
    (values form), mirroring fri/prover.py:_combine_and_ifft exactly."""
    E = fri_prover._ext_ops(F)
    vals = [_subcoset_values_inline(F, cb, shift_pows)
            for cb in coeff_batches]
    xs_ext = E.from_base(xs_c)
    sum_vals = None
    for b, polys in enumerate(batch_indices):
        rows = []
        start = 0
        while start < len(polys):
            o = polys[start][0]
            end = start
            while end < len(polys) and polys[end][0] == o:
                end += 1
            idx = np.array([polys[j][1] for j in range(start, end)],
                           dtype=np.int32)
            rows.append(tree_map(lambda a: a[idx], vals[o]))
            start = end
        stacked = fftm.tconcat(rows, axis=0)
        reduced = tuple(
            F.batch_sum(F.mul(stacked,
                              tree_map(lambda a: a[:, None],
                                       weights[b][d])), axis=0)
            for d in range(E.D))
        numerator = E.sub(reduced, red_opens[b])
        denominator = E.sub(xs_ext, points[b])
        quotient = E.mul(numerator, E.inv(denominator))
        if sum_vals is None:
            sum_vals = quotient
        else:
            sum_vals = E.add(E.mul(sum_vals, shift_pows_alpha[b]), quotient)
    return sum_vals


def _subcoset_values_inline(F, coeffs, shift_pows):
    scaled = F.mul(coeffs, tree_map(lambda a: a[None, :], shift_pows))
    return fftm.fft(F, scaled)


def _combine_streamed(F, batch_indices, oracles, weights, red_opens,
                      points, shift_pows_alpha, fri_params):
    """Combined codeword (values, coeffs) without resident oracle LDEs."""
    E = fri_prover._ext_ops(F)
    spec = F.SPEC
    p = spec.p
    n = fftm.tshape(oracles[0].coeffs)[-1]
    rate_bits = fri_params.config.rate_bits
    R = 1 << rate_bits
    wM = spec.two_adic_generator(host.log2_strict(n) + rate_bits)
    g_n = spec.two_adic_generator(host.log2_strict(n))
    shift = spec.coset_shift
    coeff_batches = tuple(o.coeffs for o in oracles)
    blocks = []
    for c in range(R):
        sigma_c = (shift * pow(wM, c, p)) % p
        shift_pows = fftm.powers(F, sigma_c, n)
        xs_c = F.mul_const(fftm.powers(F, g_n, n), sigma_c)
        blocks.append(_combine_block_jit(
            F, batch_indices, coeff_batches, shift_pows, xs_c, weights,
            red_opens, points, shift_pows_alpha))
    # natural index k = j*R + c: stack (n, R) then flatten row-major
    values = tuple(
        tree_map(lambda *ls: jnp.stack(ls, axis=-1).reshape(-1),
                 *[b[d] for b in blocks])
        for d in range(E.D))
    coeffs = fftm.ext_coset_ifft(E, values, shift)
    return values, coeffs


# --------------------------------------------------------------------------
# streaming query rounds: leaf rows from coefficients, siblings from levels
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0, 2))
def _batch_powers_jit(F, bases, n: int):
    """(Q,) bases -> (Q, n) power table by log-doubling (device-side; the
    host power-vector cache would churn on 28 fresh query points per
    proof)."""
    pows = F.ones((fftm.tshape(bases)[0], 1))
    z = tree_map(lambda a: a[:, None], bases)
    length = 1
    while length < n:
        shifted = F.mul(pows, z)
        pows = tree_map(lambda a, b: jnp.concatenate([a, b], axis=1),
                        pows, shifted)
        z = F.mul(z, z)
        length *= 2
    return tree_map(lambda a: a[:, :n], pows)


@partial(jax.jit, static_argnums=(0,))
def _eval_at_points_jit(F, coeffs, bases):
    """(P, n) coeffs evaluated at each base -> (Q, P) values."""
    n = fftm.tshape(coeffs)[-1]
    x_pows = _batch_powers_jit(F, bases, n)
    q_count = fftm.tshape(x_pows)[0]
    outs = [F.batch_sum(F.mul(coeffs, tree_map(lambda a, q=q: a[q][None, :],
                                               x_pows)), axis=-1)
            for q in range(q_count)]
    return tree_map(lambda *ls: jnp.stack(ls, axis=0), *outs)


def _leaf_rows_from_coeffs(F, batch, x_indices: List[int]):
    """Re-derive query leaf rows: leaf i holds every poly's value at the
    natural point bitrev(i) (oracle.leaves_from_lde order)."""
    spec = F.SPEC
    p = spec.p
    lgM = host.log2_strict(batch.lde_size)
    wM = spec.two_adic_generator(lgM)
    xs = [(batch.shift * pow(wM, host.reverse_bits(i, lgM), p)) % p
          for i in x_indices]
    bases = F.from_ints(np.array(xs, dtype=np.uint64))
    rows_host = F.to_ints(_eval_at_points_jit(F, batch.coeffs, bases))
    return [[int(x) for x in row] for row in rows_host]


def _query_rounds_streaming(E, initial_batches, trees, x_indices,
                            fri_params) -> List[FriQueryRound]:
    """fri/prover.py:_query_rounds with leaf rows re-derived from
    coefficients for the (streaming) initial oracles."""
    init_leaves = [_leaf_rows_from_coeffs(b.F, b, x_indices)
                   for b in initial_batches]
    init_proofs = [b.tree.prove_batch(x_indices) for b in initial_batches]
    cur = list(x_indices)
    step_data = []
    for i, tree in enumerate(trees):
        arity_bits = fri_params.reduction_arity_bits[i]
        cur = [x >> arity_bits for x in cur]
        step_data.append((tree.leaf_batch(cur), tree.prove_batch(cur)))

    D = E.D
    rounds = []
    for q in range(len(x_indices)):
        evals_proofs = [(init_leaves[t][q], init_proofs[t][q])
                        for t in range(len(initial_batches))]
        steps = []
        for i in range(len(trees)):
            leaf = step_data[i][0][q]
            evals = [tuple(leaf[j * D + d] for d in range(D))
                     for j in range(len(leaf) // D)]
            steps.append(FriQueryStep(evals=evals,
                                      merkle_proof=step_data[i][1][q]))
        rounds.append(FriQueryRound(
            initial_trees_proof=FriInitialTreeProof(
                evals_proofs=evals_proofs),
            steps=steps))
    return rounds


def _prove_openings_large(F, instance, oracles, challenger, fri_params,
                          hasher):
    """fri/prover.py:prove_openings with the streamed combine and the
    streaming query path."""
    from ..hash import merkle

    spec = F.SPEC
    E = fri_prover._ext_ops(F)
    alpha = challenger.get_extension_challenge()
    reduced = [fri_prover.reduce_openings(spec, batch.values, alpha)
               for batch in instance.batches]
    batch_indices = tuple(
        tuple((pp.oracle_index, pp.polynomial_index)
              for pp in batch.polynomials)
        for batch in instance.batches)
    weights = [
        fri_prover.tuple_to_weight_arrays(
            F, [host.ext_pow(spec, alpha, j) for j in range(len(polys))])
        for polys in batch_indices]
    red_opens = [fri_prover._ext_scalar_dev(F, r) for r in reduced]
    points = [fri_prover._ext_scalar_dev(F, tuple(b.point))
              for b in instance.batches]
    shift_pows_a = [
        fri_prover._ext_scalar_dev(F, host.ext_pow(spec, alpha, len(polys)))
        for polys in batch_indices]

    values, coeffs = _combine_streamed(
        F, batch_indices, oracles, weights, red_opens, points,
        shift_pows_a, fri_params)

    # ---- commit/fold phase (identical to fri_proof) ----
    cap_height = fri_params.config.cap_height
    trees = []
    shift = spec.coset_shift
    for arity_bits in fri_params.reduction_arity_bits:
        arity = 1 << arity_bits
        leaves, levels = fri_prover._round_commit_jit(F, values, arity,
                                                      cap_height, hasher)
        tree = merkle.MerkleTree(leaves, cap_height, hasher, levels=levels)
        challenger.observe_cap(tree.cap_host())
        trees.append(tree)
        beta = challenger.get_extension_challenge()
        beta_pows = tuple(
            fri_prover._ext_scalar_dev(F, host.ext_pow(spec, beta, r))
            for r in range(arity))
        shift = pow(shift, arity, spec.p)
        coeffs, values = fri_prover._fold_round_jit(F, arity, beta_pows,
                                                    shift, coeffs)

    m = fftm.tshape(coeffs[0])[-1]
    keep = m >> fri_params.config.rate_bits
    final_host = E.to_ints(tuple(tree_map(lambda a: a[:keep], c)
                                 for c in coeffs))
    final_poly = [tuple(int(final_host[d][i]) for d in range(E.D))
                  for i in range(keep)]
    challenger.observe_extension_elements(final_poly)

    pow_witness = fri_prover.fri_proof_of_work(F, challenger,
                                               fri_params.config, hasher)
    challenger.observe_element(pow_witness)
    pow_response = challenger.get_challenge()
    min_lz = fri_params.config.proof_of_work_bits + (64 - spec.bits)
    assert fri_prover._leading_zeros64(pow_response) >= min_lz

    n_lde = fri_params.lde_size
    x_indices = [rand % n_lde for rand in challenger.get_n_challenges(
        fri_params.config.num_query_rounds)]
    query_rounds = _query_rounds_streaming(E, oracles, trees, x_indices,
                                           fri_params)
    return FriProof(
        commit_phase_merkle_caps=[t.cap_host() for t in trees],
        query_round_proofs=query_rounds,
        final_poly=final_poly,
        pow_witness=pow_witness)


# --------------------------------------------------------------------------
# the large prove
# --------------------------------------------------------------------------


def prove_large(prover_data, common, inputs, F=gl_mod, hasher=poseidon_gl,
                inner_hasher=None) -> ProofWithPublicInputs:
    """End-to-end prove with streaming oracles (module doc).  The circuit
    must have been built with ``CircuitBuilder.build(commit_streaming=
    True)`` (or at small degrees, any build — the constants commitment is
    re-committed streaming if dense).  Proof bytes are identical to the
    dense prover's for the same witness."""
    spec = common.spec
    config = common.config
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height
    num_challenges = config.num_challenges
    degree = common.degree
    assert not config.zero_knowledge, "prove_large: zk unsupported"
    assert common.num_lookup_polys == 0, "prove_large: lookups unsupported"
    inner_hasher = inner_hasher or hasher

    partition = generate_partial_witness(inputs, prover_data, common)
    public_inputs = partition.get_targets(prover_data.public_inputs)
    witness = partition.full_witness()
    wires_values = F.from_ints(witness)

    kern = plonk_prover._kernels(prover_data, common, F, hasher)
    cs_batch = prover_data.constants_sigmas_commitment
    if not isinstance(cs_batch, StreamingPolynomialBatch):
        cs_batch = StreamingPolynomialBatch(
            F, cs_batch.coeffs, rate_bits, cap_height, hasher=hasher)

    public_inputs_hash = inner_hasher.hash_no_pad_host(public_inputs)

    wires_commitment = StreamingPolynomialBatch.from_values(
        F, wires_values, rate_bits, cap_height, hasher=hasher)

    challenger = Challenger(spec=spec, permute=hasher.permute_host,
                            width=hasher.WIDTH, rate=hasher.RATE)
    challenger.observe_hash(prover_data.circuit_digest)
    challenger.observe_hash(public_inputs_hash)
    challenger.observe_cap(wires_commitment.cap_host())

    betas = challenger.get_n_challenges(num_challenges)
    gammas = challenger.get_n_challenges(num_challenges)

    def to_arr(vals):
        return F.from_ints(np.fromiter((int(v) for v in vals),
                                       dtype=np.uint64,
                                       count=max(len(vals), 0)))

    routed = tree_map(lambda a: a[:config.num_routed_wires], wires_values)
    zs_partial_products, any_zero = kern.pp_fn(routed, to_arr(betas),
                                               to_arr(gammas))
    if bool(jax.device_get(any_zero)):
        raise plonk_prover.InvZeroPermArg()

    zs_pp_commitment = StreamingPolynomialBatch.from_values(
        F, zs_partial_products, rate_bits, cap_height, hasher=hasher)
    challenger.observe_cap(zs_pp_commitment.cap_host())

    alphas = challenger.get_n_challenges(num_challenges)

    quotient_chunks = _blocked_quotient(
        F, common, kern, cs_batch.coeffs, wires_commitment.coeffs,
        zs_pp_commitment.coeffs, to_arr(public_inputs_hash), to_arr(betas),
        to_arr(gammas), to_arr(alphas))
    quotient_commitment = StreamingPolynomialBatch(
        F, quotient_chunks, rate_bits, cap_height, hasher=hasher)
    challenger.observe_cap(quotient_commitment.cap_host())

    zeta = challenger.get_extension_challenge()
    zeta_pow_n = host.ext_pow(spec, zeta, degree)
    assert zeta_pow_n != host.ext_one(spec), "opening point is in subgroup"

    oracles = [cs_batch, wires_commitment, zs_pp_commitment,
               quotient_commitment]
    openings = plonk_prover._opening_set(F, common, zeta, oracles)
    fri_openings = openings.to_fri_openings()
    for batch_vals in fri_openings:
        challenger.observe_extension_elements(batch_vals)

    instance = common.get_fri_instance(zeta)
    for batch, vals in zip(instance.batches, fri_openings):
        batch.values = vals

    opening_proof = _prove_openings_large(F, instance, oracles, challenger,
                                          common.fri_params, hasher)

    proof = Proof(
        wires_cap=wires_commitment.cap_host(),
        plonk_zs_partial_products_cap=zs_pp_commitment.cap_host(),
        quotient_polys_cap=quotient_commitment.cap_host(),
        openings=openings,
        opening_proof=opening_proof)
    return ProofWithPublicInputs(proof=proof, public_inputs=public_inputs)
