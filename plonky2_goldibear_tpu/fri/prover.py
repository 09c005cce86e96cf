"""FRI opening prover (reference plonky2/src/fri/oracle.rs:185-248,
fri/prover.rs:22-255).

TPU-first structure: the combined codeword is built in VALUES form on the
whole LDE coset with one batched kernel per opening batch (the reference
divides coefficient polynomials by (X - z); on the domain both yield the
identical codeword, and the values form is embarrassingly parallel), then
one extension IFFT recovers the coefficients that the fold rounds consume.
Each fold round is a reshape + beta-weighted reduction + coset FFT + Merkle
commit — all batched device work.  The PoW grind is a vectorized device
search.  Query extraction is host-side gathers from the committed trees.

Every phase is a jitted program with the Fiat-Shamir randomness (alpha
weights, beta powers, opening points) as traced inputs, so compilations are
reused across proofs.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import ext as ext_mod
from ..field import fft as fftm
from ..field import host
from ..hash import merkle, poseidon_gl
from ..plonk.proof import (FriInitialTreeProof, FriProof, FriQueryRound,
                           FriQueryStep)

tree_map = jax.tree_util.tree_map


def _ext_ops(F):
    if F.SPEC.name == "goldilocks":
        return ext_mod.gl2
    return ext_mod.bb4


def reduce_openings(spec: host.FieldSpec, values: Sequence[Tuple[int, ...]],
                    alpha: Tuple[int, ...]) -> Tuple[int, ...]:
    """sum_i alpha^i v_i on the host (reference fri/verifier.rs
    PrecomputedReducedOpenings)."""
    acc = host.ext_zero(spec)
    for v in reversed(list(values)):
        acc = host.ext_add(spec, host.ext_mul(spec, acc, alpha), v)
    return acc


# --------------------------------------------------------------------------
# combined codeword (values form) + IFFT — one jitted program per circuit
# --------------------------------------------------------------------------


def _combine_and_ifft(F, batch_indices, shift, ldes, weights, red_opens,
                      points, shift_pows):
    """batch_indices (static): per batch, list of (oracle_idx, poly_idx).
    ldes: tuple of oracle LDE pytrees.  weights: per batch, ext array
    (D x (P_b,)).  red_opens/points/shift_pows: per batch ext scalars.
    Returns (values, coeffs) of the combined codeword."""
    E = _ext_ops(F)
    spec = F.SPEC
    m = fftm.tshape(ldes[0])[-1]
    w = spec.two_adic_generator(host.log2_strict(m))
    xs = F.mul_const(fftm.powers(F, w, m), shift)
    xs_ext = E.from_base(xs)

    sum_vals = None
    for b, polys in enumerate(batch_indices):
        # gather the batch's LDE rows (contiguous runs per oracle)
        rows = []
        start = 0
        while start < len(polys):
            o = polys[start][0]
            end = start
            while end < len(polys) and polys[end][0] == o:
                end += 1
            idx = np.array([polys[j][1] for j in range(start, end)],
                           dtype=np.int32)
            rows.append(tree_map(lambda a: a[idx], ldes[o]))
            start = end
        stacked = fftm.tconcat(rows, axis=0)          # (P_b, m)
        # reduced_evals_d(x) = sum_j weights[j][d] * lde_j(x)
        reduced = tuple(
            F.batch_sum(F.mul(stacked,
                              tree_map(lambda a: a[:, None], weights[b][d])),
                        axis=0)
            for d in range(E.D))
        numerator = E.sub(reduced, red_opens[b])
        denominator = E.sub(xs_ext, points[b])
        quotient = E.mul(numerator, E.inv(denominator))
        if sum_vals is None:
            sum_vals = quotient
        else:
            sum_vals = E.add(E.mul(sum_vals, shift_pows[b]), quotient)
    coeffs = fftm.ext_coset_ifft(E, sum_vals, shift)
    return sum_vals, coeffs


# --------------------------------------------------------------------------
# fold round: beta-weighted coefficient reduction + coset FFT
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0, 1, 3))
def _fold_round_jit(F, arity, beta_pows, shift, coeffs):
    """coeffs (m,) ext -> folded (m/arity,) ext and its values on the
    shift-coset (reference fri/prover.rs:115-125: consecutive coefficient
    chunks reduced by powers of beta)."""
    E = _ext_ops(F)
    m = fftm.tshape(coeffs[0])[-1]
    chunked = tuple(tree_map(lambda a: a.reshape(m // arity, arity), c)
                    for c in coeffs)
    folded = None
    for r in range(arity):
        c_r = tuple(tree_map(lambda a: a[:, r], c) for c in chunked)
        term = E.mul(c_r, beta_pows[r])
        folded = term if folded is None else E.add(folded, term)
    values = fftm.ext_coset_fft(E, folded, shift)
    return folded, values


@partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _round_commit_jit(F, values, arity, cap_height, hasher=poseidon_gl):
    """Bit-reversed ext values -> flattened coset leaves + digest levels
    (reference fri/prover.rs:104-110)."""
    E = _ext_ops(F)
    m = fftm.tshape(values[0])[-1]
    rev = fftm.reverse_index_bits(values, axis=-1)
    chunks = [tree_map(lambda a: a.reshape(m // arity, arity), c)
              for c in rev]
    stacked = tree_map(lambda *ls: jnp.stack(ls, axis=-1), *chunks)
    leaves = tree_map(lambda a: a.reshape(m // arity, arity * E.D), stacked)
    num_layers = host.log2_strict(m // arity) - cap_height
    levels = merkle.build_levels(leaves, num_layers, hasher)
    return leaves, levels


def fri_proof(F, initial_trees, lde_coeffs, lde_values, challenger,
              fri_params, hasher=poseidon_gl) -> FriProof:
    """reference fri/prover.rs:22-77."""
    spec = F.SPEC
    E = _ext_ops(F)
    cap_height = fri_params.config.cap_height

    # ---- commit phase (reference fri/prover.rs:83-133) ----
    trees: List[merkle.MerkleTree] = []
    coeffs = lde_coeffs
    values = lde_values
    shift = spec.coset_shift
    for arity_bits in fri_params.reduction_arity_bits:
        arity = 1 << arity_bits
        leaves, levels = _round_commit_jit(F, values, arity, cap_height,
                                           hasher)
        tree = merkle.MerkleTree(leaves, cap_height, hasher, levels=levels)
        challenger.observe_cap(tree.cap_host())
        trees.append(tree)

        beta = challenger.get_extension_challenge()
        beta_pows = tuple(
            _ext_scalar_dev(F, host.ext_pow(spec, beta, r))
            for r in range(arity))
        shift = pow(shift, arity, spec.p)
        coeffs, values = _fold_round_jit(F, arity, beta_pows, shift, coeffs)

    # truncate final coefficients by the rate: the dropped ones are zero
    # (reference fri/prover.rs:127-131)
    m = fftm.tshape(coeffs[0])[-1]
    keep = m >> fri_params.config.rate_bits
    final_host = E.to_ints(tuple(tree_map(lambda a: a[:keep], c)
                                 for c in coeffs))
    final_poly = [tuple(int(final_host[d][i]) for d in range(E.D))
                  for i in range(keep)]
    challenger.observe_extension_elements(final_poly)

    # ---- PoW grind (reference fri/prover.rs:136-188) ----
    pow_witness = fri_proof_of_work(F, challenger, fri_params.config, hasher)
    challenger.observe_element(pow_witness)
    pow_response = challenger.get_challenge()
    min_lz = fri_params.config.proof_of_work_bits + (64 - spec.bits)
    assert _leading_zeros64(pow_response) >= min_lz

    # ---- query phase (reference fri/prover.rs:190-255) ----
    n = fri_params.lde_size
    x_indices = [rand % n for rand in challenger.get_n_challenges(
        fri_params.config.num_query_rounds)]
    query_rounds = _query_rounds(E, initial_trees, trees, x_indices,
                                 fri_params)

    return FriProof(
        commit_phase_merkle_caps=[t.cap_host() for t in trees],
        query_round_proofs=query_rounds,
        final_poly=final_poly,
        pow_witness=pow_witness)


def _ext_scalar_dev(F, value: Tuple[int, ...]):
    arr = F.from_ints(np.array(list(value), dtype=np.uint64))
    D = len(value)
    return tuple(tree_map(lambda a: a[d], arr) for d in range(D))


def _leading_zeros64(x: int) -> int:
    return 64 - x.bit_length() if x else 64


@lru_cache(maxsize=32)
def _grind_jit(F, hasher, width, pos, rate, k, batch):
    def grind(state_arr, start):
        cands = start + jnp.arange(batch, dtype=jnp.uint32)
        st = tree_map(lambda a: jnp.tile(a, (batch, 1)), state_arr)
        st = F.grind_set_lane(st, pos, cands)
        out = hasher.permute(st)
        resp = tree_map(lambda a: a[:, rate - 1], out)
        ok = F.grind_response_ok(resp, k)
        idx = jnp.argmax(ok)
        return ok[idx], idx

    return jax.jit(grind)


def fri_proof_of_work(F, challenger, config, hasher=poseidon_gl,
                      batch: int = 1 << 17) -> int:
    """Vectorized grind: find w with leading_zeros(H(transcript || w)) >=
    pow_bits (reference fri/prover.rs:136-188).  Searches device batches of
    candidates; any valid witness verifies, so picking the first found in a
    batch is fine."""
    spec = F.SPEC
    min_lz = config.proof_of_work_bits + (64 - spec.bits)
    state = list(challenger.sponge_state)
    pos = len(challenger.input_buffer)
    for i, v in enumerate(challenger.input_buffer):
        state[i] = v
    width = hasher.WIDTH
    rate = hasher.RATE
    assert pos < width

    k = 64 - min_lz  # need response < 2^k
    if not hasattr(hasher, "permute"):
        # no batched device permutation (Keccak hash-onion): host grind
        w = 0
        while True:
            s = list(state)
            s[pos] = w
            resp = hasher.permute_host(s)[rate - 1]
            if _leading_zeros64(resp) >= min_lz:
                return w
            w += 1
    base_state = F.from_ints(np.array(state, dtype=np.uint64))
    grind = _grind_jit(F, hasher, width, pos, rate, k, batch)

    start = 0
    while True:
        found, idx = grind(base_state, np.uint32(start))
        if bool(jax.device_get(found)):
            return start + int(jax.device_get(idx))
        start += batch
        assert start < 1 << 32, "PoW grind exhausted 2^32 candidates"


@jax.jit
def _all_query_gather_jit(leaves_list, levels_list, idx_list):
    """ONE program for every tree's query leaf rows AND sibling chains,
    flattened into a single vector (ONE transfer).  Under the TPU tunnel
    each dispatch+fetch is a network round trip; the per-tree layout cost
    ~2 round trips x (4 oracles + fold rounds) per proof, which dominated
    the FRI phase wall-clock."""
    chunks = []
    for leaves, levels, idx in zip(leaves_list, levels_list, idx_list):
        rows = tree_map(lambda a: a[idx], leaves)
        chunks.append(tree_map(lambda a: a.reshape(-1), rows))
        cur = idx
        for lv in levels:
            sib = cur ^ 1
            g = tree_map(lambda a: a[sib], lv)
            chunks.append(tree_map(lambda a: a.reshape(-1), g))
            cur = cur >> 1
    return tree_map(lambda *ls: jnp.concatenate(ls, axis=0), *chunks)


def _gather_all_query_data(all_trees, all_indices):
    """Fused leaf+sibling gather for a list of MerkleTrees; returns per tree
    (leaf_rows, sibling_chains) in the same host formats as
    merkle.MerkleTree.leaf_batch / prove_batch."""
    F = all_trees[0]._F
    leaves_list = tuple(t.leaves for t in all_trees)
    levels_list = tuple(tuple(t.levels[:t.num_layers]) for t in all_trees)
    idx_list = tuple(jnp.asarray(np.asarray(ix, dtype=np.int32))
                     for ix in all_indices)
    flat = F.to_ints(_all_query_gather_jit(leaves_list, levels_list,
                                           idx_list))
    out = []
    off = 0
    for t, ix in zip(all_trees, all_indices):
        nq = len(ix)
        rows = flat[off:off + nq * t.leaf_len].reshape(nq, t.leaf_len)
        off += nq * t.leaf_len
        leaf_rows = [[int(x) for x in row] for row in rows]
        dw = getattr(t.hasher, "NUM_HASH_OUT", 4)   # digest width (GL 4, BB 8)
        chains = [[] for _ in range(nq)]
        for _ in range(t.num_layers):
            lvl = flat[off:off + nq * dw].reshape(nq, dw)
            off += nq * dw
            for q in range(nq):
                chains[q].append([int(x) for x in lvl[q]])
        out.append((leaf_rows, chains))
    assert off == len(flat)
    return out


def _query_rounds(E, initial_trees, trees, x_indices: List[int],
                  fri_params) -> List[FriQueryRound]:
    """All query rounds at once, fused: ONE device program + ONE transfer
    gathers every oracle's leaf rows and sibling chains for all 28 query
    indices (reference fri/prover.rs:190-255 walks per query; host-device
    round trips make that layout hostile behind the TPU tunnel)."""
    nq = len(x_indices)
    all_trees = [t.tree for t in initial_trees] + list(trees)
    fused = not any(hasattr(t.hasher, "digests_host") for t in all_trees)
    cur = list(x_indices)
    round_indices = []
    for i in range(len(trees)):
        arity_bits = fri_params.reduction_arity_bits[i]
        cur = [x >> arity_bits for x in cur]
        round_indices.append(cur)
    if fused:
        all_indices = [x_indices] * len(initial_trees) + round_indices
        data = _gather_all_query_data(all_trees, all_indices)
        init_leaves = [d[0] for d in data[:len(initial_trees)]]
        init_proofs = [d[1] for d in data[:len(initial_trees)]]
        step_data = [(d[0], d[1]) for d in data[len(initial_trees):]]
    else:
        init_leaves = [t.tree.leaf_batch(x_indices) for t in initial_trees]
        init_proofs = [t.tree.prove_batch(x_indices) for t in initial_trees]
        step_data = []
        for i, tree in enumerate(trees):
            step_data.append((tree.leaf_batch(round_indices[i]),
                              tree.prove_batch(round_indices[i])))

    D = E.D
    rounds = []
    for q in range(nq):
        evals_proofs = [(init_leaves[t][q], init_proofs[t][q])
                        for t in range(len(initial_trees))]
        steps = []
        for i in range(len(trees)):
            leaf = step_data[i][0][q]
            evals = [tuple(leaf[j * D + d] for d in range(D))
                     for j in range(len(leaf) // D)]
            steps.append(FriQueryStep(evals=evals,
                                      merkle_proof=step_data[i][1][q]))
        rounds.append(FriQueryRound(
            initial_trees_proof=FriInitialTreeProof(evals_proofs=evals_proofs),
            steps=steps))
    return rounds


def prove_openings(F, instance, oracles, challenger, fri_params,
                   hasher=poseidon_gl) -> FriProof:
    """reference fri/oracle.rs:185-248."""
    spec = F.SPEC
    alpha = challenger.get_extension_challenge()

    # reduced openings per batch, from the claimed opening values attached
    # to each batch by the caller
    reduced = [reduce_openings(spec, batch.values, alpha)
               for batch in instance.batches]

    batch_indices = tuple(
        tuple((p.oracle_index, p.polynomial_index)
              for p in batch.polynomials)
        for batch in instance.batches)
    weights = [
        tuple_to_weight_arrays(F, [host.ext_pow(spec, alpha, j)
                                   for j in range(len(polys))])
        for polys in batch_indices]
    red_opens = [_ext_scalar_dev(F, r) for r in reduced]
    points = [_ext_scalar_dev(F, tuple(b.point)) for b in instance.batches]
    shift_pows = [_ext_scalar_dev(F, host.ext_pow(spec, alpha, len(polys)))
                  for polys in batch_indices]

    combine = _get_combine_jit(F, oracles[0], batch_indices,
                               spec.coset_shift)
    values, coeffs = combine(tuple(o.lde for o in oracles), weights,
                             red_opens, points, shift_pows)
    return fri_proof(F, oracles, coeffs, values, challenger, fri_params,
                     hasher)


def tuple_to_weight_arrays(F, ext_values: List[Tuple[int, ...]]):
    """List of host ext tuples -> D base-field device arrays (P,)."""
    D = len(ext_values[0])
    return tuple(
        F.from_ints(np.array([v[d] for v in ext_values], dtype=np.uint64))
        for d in range(D))


def _get_combine_jit(F, anchor_oracle, batch_indices, shift):
    """Cache the jitted combine program on the circuit's persistent
    constants oracle."""
    cache = getattr(anchor_oracle, "_combine_jit_cache", None)
    if cache is None:
        cache = {}
        anchor_oracle._combine_jit_cache = cache
    key = (F.SPEC.name, batch_indices, shift)
    if key not in cache:
        cache[key] = jax.jit(
            partial(_combine_and_ifft, F, batch_indices, shift))
    return cache[key]


# ==========================================================================
# Async (device-transcript) FRI prover: no host fetch until the caller's
# final proof gather.  Challenges come from a DeviceChallenger; alpha
# weights, reduced openings and beta powers are computed ON DEVICE from the
# challenge scalars instead of host ints.  Values are bit-identical to the
# sync path (same algebra, same transcript schedule).
# ==========================================================================


def _ext_powers_scalar(E, z, n: int):
    """[1, z, .., z^(n-1)] as an ext (n,) array from an ext scalar, via
    log-doubling (same schedule as _ext_powers_traced in plonk/prover.py)."""
    pows = E.ones((1,))
    z_pow = z
    length = 1
    while length < n:
        shifted = E.mul(pows, z_pow)
        pows = tuple(fftm.tconcat([a, b], axis=-1)
                     for a, b in zip(pows, shifted))
        z_pow = E.mul(z_pow, z_pow)
        length *= 2
    return tuple(tree_map(lambda a: a[:n], c) for c in pows)


def _combine_and_ifft_async(F, batch_indices, shift, ldes, alpha,
                            batch_vals, points):
    """Async combine: ``alpha`` is a device ext scalar; ``batch_vals[b]`` is
    the batch's claimed opening values as an ext (P_b, D-major) component
    tuple (D arrays of (P_b,)) in FRI order — weights and reduced openings
    are derived on device (sync path: host ext_pow / reduce_openings)."""
    E = _ext_ops(F)
    spec = F.SPEC
    m = fftm.tshape(ldes[0])[-1]
    w = spec.two_adic_generator(host.log2_strict(m))
    xs = F.mul_const(fftm.powers(F, w, m), shift)
    xs_ext = E.from_base(xs)

    sum_vals = None
    for b, polys in enumerate(batch_indices):
        npolys = len(polys)
        alpha_pows = _ext_powers_scalar(E, alpha, npolys)   # (P_b,) ext
        # reduced opening: sum_j alpha^j v_j (= the Horner the host does)
        prods = E.mul(alpha_pows, batch_vals[b])
        red_open = tuple(F.batch_sum(c, axis=-1) for c in prods)
        # alpha^{P_b} batch shift
        shift_pow = E.mul(tree_map(lambda a: a[npolys - 1], alpha_pows),
                          alpha)
        rows = []
        start = 0
        while start < npolys:
            o = polys[start][0]
            end = start
            while end < npolys and polys[end][0] == o:
                end += 1
            idx = np.array([polys[j][1] for j in range(start, end)],
                           dtype=np.int32)
            rows.append(tree_map(lambda a: a[idx], ldes[o]))
            start = end
        stacked = fftm.tconcat(rows, axis=0)          # (P_b, m)
        # reduced_evals_d(x) = sum_j alpha_pows[j][d] * lde_j(x): base-field
        # row weights per ext component of alpha^j
        reduced = []
        for d in range(E.D):
            # component d of sum_j alpha^j * lde_j  (lde_j base-field):
            # = sum_j alpha_pows[j]_d * lde_j
            wcol = alpha_pows[d]
            reduced.append(F.batch_sum(
                F.mul(stacked, tree_map(lambda a: a[:, None], wcol)),
                axis=0))
        reduced = tuple(reduced)
        numerator = E.sub(reduced, red_open)
        denominator = E.sub(xs_ext, points[b])
        quotient = E.mul(numerator, E.inv(denominator))
        if sum_vals is None:
            sum_vals = quotient
        else:
            sum_vals = E.add(E.mul(sum_vals, shift_pow), quotient)
    coeffs = fftm.ext_coset_ifft(E, sum_vals, shift)
    return sum_vals, coeffs


@partial(jax.jit, static_argnums=(0, 1, 3))
def _fold_round_async_jit(F, arity, beta, shift, coeffs):
    """Fold with the beta powers computed on device from the challenge
    scalar (sync twin: _fold_round_jit with host-int beta_pows)."""
    E = _ext_ops(F)
    m = fftm.tshape(coeffs[0])[-1]
    chunked = tuple(tree_map(lambda a: a.reshape(m // arity, arity), c)
                    for c in coeffs)
    folded = None
    beta_pow = None
    for r in range(arity):
        c_r = tuple(tree_map(lambda a: a[:, r], c) for c in chunked)
        if r == 0:
            term = c_r
            beta_pow = beta
        else:
            term = E.mul(c_r, beta_pow)
            beta_pow = E.mul(beta_pow, beta)
        folded = term if folded is None else E.add(folded, term)
    values = fftm.ext_coset_fft(E, folded, shift)
    return folded, values


@lru_cache(maxsize=32)
def _grind_async_jit(F, hasher, L, rate, k, batch):
    """PoW grind as ONE device program (lax.while_loop over candidate
    batches); sync twin dispatches one batch per host round trip."""
    import jax.numpy as jnp

    def grind(state, leftover):
        if L:
            state = fftm.tconcat(
                [leftover, tree_map(lambda a: a[L:], state)], axis=0)

        def cond(carry):
            return ~carry[0]

        def body(carry):
            _, start, _ = carry
            cands = start + jnp.arange(batch, dtype=jnp.uint32)
            st = tree_map(lambda a: jnp.tile(a, (batch, 1)), state)
            st = F.grind_set_lane(st, L, cands)
            out = hasher.permute(st)
            resp = tree_map(lambda a: a[:, rate - 1], out)
            ok = F.grind_response_ok(resp, k)
            idx = jnp.argmax(ok)
            return ok[idx], start + jnp.uint32(batch), start + idx.astype(
                jnp.uint32)

        found, _, w = jax.lax.while_loop(
            cond, body, (jnp.zeros((), bool), jnp.uint32(0), jnp.uint32(0)))
        return w

    return jax.jit(grind)


def fri_proof_async(F, initial_trees, lde_coeffs, lde_values, dc,
                    fri_params, hasher=poseidon_gl,
                    grind_batch: int = 1 << 17):
    """Device-transcript twin of :func:`fri_proof` (reference
    fri/prover.rs:22-77).  Returns device handles for the final gather:
    (fold trees, final_coeffs, pow_witness scalar, pow_ok flag,
    query challenges)."""
    spec = F.SPEC
    E = _ext_ops(F)
    cap_height = fri_params.config.cap_height

    trees: List[merkle.MerkleTree] = []
    coeffs = lde_coeffs
    values = lde_values
    shift = spec.coset_shift
    for arity_bits in fri_params.reduction_arity_bits:
        arity = 1 << arity_bits
        leaves, levels = _round_commit_jit(F, values, arity, cap_height,
                                           hasher)
        tree = merkle.MerkleTree(leaves, cap_height, hasher, levels=levels)
        dc.observe_cap(tree.cap, 1 << cap_height, hasher.NUM_HASH_OUT)
        trees.append(tree)

        beta = dc.get_extension_challenge(E.D)
        shift = pow(shift, arity, spec.p)
        coeffs, values = _fold_round_async_jit(F, arity, beta, shift, coeffs)

    m = fftm.tshape(coeffs[0])[-1]
    keep = m >> fri_params.config.rate_bits
    final_coeffs = tuple(tree_map(lambda a: a[:keep], c) for c in coeffs)
    dc.observe_ext_flat(final_coeffs, keep, E.D)

    # PoW grind (reference fri/prover.rs:136-188) in one device program
    state, leftover, L = dc.grind_inputs()
    min_lz = fri_params.config.proof_of_work_bits + (64 - spec.bits)
    k = 64 - min_lz
    grind = _grind_async_jit(F, hasher, L, hasher.RATE, k, grind_batch)
    w = grind(state, leftover) if L else grind(state, F.zeros((0,)))
    pow_witness = F.from_u32(w)
    dc.observe_array(tree_map(lambda a: a[None], pow_witness), 1)
    pow_response = dc.get_challenge_scalar()
    pow_ok = F.grind_response_ok(
        tree_map(lambda a: a[None], pow_response), k)

    query_challenges = dc.get_n_challenges(
        fri_params.config.num_query_rounds)
    return trees, final_coeffs, pow_witness, pow_ok, query_challenges


def prove_openings_async(F, instance, oracles, dc, fri_params, batch_vals,
                         points, hasher=poseidon_gl):
    """Device-transcript twin of :func:`prove_openings` (reference
    fri/oracle.rs:185-248).  ``batch_vals``: per batch the claimed opening
    values as D component arrays (P_b,) in FRI order (from the async
    opening-set program); ``points``: device ext scalars (zeta, g*zeta)."""
    E = _ext_ops(F)
    alpha = dc.get_extension_challenge(E.D)

    batch_indices = tuple(
        tuple((p.oracle_index, p.polynomial_index)
              for p in batch.polynomials)
        for batch in instance.batches)
    combine = _get_combine_async_jit(F, oracles[0], batch_indices,
                                     F.SPEC.coset_shift)
    values, coeffs = combine(tuple(o.lde for o in oracles), alpha,
                             tuple(batch_vals), tuple(points))
    return fri_proof_async(F, oracles, coeffs, values, dc, fri_params,
                           hasher)


def _get_combine_async_jit(F, anchor_oracle, batch_indices, shift):
    cache = getattr(anchor_oracle, "_combine_async_jit_cache", None)
    if cache is None:
        cache = {}
        anchor_oracle._combine_async_jit_cache = cache
    key = (F.SPEC.name, batch_indices, shift)
    if key not in cache:
        cache[key] = jax.jit(
            partial(_combine_and_ifft_async, F, batch_indices, shift))
    return cache[key]
