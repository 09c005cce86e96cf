"""Merkle tree + challenger tests (reference strategy: merkle_tree.rs:257-304
proof verification across cap heights; challenger transcript tests)."""

import numpy as np
import pytest

from plonky2_goldibear_tpu.field import gl, host
from plonky2_goldibear_tpu.hash import poseidon_gl as pos
from plonky2_goldibear_tpu.hash.challenger import Challenger
from plonky2_goldibear_tpu.hash.merkle import MerkleTree, verify_merkle_proof_to_cap

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("cap_height", [0, 1, 3])
@pytest.mark.parametrize("leaf_len", [2, 7])
def test_merkle_proofs(cap_height, leaf_len):
    n = 16
    leaves = RNG.integers(0, host.GOLDILOCKS.p, size=(n, leaf_len), dtype=np.uint64)
    tree = MerkleTree(gl.from_ints(leaves), cap_height)
    cap = tree.cap_host()
    assert len(cap) == 1 << cap_height
    for idx in [0, 5, n - 1]:
        siblings = tree.prove(idx)
        leaf = [int(x) for x in leaves[idx]]
        assert verify_merkle_proof_to_cap(leaf, idx, cap, siblings)
        # wrong leaf fails
        bad = list(leaf)
        bad[0] = (bad[0] + 1) % host.GOLDILOCKS.p
        assert not verify_merkle_proof_to_cap(bad, idx, cap, siblings)


def test_merkle_root_matches_host_reduction():
    n, leaf_len = 8, 5
    leaves = RNG.integers(0, host.GOLDILOCKS.p, size=(n, leaf_len), dtype=np.uint64)
    tree = MerkleTree(gl.from_ints(leaves), 0)
    # host recompute
    digests = [pos.hash_or_noop_host([int(x) for x in leaves[i]]) for i in range(n)]
    while len(digests) > 1:
        digests = [pos.two_to_one_host(digests[2 * i], digests[2 * i + 1])
                   for i in range(len(digests) // 2)]
    assert tree.cap_host() == [digests[0]]


class TestChallenger:
    def test_no_duplicate_challenges(self):
        c = Challenger()
        c.observe_element(1)
        xs = c.get_n_challenges(10)
        assert len(set(xs)) == 10

    def test_determinism_and_input_sensitivity(self):
        a = Challenger()
        a.observe_elements([1, 2, 3])
        b = Challenger()
        b.observe_elements([1, 2, 3])
        assert a.get_challenge() == b.get_challenge()
        d = Challenger()
        d.observe_elements([1, 2, 4])
        e = Challenger()
        e.observe_elements([1, 2, 3])
        assert d.get_challenge() != e.get_challenge()

    def test_pop_order_matches_reference_semantics(self):
        # first challenge after duplex must be state[RATE-1] (Vec::pop from end)
        c = Challenger()
        c.observe_element(42)
        state = [42] + [0] * 11
        state = pos.permute_host(state)
        assert c.get_challenge() == state[pos.RATE - 1]
        assert c.get_challenge() == state[pos.RATE - 2]

    def test_observe_after_squeeze_invalidates_outputs(self):
        c = Challenger()
        c.observe_element(7)
        x1 = c.get_challenge()
        c.observe_element(8)
        # state now: overwrite state[0]=8 on top of permuted state, re-permute
        d = Challenger()
        d.observe_element(7)
        _ = d.get_challenge()
        d.observe_element(8)
        assert c.get_challenge() == d.get_challenge()

    def test_compact_flushes(self):
        c = Challenger()
        c.observe_elements(list(range(5)))
        state = c.compact()
        expect = pos.permute_host(list(range(5)) + [0] * 7)
        assert state == expect


def test_streaming_commit_matches_dense():
    """commit_values_streaming (memory-lean large-domain path) produces
    bit-identical digest levels to the dense commit_values."""
    import jax
    import numpy as np

    from plonky2_goldibear_tpu.field import gl
    from plonky2_goldibear_tpu.fri import oracle

    rng = np.random.default_rng(17)
    vals = gl.from_ints(rng.integers(0, gl.P, size=(13, 64),
                                     dtype=np.uint64))
    coeffs_s, levels_s = jax.jit(
        lambda v: oracle.commit_values_streaming(gl, v, 3, 2))(vals)
    coeffs_d, _, _, levels_d = jax.jit(
        lambda v: oracle.commit_values(gl, v, 3, 2,
                                       gl.SPEC.coset_shift,
                                       oracle.poseidon_gl))(vals)
    np.testing.assert_array_equal(gl.to_ints(coeffs_s), gl.to_ints(coeffs_d))
    # dense levels[0] is the full leaf rows; digests start at the leaf
    # digest layer which the streaming path returns as its levels[0]
    for ls, ld in zip(levels_s, levels_d):
        np.testing.assert_array_equal(gl.to_ints(ls), gl.to_ints(ld))
