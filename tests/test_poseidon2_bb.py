"""Poseidon2-BabyBear permutation + BB Merkle/challenger plumbing."""

import numpy as np
import pytest

from plonky2_goldibear_tpu.field import bb
from plonky2_goldibear_tpu.field.host import BABYBEAR
from plonky2_goldibear_tpu.hash import merkle
from plonky2_goldibear_tpu.hash import poseidon2_bb as p2
from plonky2_goldibear_tpu.hash.challenger import Challenger


def test_device_matches_host_permute():
    rng = np.random.default_rng(0)
    st = rng.integers(0, p2.P, size=(3, 16), dtype=np.uint64)
    dev = bb.to_ints(p2.permute(bb.from_ints(st)))
    host = np.array([p2.permute_host([int(x) for x in row]) for row in st],
                    dtype=np.uint64)
    assert np.array_equal(dev, host)


def test_host_algebra_matches_generic_host_base_algebra():
    """permute via HostBaseAlgebra (the gate's path) == permute_host."""
    from plonky2_goldibear_tpu.gates.base import HostBaseAlgebra
    import random
    rng = random.Random(5)
    A = HostBaseAlgebra(BABYBEAR)
    st = [rng.randrange(BABYBEAR.p) for _ in range(16)]
    assert p2.permute_a(A, list(st)) == p2.permute_host(st)


def test_bb_sponge_and_hash_or_noop():
    vals = list(range(20))
    h = p2.hash_no_pad_host(vals)
    assert len(h) == 8 and all(0 <= x < p2.P for x in h)
    assert p2.hash_or_noop_host(list(range(8))) == list(range(8))
    # device sponge equality
    dev = bb.to_ints(p2.hash_no_pad(bb.from_ints(
        np.array([vals], dtype=np.uint64))))[0]
    assert [int(x) for x in dev] == h


def test_bb_merkle_tree_roundtrip():
    rng = np.random.default_rng(1)
    leaves = bb.from_ints(rng.integers(0, p2.P, size=(16, 10),
                                       dtype=np.uint64))
    tree = merkle.MerkleTree(leaves, cap_height=2, hasher=p2)
    cap = tree.cap_host()
    for idx in [0, 5, 15]:
        siblings = tree.prove(idx)
        assert merkle.verify_merkle_proof_to_cap(
            tree.leaf_host(idx), idx, cap, siblings, hasher=p2)
    bad = list(tree.leaf_host(3))
    bad[0] = (bad[0] + 1) % p2.P
    assert not merkle.verify_merkle_proof_to_cap(
        bad, 3, cap, tree.prove(3), hasher=p2)


def test_bb_challenger_runs():
    ch = Challenger(permute=p2.permute_host, width=16, rate=8, spec=BABYBEAR)
    ch.observe_elements(list(range(11)))
    cs = ch.get_n_challenges(4)
    assert all(0 <= c < BABYBEAR.p for c in cs)
    e = ch.get_extension_challenge()
    assert len(e) == 4
