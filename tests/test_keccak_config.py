"""KeccakGoldilocksConfig: batched device keccak-f[1600], Keccak Merkle
trees, and full native prove/verify with Hasher=Keccak /
InnerHasher=Poseidon (reference plonk/config.rs:208-216,
hash/keccak.rs:14-126)."""

import dataclasses

import numpy as np
import pytest

from plonky2_goldibear_tpu.field import gl
from plonky2_goldibear_tpu.hash import keccak_device as kd
from plonky2_goldibear_tpu.hash import keccak_hasher, merkle
from plonky2_goldibear_tpu.iop.generator import seed_randomness
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.plonk.verifier import VerificationError, verify
from plonky2_goldibear_tpu.utils.keccak import keccak256


@pytest.mark.parametrize("length", [25, 50, 136, 1080])
def test_keccak_device_matches_host(length):
    rng = np.random.default_rng(length)
    msgs = rng.integers(0, 256, size=(4, length), dtype=np.uint8)
    dev = np.asarray(kd.keccak256_bytes(msgs))
    for i in range(4):
        assert bytes(dev[i].tobytes()) == keccak256(msgs[i].tobytes())


def test_keccak_merkle_device_vs_host_path():
    rng = np.random.default_rng(7)
    leaves_ints = rng.integers(0, gl.SPEC.p, size=(16, 6), dtype=np.uint64)
    leaves = gl.from_ints(leaves_ints)
    tree = merkle.MerkleTree(leaves, cap_height=1, hasher=keccak_hasher)
    cap = tree.cap_host()
    assert len(cap) == 2 and all(
        isinstance(d, bytes) and len(d) == 25 for d in cap)
    # device levels match the host Merkle builder
    host_cap = keccak_hasher.merkle_root_host(
        [list(map(int, row)) for row in leaves_ints], cap_height=1)
    assert cap == host_cap
    # proofs verify, and against the right leaf only
    for idx in (0, 5, 15):
        proof = tree.prove(idx)
        leaf = [int(x) for x in leaves_ints[idx]]
        assert merkle.verify_merkle_proof_to_cap(
            leaf, idx, cap, proof, hasher=keccak_hasher)
        bad = list(leaf)
        bad[0] ^= 1
        assert not merkle.verify_merkle_proof_to_cap(
            bad, idx, cap, proof, hasher=keccak_hasher)


def _keccak_test_config():
    base = CircuitConfig.standard_recursion_config_gl()
    fri = dataclasses.replace(base.fri_config, proof_of_work_bits=8)
    return dataclasses.replace(base, fri_config=fri)


@pytest.fixture(scope="module")
def keccak_proof():
    seed_randomness(4321)
    config = _keccak_test_config()
    builder = CircuitBuilder(config, hasher=keccak_hasher)
    p = builder.spec.p

    x = builder.add_virtual_target()
    cur = x
    for _ in range(30):
        cur = builder.mul(cur, x)
    builder.register_public_input(x)
    builder.register_public_input(cur)

    data = builder.build()
    pw = PartialWitness()
    pw.set_target(x, 3)
    proof = data.prove(pw)
    assert proof.public_inputs == [3, pow(3, 31, p)]
    return data, proof


def test_keccak_config_prove_verify(keccak_proof):
    data, proof = keccak_proof
    assert isinstance(data.verifier_only.circuit_digest, bytes)
    assert all(isinstance(d, bytes)
               for d in proof.proof.wires_cap)
    data.verify(proof)


def test_keccak_config_tamper_rejected(keccak_proof):
    import copy

    from plonky2_goldibear_tpu.fri.verifier import FriVerificationError
    data, proof = keccak_proof
    bad = copy.deepcopy(proof)
    bad.public_inputs[1] = (bad.public_inputs[1] + 1) % data.common.spec.p
    with pytest.raises((VerificationError, FriVerificationError,
                        AssertionError)):
        data.verify(bad)


def test_keccak_config_proof_serde_roundtrip(keccak_proof):
    """BytesHash proof serialization: every digest is HASH_SIZE raw bytes
    (reference serialization/mod.rs:253-262 is generic over H::HASH_SIZE;
    hash_types.rs:259-266 BytesHash to/from_bytes)."""
    from plonky2_goldibear_tpu.plonk import serialization as serde
    data, proof = keccak_proof
    raw = serde.write_proof_with_public_inputs(proof, data.common)
    back = serde.read_proof_with_public_inputs(
        raw, data.common, hasher=keccak_hasher)
    assert back == proof
    vk_raw = serde.write_verifier_only_circuit_data(
        data.verifier_only, data.common.spec)
    vk_back = serde.read_verifier_only_circuit_data(
        vk_raw, data.common.spec, hasher=keccak_hasher)
    assert vk_back.circuit_digest == data.verifier_only.circuit_digest
    assert (vk_back.constants_sigmas_cap
            == data.verifier_only.constants_sigmas_cap)
