"""End-to-end prove + verify over BabyBear (quartic extension, Poseidon2
width-16 hashing, narrow 167/41-wire config — reference
plonk/circuit_data.rs:120-139)."""

import pytest

from plonky2_goldibear_tpu.field import bb
from plonky2_goldibear_tpu.field.host import BABYBEAR
from plonky2_goldibear_tpu.hash import poseidon2_bb
from plonky2_goldibear_tpu.iop.generator import seed_randomness
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.plonk.verifier import verify
from plonky2_goldibear_tpu.fri.verifier import FriVerificationError


@pytest.fixture(scope="module")
def bb_proof():
    seed_randomness(7)
    config = CircuitConfig.standard_recursion_config_bb()
    builder = CircuitBuilder(config, spec=BABYBEAR, F=bb,
                             hasher=poseidon2_bb)
    p = BABYBEAR.p

    ia = builder.add_virtual_target()
    ib = builder.add_virtual_target()
    a, b = ia, ib
    for _ in range(60):
        a, b = b, builder.add(a, b)
    aa, bbv = 3, 5
    for _ in range(60):
        aa, bbv = bbv, (aa + bbv) % p
    builder.connect(a, builder.constant(aa))

    data = builder.build()
    pw = PartialWitness()
    pw.set_target(ia, 3)
    pw.set_target(ib, 5)
    proof = data.prove(pw)
    return data, proof


def test_bb_prove_verify(bb_proof):
    data, proof = bb_proof
    verify(proof, data.verifier_only, data.common, hasher=poseidon2_bb)


def test_bb_tamper_rejected(bb_proof):
    import copy
    data, proof = bb_proof
    bad = copy.deepcopy(proof)
    w = list(bad.proof.openings.wires[0])
    w[0] = (w[0] + 1) % BABYBEAR.p
    bad.proof.openings.wires[0] = tuple(w)
    with pytest.raises((Exception,)):
        verify(bad, data.verifier_only, data.common, hasher=poseidon2_bb)
