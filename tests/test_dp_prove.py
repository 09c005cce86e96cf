"""Data-parallel batched prove (parallel/dp_prove.py): N proofs on an
8-virtual-device mesh, each accepted by the standard verifier, and
byte-identical to the sequential prover's output for the same witness."""

import numpy as np
import pytest

from plonky2_goldibear_tpu.iop.generator import seed_randomness
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.parallel import sharded
from plonky2_goldibear_tpu.parallel.dp_prove import dp_prove_batch
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.plonk.verifier import verify


@pytest.fixture(scope="module")
def small_circuit():
    seed_randomness(123)
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config_gl())
    x = builder.add_virtual_target()
    builder.register_public_input(x)
    cur = x
    for _ in range(40):
        cur = builder.arithmetic(1, 1, cur, cur, cur)
    builder.register_public_input(cur)
    return x, builder.build()


def test_dp_prove_batch_verifies(small_circuit):
    x, data = small_circuit
    mesh = sharded.make_mesh(8)
    pws = []
    for i in range(8):
        pw = PartialWitness()
        pw.set_target(x, 3 + i)
        pws.append(pw)
    proofs = dp_prove_batch(data.prover_only, data.common, pws, mesh)
    assert len(proofs) == 8
    for pr in proofs:
        verify(pr, data.verifier_only, data.common)


def test_dp_prove_matches_sequential(small_circuit):
    """Same witness -> byte-identical proof from the DP and sequential
    provers.  The witness must be pinned: the generator fills unset wires
    from the global random stream, so two generate_partial_witness calls
    give different (both valid) witnesses."""
    from plonky2_goldibear_tpu.hash import poseidon_gl
    from plonky2_goldibear_tpu.iop.generator import generate_partial_witness
    from plonky2_goldibear_tpu.plonk import prover as plonk_prover
    from plonky2_goldibear_tpu.plonk.serialization import (
        write_proof_with_public_inputs)

    x, data = small_circuit
    mesh = sharded.make_mesh(8)
    wps = []
    for i in range(8):
        pw = PartialWitness()
        pw.set_target(x, 3 + i)
        part = generate_partial_witness(pw, data.prover_only, data.common)
        wps.append((part.full_witness(),
                    part.get_targets(data.prover_only.public_inputs)))
    proofs = dp_prove_batch(data.prover_only, data.common, None, mesh,
                            witnesses_publics=wps)
    for pr in proofs:
        verify(pr, data.verifier_only, data.common)
    seq = plonk_prover._internal_prove(
        data.prover_only, data.common, wps[2][0], wps[2][1],
        plonk_prover.gl_mod, poseidon_gl, poseidon_gl)
    assert (write_proof_with_public_inputs(seq, data.common)
            == write_proof_with_public_inputs(proofs[2], data.common))


def test_dp_prove_zk_byte_identical():
    """zk circuit: DP prover draws per-proof blinding salts in the
    sequential prover's global-stream order, so proofs are byte-identical
    (reference fri/oracle.rs:139-149 salt order)."""
    from plonky2_goldibear_tpu.iop import generator as gen
    from plonky2_goldibear_tpu.plonk.serialization import (
        write_proof_with_public_inputs)

    seed_randomness(777)
    builder = CircuitBuilder(CircuitConfig.standard_recursion_zk_config_gl())
    x = builder.add_virtual_target()
    builder.register_public_input(x)
    cur = x
    for _ in range(40):
        cur = builder.arithmetic(1, 1, cur, cur, cur)
    builder.register_public_input(cur)
    data = builder.build()

    def pws():
        out = []
        for i in range(4):
            pw = PartialWitness()
            pw.set_target(x, 3 + i)
            out.append(pw)
        return out

    gen.set_nonrandom(True)
    try:
        seq = [data.prove(pw) for pw in pws()]
        gen.set_nonrandom(True)  # reset the counter stream
        mesh = sharded.make_mesh(8)
        dp = dp_prove_batch(data.prover_only, data.common, pws(), mesh)
    finally:
        gen.set_nonrandom(False)
    for s, d in zip(seq, dp):
        verify(d, data.verifier_only, data.common)
        assert (write_proof_with_public_inputs(s, data.common)
                == write_proof_with_public_inputs(d, data.common))


def test_dp_prove_lookup_byte_identical():
    """Lookup circuit: DP prover runs per-proof delta transcripts + the
    device-scan lookup polys; byte-identical to sequential."""
    from plonky2_goldibear_tpu.iop import generator as gen
    from plonky2_goldibear_tpu.plonk.serialization import (
        write_proof_with_public_inputs)

    TIP5_16 = [0, 7, 26, 63, 124, 215, 85, 254, 214, 228, 45, 185, 140,
               173, 33, 240]
    seed_randomness(888)
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config_gl())
    lut_index = builder.add_lookup_table_from_table(list(range(16)), TIP5_16)
    inp = builder.add_virtual_target()
    out = builder.add_lookup_from_index(inp, lut_index)
    builder.register_public_input(inp)
    builder.register_public_input(out)
    data = builder.build()

    def pws():
        result = []
        for i in range(4):
            pw = PartialWitness()
            pw.set_target(inp, i * 3 % 16)
            result.append(pw)
        return result

    gen.set_nonrandom(True)
    try:
        seq = [data.prove(pw) for pw in pws()]
        gen.set_nonrandom(True)
        mesh = sharded.make_mesh(8)
        dp = dp_prove_batch(data.prover_only, data.common, pws(), mesh)
    finally:
        gen.set_nonrandom(False)
    for s, d in zip(seq, dp):
        verify(d, data.verifier_only, data.common)
        assert (write_proof_with_public_inputs(s, data.common)
                == write_proof_with_public_inputs(d, data.common))


def test_dp_prove_32_batch(small_circuit):
    """32 proofs on the 8-device mesh (4 per device): smokes the BASELINE
    configs[4] 256-proof trajectory's sharding layout."""
    x, data = small_circuit
    mesh = sharded.make_mesh(8)
    pws = []
    for i in range(32):
        pw = PartialWitness()
        pw.set_target(x, 5 + i)
        pws.append(pw)
    proofs = dp_prove_batch(data.prover_only, data.common, pws, mesh)
    assert len(proofs) == 32
    for pr in (proofs[0], proofs[13], proofs[31]):
        verify(pr, data.verifier_only, data.common)
