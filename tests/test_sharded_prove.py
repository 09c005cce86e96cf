"""Full sharded prove (parallel/sharded.py:prove_sharded): one proof
produced cooperatively by the 8-virtual-device mesh, byte-identical to the
single-chip prover and accepted by the standard verifier (SURVEY §5.8)."""

from plonky2_goldibear_tpu.iop import generator as gen
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.parallel import sharded
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.plonk.serialization import (
    write_proof_with_public_inputs)
from plonky2_goldibear_tpu.plonk.verifier import verify


def test_prove_sharded_byte_identical():
    gen.seed_randomness(99)
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config_gl())
    # no public inputs: registering one adds an in-circuit Poseidon gate
    # whose per-gate quotient program dominates XLA:CPU compile time; the
    # sharding composition is gate-agnostic (same rationale as the
    # multichip dryrun stage 2)
    x = builder.add_virtual_target()
    cur = x
    for _ in range(200):
        cur = builder.arithmetic(1, 1, cur, cur, cur)
    data = builder.build()

    def pw():
        p = PartialWitness()
        p.set_target(x, 3)
        return p

    mesh = sharded.make_mesh(8)
    gen.set_nonrandom(True)
    try:
        seq = data.prove(pw())
        gen.set_nonrandom(True)  # reset the stream for an identical witness
        sh = sharded.prove_sharded(data.prover_only, data.common, pw(), mesh)
    finally:
        gen.set_nonrandom(False)
    verify(sh, data.verifier_only, data.common)
    assert (write_proof_with_public_inputs(sh, data.common)
            == write_proof_with_public_inputs(seq, data.common))
