"""Large-domain (streaming-oracle) prover: byte-identical to the dense
prover at a small degree, for both dense-built and streaming-built
circuits (plonk/prover_large.py; capability match reference
fri/oracle.rs:68-123 + fri/prover.rs:190-255)."""

from plonky2_goldibear_tpu.iop import generator as gen
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.plonk.prover_large import prove_large
from plonky2_goldibear_tpu.plonk.serialization import (
    write_proof_with_public_inputs)
from plonky2_goldibear_tpu.plonk.verifier import verify


def _build(streaming):
    gen.seed_randomness(4242)
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config_gl())
    # no public inputs: the PI Poseidon gate's quotient program dominates
    # XLA:CPU compile time; the blocked-quotient path is gate-agnostic
    x = builder.add_virtual_target()
    cur = x
    for _ in range(300):
        cur = builder.arithmetic(1, 1, cur, cur, cur)
    return x, builder.build(commit_streaming=streaming)


def test_prove_large_byte_identical():
    x, data = _build(streaming=False)

    def pw():
        p = PartialWitness()
        p.set_target(x, 3)
        return p

    gen.set_nonrandom(True)
    try:
        seq = data.prove(pw())
        gen.set_nonrandom(True)
        large = prove_large(data.prover_only, data.common, pw())
    finally:
        gen.set_nonrandom(False)
    verify(large, data.verifier_only, data.common)
    assert (write_proof_with_public_inputs(large, data.common)
            == write_proof_with_public_inputs(seq, data.common))


def test_prove_large_streaming_build():
    """A circuit BUILT with the streaming constants commitment proves and
    verifies (the dense prover can't run on it — no resident cs LDE)."""
    x, data = _build(streaming=True)
    pw = PartialWitness()
    pw.set_target(x, 7)
    proof = prove_large(data.prover_only, data.common, pw)
    verify(proof, data.verifier_only, data.common)
