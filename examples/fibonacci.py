"""Prove the 100th Fibonacci number (reference plonky2/examples/fibonacci.rs)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
import _common  # noqa: F401,E402  (examples/_common.py bootstrap)

from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.plonk.verifier import verify


def main():
    config = CircuitConfig.standard_recursion_config_gl()
    builder = CircuitBuilder(config)

    initial_a = builder.add_virtual_target()
    initial_b = builder.add_virtual_target()
    prev, cur = initial_a, initial_b
    for _ in range(99):
        prev, cur = cur, builder.add(prev, cur)
    builder.register_public_input(initial_a)
    builder.register_public_input(initial_b)
    builder.register_public_input(cur)

    data = builder.build()
    pw = PartialWitness()
    pw.set_target(initial_a, 0)
    pw.set_target(initial_b, 1)
    proof = data.prove(pw)
    print(f"100th Fibonacci number (mod p) = {proof.public_inputs[2]}")
    verify(proof, data.verifier_only, data.common)
    print("proof verified")


if __name__ == "__main__":
    main()
