"""Prove knowledge of 100! (reference plonky2/examples/factorial.rs)."""
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
    p = builder.spec.p

    initial = builder.add_virtual_target()
    cur = initial
    for i in range(2, 101):
        cur = builder.mul_const(i, cur)
    builder.register_public_input(initial)
    builder.register_public_input(cur)

    data = builder.build()
    pw = PartialWitness()
    pw.set_target(initial, 1)
    proof = data.prove(pw)

    import math
    assert proof.public_inputs[1] == math.factorial(100) % p
    print(f"100! mod p = {proof.public_inputs[1]}")
    verify(proof, data.verifier_only, data.common)
    print("proof verified")


if __name__ == "__main__":
    main()
