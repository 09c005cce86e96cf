"""Prove a value lies in [0, 2^32) (reference plonky2/examples/range_check.rs)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
import _common  # noqa: F401,E402  (examples/_common.py bootstrap)

from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk import gadgets
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.plonk.verifier import verify


def main():
    config = CircuitConfig.standard_recursion_config_gl()
    builder = CircuitBuilder(config)
    value = builder.add_virtual_target()
    gadgets.range_check(builder, value, 32)
    builder.register_public_input(value)

    data = builder.build()
    pw = PartialWitness()
    pw.set_target(value, 2 ** 31 + 12345)
    proof = data.prove(pw)
    print(f"value {proof.public_inputs[0]} proven to fit in 32 bits")
    verify(proof, data.verifier_only, data.common)
    print("proof verified")


if __name__ == "__main__":
    main()
