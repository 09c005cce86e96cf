"""Proof + circuit-data byte round trip
(reference plonky2/examples/fibonacci_serialization.rs)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
import _common  # noqa: F401,E402  (examples/_common.py bootstrap)

from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk import serialization as ser
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.plonk.verifier import verify


def main():
    config = CircuitConfig.standard_recursion_config_gl()
    builder = CircuitBuilder(config)
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    x, y = a, b
    for _ in range(99):
        x, y = y, builder.add(x, y)
    builder.register_public_inputs([a, b, y])
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(a, 0)
    pw.set_target(b, 1)
    proof = data.prove(pw)

    proof_bytes = ser.write_proof_with_public_inputs(proof, data.common)
    common_bytes = ser.write_common_circuit_data(data.common)
    vk_bytes = ser.write_verifier_only_circuit_data(data.verifier_only)
    print(f"proof: {len(proof_bytes)} bytes, common: {len(common_bytes)}, "
          f"vk: {len(vk_bytes)}")

    common2 = ser.read_common_circuit_data(common_bytes)
    vk2 = ser.read_verifier_only_circuit_data(vk_bytes)
    proof2 = ser.read_proof_with_public_inputs(proof_bytes, common2)
    verify(proof2, vk2, common2)
    print("deserialized proof verified against deserialized circuit data")


if __name__ == "__main__":
    main()
