"""Prove knowledge of a square root via a custom witness generator
(reference plonky2/examples/square_root.rs: SquareRootGenerator +
Tonelli-Shanks)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
import _common  # noqa: F401,E402  (examples/_common.py bootstrap)

from plonky2_goldibear_tpu.field.host import GOLDILOCKS
from plonky2_goldibear_tpu.iop.generator import SimpleGenerator
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.plonk.verifier import verify


def tonelli_shanks_sqrt(x: int, p: int) -> int:
    # p - 1 = 2^32 * t for Goldilocks
    if x == 0:
        return 0
    t = (p - 1) >> 32
    z = 7  # non-residue (the multiplicative generator)
    m, c, u, r = 32, pow(z, t, p), pow(x, t, p), pow(x, (t + 1) // 2, p)
    while u != 1:
        # find least i with u^(2^i) = 1
        i, s = 0, u
        while s != 1:
            s = s * s % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        u, r = u * c % p, r * b % p
    return r


class SquareRootGenerator(SimpleGenerator):
    def __init__(self, x, x_squared, p):
        self.x, self.x_squared, self.p = x, x_squared, p

    def dependencies(self):
        return [self.x_squared]

    def run_once(self, witness, out):
        sq = witness.get_target(self.x_squared)
        out.append((self.x, tonelli_shanks_sqrt(sq, self.p)))


def main():
    config = CircuitConfig.standard_recursion_config_gl()
    builder = CircuitBuilder(config)
    p = builder.spec.p

    x = builder.add_virtual_target()
    x_squared = builder.square(x)
    builder.register_public_input(x_squared)
    builder.add_simple_generator(SquareRootGenerator(x, x_squared, p))

    data = builder.build()
    x_value = 8846460
    pw = PartialWitness()
    pw.set_target(x_squared, x_value * x_value % p)
    proof = data.prove(pw)
    print(f"proved knowledge of sqrt({proof.public_inputs[0]})")
    verify(proof, data.verifier_only, data.common)
    print("proof verified")


if __name__ == "__main__":
    main()
