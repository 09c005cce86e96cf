"""Native witness-generation engine (native/witgen.c + lower.py).

The recorded-schedule replay must produce the SAME witness as the Python
fixpoint scheduler (reference plonky2/src/iop/generator.rs:25-106) for every
generator class, including the symbolic-lowered Poseidon permutation fill
(reference gates/poseidon_goldilocks.rs:438-533).
"""

import numpy as np
import pytest

from plonky2_goldibear_tpu.iop import generator as G
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.native import engine
from plonky2_goldibear_tpu.native.schedule import compile_schedule
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig

pytestmark = pytest.mark.skipif(engine.LIB is None,
                                reason="no C toolchain")


def _roundtrip(build_fn, config=None, spec=None, seed=7):
    kwargs = {}
    if spec is not None:
        kwargs["spec"] = spec
    b = CircuitBuilder(config or CircuitConfig.standard_recursion_config_gl(),
                       **kwargs)
    inputs = build_fn(b)
    data = b.build()
    pw = PartialWitness()
    for t, v in inputs:
        pw.set_target(t, v)
    G.seed_randomness(seed)
    w1, order = G._fixpoint_generate(pw, data.prover_only, data.common)
    sched = compile_schedule(order, data.prover_only, data.common)
    assert sched.n_native > 0
    G.seed_randomness(seed)
    w2 = sched.replay(pw, data.prover_only, data.common)
    assert np.array_equal(w1.full_witness(), w2.full_witness())
    return sched


def test_arithmetic_chain_and_gadgets():
    from plonky2_goldibear_tpu.plonk import gadgets

    def build(b):
        x = b.add_virtual_target()
        b.register_public_input(x)
        cur = x
        for _ in range(300):
            cur = b.arithmetic(1, 1, cur, cur, cur)
        bits = gadgets.split_le(b, cur, 64)
        s = gadgets.le_sum(b, bits[:10])
        cur2 = b.mul(s, cur)
        e = b.constant_extension((5, 7))
        e2 = b.mul_extension(e, e)
        b.div_extension(e2, e)             # _ExtInverseGenerator
        vlist = [b.constant(i * 3 + 1) for i in range(4)]
        ra = gadgets.random_access(b, b.constant(2), vlist)
        cur3 = b.mul(ra, cur2)
        b.register_public_input(cur3)
        return [(x, 3)]

    sched = _roundtrip(build)
    assert sched.n_python <= 131 + 1   # anti-#456 randomness only


def test_poseidon_hash_lowering():
    def build(b):
        x = b.add_virtual_target()
        b.register_public_input(x)
        h = b.hash_n_to_hash_no_pad([x, x, b.one()])
        h2 = b.hash_n_to_hash_no_pad(list(h) + [x])
        for e in h2:
            b.register_public_input(e)
        return [(x, 12345)]

    _roundtrip(build)


def test_exponentiation_lowering():
    from plonky2_goldibear_tpu.plonk import gadgets

    def build(b):
        x = b.add_virtual_target()
        b.register_public_input(x)
        y = gadgets.exp_u64(b, x, 0x12345)
        b.register_public_input(y)
        return [(x, 3)]

    _roundtrip(build)


def test_babybear_poseidon2_lowering():
    from plonky2_goldibear_tpu.field import host

    def build(b):
        x = b.add_virtual_target()
        b.register_public_input(x)
        h = b.hash_n_to_hash_no_pad([x, x, b.one()])
        for e in h:
            b.register_public_input(e)
        cur = x
        for _ in range(50):
            cur = b.arithmetic(1, 1, cur, cur, cur)
        return [(x, 99)]

    _roundtrip(build, config=CircuitConfig.standard_recursion_config_bb(),
               spec=host.BABYBEAR)


def test_contradiction_detected():
    """The VM's filled-check must reject contradictory copy assignments
    exactly like PartitionWitness.set_target (witness.rs:321-385)."""
    from plonky2_goldibear_tpu.native.lower import CONST, Prog

    prog = Prog(num_reps=2, p=host_p())
    prog.emit(CONST, 0, 5)
    prog.emit(CONST, 0, 6)
    code, pool = prog.arrays()
    vals = np.zeros(2, dtype=np.uint64)
    filled = np.zeros(2, dtype=np.uint8)
    with pytest.raises(engine.WitgenError, match="contradictory"):
        engine.run(host_p(), code, pool, vals, filled, 2)


def host_p():
    from plonky2_goldibear_tpu.field.host import GOLDILOCKS
    return GOLDILOCKS.p
