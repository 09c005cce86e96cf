"""Witness-generator serde round trip
(reference util/serialization/generator_serialization.rs:23-106)."""

from plonky2_goldibear_tpu.iop.generator import seed_randomness
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk import generator_serialization as gser
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig


def _build_rich_circuit():
    """A circuit whose generator set spans many classes (arithmetic, ext
    inverse, poseidon hashing, random access, lookups, base split)."""
    seed_randomness(777)
    config = CircuitConfig.standard_recursion_config_gl()
    b = CircuitBuilder(config)
    x = b.add_virtual_target()
    y = b.mul(x, x)
    e = b.convert_to_ext(y)
    inv = b.inverse_extension(e) if hasattr(b, "inverse_extension") else None
    h = b.hash_n_to_m_no_pad([x, y] * 5, b.spec.num_hash_out_elts)
    lut = b.add_lookup_table_from_table(list(range(16)),
                                        [(3 * i) % 16 for i in range(16)])
    out = b.add_lookup_from_index(x, lut)
    b.register_public_input(out)
    for t in h:
        b.register_public_input(t)
    return b, x


def test_generator_roundtrip_and_reuse():
    b, x = _build_rich_circuit()
    data = b.build()
    gens = data.prover_only.generators
    blob = gser.write_generators(gens, b.spec)
    back = gser.read_generators(blob, b.spec, data.common.config)
    assert len(back) == len(gens)
    assert [type(g).__name__ for g in back] == \
        [type(g).__name__ for g in gens]

    # the deserialized generators must actually prove: swap them in
    data.prover_only.generators = back
    pw = PartialWitness()
    pw.set_target(x, 5)
    proof = data.prove(pw)
    from plonky2_goldibear_tpu.plonk.verifier import verify
    verify(proof, data.verifier_only, data.common)


def test_user_generator_registration():
    from plonky2_goldibear_tpu.iop.generator import SimpleGenerator

    @gser.register_generator
    class MyGen(SimpleGenerator):
        def __init__(self, a):
            self.a = a

        def dependencies(self):
            return []

    blob = gser.write_generators([MyGen(7)])
    back = gser.read_generators(blob)
    assert type(back[0]).__name__ == "MyGen" and back[0].a == 7


def test_nonrandom_mode_matches_reference_counter_rng():
    """disable-randomness analog (reference field/src/types.rs:40-77 +
    rand-0.8.4 UniformInt::sample_single): NonRandomRng yields
    next_u64 = 2, 3, 4, ...; pushing that through gen_range(0..p) gives
    1, 2, 3, ... for Goldilocks (no rejection at tiny counters) and a
    REJECTED first draw for BabyBear (2p's low half exceeds the zone)."""
    from plonky2_goldibear_tpu.field.host import BABYBEAR, GOLDILOCKS
    from plonky2_goldibear_tpu.iop import generator as gen

    gen.set_nonrandom(True)
    try:
        gl_vals = [gen.rand_field_element(GOLDILOCKS.p) for _ in range(5)]
        assert gl_vals == [1, 2, 3, 4, 5]
        gen.set_nonrandom(True)  # reset counter
        bb_vals = [gen.rand_field_element(BABYBEAR.p) for _ in range(4)]
        # v=2 rejected (lo=0xF0000002 > zone=0xF0000001), then v=3,4,5
        # accept with hi = 1, 1, 2
        assert bb_vals == [1, 1, 2, 2]
    finally:
        gen.set_nonrandom(False)
