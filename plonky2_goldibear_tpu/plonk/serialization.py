"""Binary (de)serialization compatible with the reference wire format
(reference plonky2/src/util/serialization/mod.rs, gate_serialization.rs).

Covers reading CommonCircuitData / VerifierOnlyCircuitData /
ProofWithPublicInputs — enough to ingest circuits and proofs produced by
the reference prover (e.g. its committed GL recursive-verifier regression
vectors) and verify them natively.  Writing mirrors reading for
checkpoint/resume of our own artifacts.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

from ..field import host
from ..gates.access_gates import (BaseSumGate, ExponentiationGate,
                                  RandomAccessGate)
from ..gates.basic_gates import (ArithmeticGate, ConstantGate, NoopGate,
                                 PublicInputGate)
from ..gates.coset_interpolation import CosetInterpolationGate
from ..gates.extension_gates import ArithmeticExtensionGate, MulExtensionGate
from ..gates.poseidon import PoseidonGate
from ..gates.poseidon_mds import PoseidonMdsGate
from ..gates.reducing import ReducingExtensionGate, ReducingGate
from ..gates.selectors import SelectorsInfo
from .circuit_data import CommonCircuitData, VerifierOnlyCircuitData
from .config import CircuitConfig, FriConfig, FriParams, FriReductionStrategy
from .proof import (FriInitialTreeProof, FriProof, FriQueryRound,
                    FriQueryStep, OpeningSet, Proof, ProofWithPublicInputs)


class Buffer:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read_exact(self, n: int) -> bytes:
        assert self.pos + n <= len(self.data), "buffer underrun"
        out = self.data[self.pos:self.pos + n]
        self.pos += n
        return out

    def read_u8(self) -> int:
        return self.read_exact(1)[0]

    def read_bool(self) -> bool:
        v = self.read_u8()
        assert v in (0, 1)
        return v == 1

    def read_u16(self) -> int:
        return struct.unpack("<H", self.read_exact(2))[0]

    def read_u32(self) -> int:
        return struct.unpack("<I", self.read_exact(4))[0]

    def read_usize(self) -> int:
        return struct.unpack("<Q", self.read_exact(8))[0]

    def read_usize_vec(self) -> List[int]:
        return [self.read_usize() for _ in range(self.read_usize())]

    def read_field(self, spec=host.GOLDILOCKS) -> int:
        # 8-byte LE canonical (reference hash_types.rs read_from_buffer;
        # BabyBear also serializes canonical u64s)
        v = struct.unpack("<Q", self.read_exact(8))[0]
        return v % spec.p

    def read_field_vec(self, n: int, spec=host.GOLDILOCKS) -> List[int]:
        return [self.read_field(spec) for _ in range(n)]

    def read_field_ext(self, spec=host.GOLDILOCKS) -> Tuple[int, ...]:
        return tuple(self.read_field(spec) for _ in range(spec.ext_degree))

    def read_field_ext_vec(self, n: int, spec=host.GOLDILOCKS):
        return [self.read_field_ext(spec) for _ in range(n)]

    def read_hash(self, spec=host.GOLDILOCKS, digest_bytes=None):
        # HASH_SIZE raw bytes (reference mod.rs:253-262): HashOut = 32
        # bytes of field elements (GL: 4 u64 LE, BB: 8 u32 LE); BytesHash
        # (Keccak config) = digest_bytes opaque bytes
        if digest_bytes is not None:
            return self.read_exact(digest_bytes)
        if spec.bits > 32:
            return [struct.unpack("<Q", self.read_exact(8))[0] % spec.p
                    for _ in range(4)]
        return [struct.unpack("<I", self.read_exact(4))[0] % spec.p
                for _ in range(8)]

    def read_merkle_cap(self, cap_height: int, spec=host.GOLDILOCKS,
                        digest_bytes=None):
        return [self.read_hash(spec, digest_bytes)
                for _ in range(1 << cap_height)]

    def read_merkle_proof(self, spec=host.GOLDILOCKS, digest_bytes=None):
        length = self.read_u8()
        return [self.read_hash(spec, digest_bytes) for _ in range(length)]


# -- config / params ----------------------------------------------------------


def read_fri_reduction_strategy(buf: Buffer) -> FriReductionStrategy:
    variant = buf.read_u8()
    if variant == 0:
        return FriReductionStrategy(kind="fixed",
                                    fixed=tuple(buf.read_usize_vec()))
    if variant == 1:
        return FriReductionStrategy(kind="constant_arity",
                                    arity_bits=buf.read_usize(),
                                    final_poly_bits=buf.read_usize())
    if variant == 2:
        is_some = buf.read_u8()
        mx = buf.read_usize() if is_some else None
        return FriReductionStrategy(kind="min_size", max_arity_bits=mx)
    raise ValueError(variant)


def read_fri_config(buf: Buffer) -> FriConfig:
    rate_bits = buf.read_usize()
    cap_height = buf.read_usize()
    num_query_rounds = buf.read_usize()
    proof_of_work_bits = buf.read_u32()
    strategy = read_fri_reduction_strategy(buf)
    return FriConfig(rate_bits=rate_bits, cap_height=cap_height,
                     proof_of_work_bits=proof_of_work_bits,
                     reduction_strategy=strategy,
                     num_query_rounds=num_query_rounds)


def read_circuit_config(buf: Buffer) -> CircuitConfig:
    num_wires = buf.read_usize()
    num_routed_wires = buf.read_usize()
    num_constants = buf.read_usize()
    security_bits = buf.read_usize()
    num_challenges = buf.read_usize()
    max_qdf = buf.read_usize()
    use_base = buf.read_bool()
    zk = buf.read_bool()
    fri_config = read_fri_config(buf)
    return CircuitConfig(num_wires=num_wires,
                         num_routed_wires=num_routed_wires,
                         num_constants=num_constants,
                         use_base_arithmetic_gate=use_base,
                         security_bits=security_bits,
                         num_challenges=num_challenges, zero_knowledge=zk,
                         max_quotient_degree_factor=max_qdf,
                         fri_config=fri_config)


def read_fri_params(buf: Buffer) -> FriParams:
    config = read_fri_config(buf)
    arity_bits = tuple(buf.read_usize_vec())
    degree_bits = buf.read_usize()
    hiding = buf.read_bool()
    return FriParams(config=config, hiding=hiding, degree_bits=degree_bits,
                     reduction_arity_bits=arity_bits)


def read_selectors_info(buf: Buffer) -> SelectorsInfo:
    indices = buf.read_usize_vec()
    groups = [(buf.read_usize(), buf.read_usize())
              for _ in range(buf.read_usize())]
    return SelectorsInfo(selector_indices=indices, groups=groups)


# -- gates (DefaultGateSerializer tag order,
#    reference gate_serialization.rs:143-166) --------------------------------


def _read_gate(buf: Buffer, spec: host.FieldSpec, config: CircuitConfig,
               luts=()):
    tag = buf.read_u32()
    D = spec.ext_degree
    nho = spec.num_hash_out_elts
    if tag == 0:
        return ArithmeticGate(buf.read_usize())
    if tag == 1:
        return ArithmeticExtensionGate(buf.read_usize(), D)
    if tag == 2:
        return BaseSumGate(buf.read_usize(), 2)
    if tag == 3:
        return ConstantGate(buf.read_usize())
    if tag == 4:
        subgroup_bits = buf.read_usize()
        degree = buf.read_usize()
        n = buf.read_usize()
        weights = buf.read_field_vec(n, spec)
        return CosetInterpolationGate.from_serialized(subgroup_bits, degree,
                                                      weights, spec)
    if tag == 5:
        return ExponentiationGate(buf.read_usize())
    if tag == 6:
        from ..gates.lookup_gates import LookupGate
        num_slots = buf.read_usize()
        lut_index = buf.read_usize()
        h = buf.read_exact(32)
        g = LookupGate(num_slots, luts[lut_index])
        assert g.lut_hash == h, "lookup table hash mismatch"
        return g
    if tag == 7:
        from ..gates.lookup_gates import LookupTableGate
        num_slots = buf.read_usize()
        last_lut_row = buf.read_usize()
        lut_index = buf.read_usize()
        h = buf.read_exact(32)
        g = LookupTableGate(num_slots, luts[lut_index], last_lut_row)
        assert g.lut_hash == h, "lookup table hash mismatch"
        return g
    if tag == 8:
        return MulExtensionGate(buf.read_usize(), D)
    if tag == 9:
        return NoopGate()
    if tag == 10:
        return PoseidonMdsGate(D)
    if tag == 11:
        return PoseidonGate()
    if tag == 12:
        return PublicInputGate(nho)
    if tag == 13:
        bits = buf.read_usize()
        copies = buf.read_usize()
        extra = buf.read_usize()
        return RandomAccessGate(bits, copies, extra)
    if tag == 14:
        return ReducingExtensionGate(buf.read_usize(), D)
    if tag == 15:
        return ReducingGate(buf.read_usize(), D)
    if tag == 16:
        from ..gates.poseidon2_bb_gate import Poseidon2BabyBearGate
        return Poseidon2BabyBearGate.from_config(config)
    if tag == 17:
        from ..gates.misc_gates import AddManyGate
        num_addends = buf.read_usize()
        num_ops = buf.read_usize()
        return AddManyGate(num_addends, num_ops)
    if tag == 18:
        from ..gates.misc_gates import ApplyMat4Gate
        return ApplyMat4Gate(buf.read_usize(), D)
    if tag == 19:
        from ..gates.misc_gates import Poseidon2InternalPermutationGate
        return Poseidon2InternalPermutationGate(D)
    raise NotImplementedError(f"unknown gate tag {tag}")


# -- top-level structures -----------------------------------------------------


def read_common_circuit_data(data: bytes,
                             spec: host.FieldSpec = host.GOLDILOCKS
                             ) -> CommonCircuitData:
    """reference serialization/mod.rs:774-860 (read_common_circuit_data)."""
    buf = Buffer(data)
    config = read_circuit_config(buf)
    fri_params = read_fri_params(buf)
    selectors_info = read_selectors_info(buf)
    quotient_degree_factor = buf.read_usize()
    num_gate_constraints = buf.read_usize()
    num_constants = buf.read_usize()
    num_public_inputs = buf.read_usize()
    k_len = buf.read_usize()
    k_is = buf.read_field_vec(k_len, spec)
    num_partial_products = buf.read_usize()
    num_lookup_polys = buf.read_usize()
    num_lookup_selectors = buf.read_usize()
    num_luts = buf.read_usize()
    luts = []
    for _ in range(num_luts):
        n_pairs = buf.read_usize()
        luts.append(tuple((buf.read_u16(), buf.read_u16())
                          for _ in range(n_pairs)))
    num_gates = buf.read_usize()
    gates = [_read_gate(buf, spec, config, luts) for _ in range(num_gates)]
    assert buf.pos == len(data), (buf.pos, len(data))
    return CommonCircuitData(
        config=config, spec=spec, fri_params=fri_params, gates=gates,
        selectors_info=selectors_info,
        quotient_degree_factor=quotient_degree_factor,
        num_gate_constraints=num_gate_constraints,
        num_constants=num_constants, num_public_inputs=num_public_inputs,
        k_is=k_is, num_partial_products=num_partial_products,
        num_lookup_polys=num_lookup_polys,
        num_lookup_selectors=num_lookup_selectors)


def read_verifier_only_circuit_data(data: bytes,
                                    spec: host.FieldSpec = host.GOLDILOCKS,
                                    hasher=None) -> VerifierOnlyCircuitData:
    db = hasher.HASH_SIZE if getattr(hasher, "DIGEST_IS_BYTES", False) \
        else None
    buf = Buffer(data)
    height = buf.read_usize()
    cap = buf.read_merkle_cap(height, spec, db)
    digest = buf.read_hash(spec, db)
    assert buf.pos == len(data)
    return VerifierOnlyCircuitData(constants_sigmas_cap=cap,
                                   circuit_digest=digest)


def read_proof_with_public_inputs(data: bytes, common: CommonCircuitData,
                                  hasher=None) -> ProofWithPublicInputs:
    """reference serialization/mod.rs:1023-1090.  ``hasher`` = the config's
    Merkle hasher; a BytesHash hasher (Keccak config) makes every digest
    HASH_SIZE raw bytes (reference mod.rs:253-262 is generic over H)."""
    spec = common.spec
    db = hasher.HASH_SIZE if getattr(hasher, "DIGEST_IS_BYTES", False) \
        else None
    buf = Buffer(data)
    config = common.config
    ch = config.fri_config.cap_height
    wires_cap = buf.read_merkle_cap(ch, spec, db)
    zs_pp_cap = buf.read_merkle_cap(ch, spec, db)
    quotient_cap = buf.read_merkle_cap(ch, spec, db)

    # opening set (reference mod.rs:343-388; note lookup_zs read between
    # plonk_zs_next and partial_products)
    constants = buf.read_field_ext_vec(common.num_constants, spec)
    plonk_sigmas = buf.read_field_ext_vec(config.num_routed_wires, spec)
    wires = buf.read_field_ext_vec(config.num_wires, spec)
    plonk_zs = buf.read_field_ext_vec(config.num_challenges, spec)
    plonk_zs_next = buf.read_field_ext_vec(config.num_challenges, spec)
    lookup_zs = buf.read_field_ext_vec(common.num_all_lookup_polys(), spec)
    lookup_zs_next = buf.read_field_ext_vec(common.num_all_lookup_polys(),
                                            spec)
    partial_products = buf.read_field_ext_vec(
        common.num_partial_products * config.num_challenges, spec)
    quotient_polys = buf.read_field_ext_vec(
        common.quotient_degree_factor * config.num_challenges, spec)
    openings = OpeningSet(
        constants=constants, plonk_sigmas=plonk_sigmas, wires=wires,
        plonk_zs=plonk_zs, plonk_zs_next=plonk_zs_next,
        partial_products=partial_products, quotient_polys=quotient_polys,
        lookup_zs=lookup_zs, lookup_zs_next=lookup_zs_next)

    # FRI proof (reference mod.rs:575-600)
    salt = 4 if common.fri_params.hiding else 0
    caps = [buf.read_merkle_cap(ch, spec, db)
            for _ in common.fri_params.reduction_arity_bits]
    query_rounds = []
    for _ in range(config.fri_config.num_query_rounds):
        evals_proofs = []
        for n in [common.num_constants + config.num_routed_wires,
                  config.num_wires + salt,
                  config.num_challenges * (1 + common.num_partial_products
                                           + common.num_lookup_polys) + salt,
                  config.num_challenges * common.quotient_degree_factor
                  + salt]:
            vals = buf.read_field_vec(n, spec)
            mp = buf.read_merkle_proof(spec, db)
            evals_proofs.append((vals, mp))
        steps = [FriQueryStep(
            evals=buf.read_field_ext_vec(1 << ar, spec),
            merkle_proof=buf.read_merkle_proof(spec, db))
            for ar in common.fri_params.reduction_arity_bits]
        query_rounds.append(FriQueryRound(
            initial_trees_proof=FriInitialTreeProof(evals_proofs),
            steps=steps))
    final_poly = buf.read_field_ext_vec(common.fri_params.final_poly_len,
                                        spec)
    pow_witness = buf.read_field(spec)
    proof = Proof(wires_cap=wires_cap,
                  plonk_zs_partial_products_cap=zs_pp_cap,
                  quotient_polys_cap=quotient_cap, openings=openings,
                  opening_proof=FriProof(
                      commit_phase_merkle_caps=caps,
                      query_round_proofs=query_rounds,
                      final_poly=final_poly, pow_witness=pow_witness))
    pi_len = buf.read_usize()
    public_inputs = buf.read_field_vec(pi_len, spec)
    assert buf.pos == len(data), (buf.pos, len(data))
    return ProofWithPublicInputs(proof=proof, public_inputs=public_inputs)


# -- writing (mirrors reading; reference Write trait) -------------------------


class Writer:
    def __init__(self):
        self.out = bytearray()

    def write_u8(self, v: int):
        self.out.append(v & 0xFF)

    def write_bool(self, v: bool):
        self.write_u8(1 if v else 0)

    def write_u32(self, v: int):
        self.out += struct.pack("<I", v)

    def write_usize(self, v: int):
        self.out += struct.pack("<Q", v)

    def write_usize_vec(self, vs):
        self.write_usize(len(vs))
        for v in vs:
            self.write_usize(v)

    def write_field(self, v: int):
        self.out += struct.pack("<Q", int(v))

    def write_field_vec(self, vs):
        for v in vs:
            self.write_field(v)

    def write_field_ext(self, v):
        for c in v:
            self.write_field(c)

    def write_field_ext_vec(self, vs):
        for v in vs:
            self.write_field_ext(v)

    def write_hash(self, h, spec=host.GOLDILOCKS):
        if isinstance(h, (bytes, bytearray)):   # BytesHash (Keccak config)
            self.out += bytes(h)
            return
        if spec.bits > 32:
            for x in h:
                self.out += struct.pack("<Q", int(x))
        else:
            for x in h:
                self.out += struct.pack("<I", int(x))

    def write_merkle_cap(self, cap, spec=host.GOLDILOCKS):
        for h in cap:
            self.write_hash(h, spec)

    def write_merkle_proof(self, siblings, spec=host.GOLDILOCKS):
        self.write_u8(len(siblings))
        for h in siblings:
            self.write_hash(h, spec)


def _write_fri_reduction_strategy(w: Writer, s: FriReductionStrategy):
    if s.kind == "fixed":
        w.write_u8(0)
        w.write_usize_vec(list(s.fixed))
    elif s.kind == "constant_arity":
        w.write_u8(1)
        w.write_usize(s.arity_bits)
        w.write_usize(s.final_poly_bits)
    else:
        w.write_u8(2)
        if s.max_arity_bits is None:
            w.write_u8(0)
        else:
            w.write_u8(1)
            w.write_usize(s.max_arity_bits)


def _write_fri_config(w: Writer, c: FriConfig):
    w.write_usize(c.rate_bits)
    w.write_usize(c.cap_height)
    w.write_usize(c.num_query_rounds)
    w.write_u32(c.proof_of_work_bits)
    _write_fri_reduction_strategy(w, c.reduction_strategy)


def _write_circuit_config(w: Writer, c: CircuitConfig):
    w.write_usize(c.num_wires)
    w.write_usize(c.num_routed_wires)
    w.write_usize(c.num_constants)
    w.write_usize(c.security_bits)
    w.write_usize(c.num_challenges)
    w.write_usize(c.max_quotient_degree_factor)
    w.write_bool(c.use_base_arithmetic_gate)
    w.write_bool(c.zero_knowledge)
    _write_fri_config(w, c.fri_config)


def _write_fri_params(w: Writer, p: FriParams):
    _write_fri_config(w, p.config)
    w.write_usize_vec(list(p.reduction_arity_bits))
    w.write_usize(p.degree_bits)
    w.write_bool(p.hiding)


def _write_gate(w: Writer, gate, spec, luts=()):
    if isinstance(gate, ArithmeticGate):
        w.write_u32(0)
        w.write_usize(gate.num_ops)
    elif isinstance(gate, ArithmeticExtensionGate):
        w.write_u32(1)
        w.write_usize(gate.num_ops)
    elif isinstance(gate, BaseSumGate):
        assert gate.base == 2
        w.write_u32(2)
        w.write_usize(gate.num_limbs)
    elif isinstance(gate, ConstantGate):
        w.write_u32(3)
        w.write_usize(gate.num_consts)
    elif isinstance(gate, CosetInterpolationGate):
        w.write_u32(4)
        w.write_usize(gate.subgroup_bits)
        w.write_usize(gate.gate_degree)
        w.write_usize(len(gate.barycentric_weights))
        w.write_field_vec(gate.barycentric_weights)
    elif isinstance(gate, ExponentiationGate):
        w.write_u32(5)
        w.write_usize(gate.num_power_bits)
    elif isinstance(gate, MulExtensionGate):
        w.write_u32(8)
        w.write_usize(gate.num_ops)
    elif isinstance(gate, NoopGate):
        w.write_u32(9)
    elif isinstance(gate, PoseidonMdsGate):
        w.write_u32(10)
    elif isinstance(gate, PoseidonGate):
        w.write_u32(11)
    elif isinstance(gate, PublicInputGate):
        w.write_u32(12)
    elif isinstance(gate, RandomAccessGate):
        w.write_u32(13)
        w.write_usize(gate.bits)
        w.write_usize(gate.num_copies)
        w.write_usize(gate.num_extra_constants)
    elif isinstance(gate, ReducingExtensionGate):
        w.write_u32(14)
        w.write_usize(gate.num_coeffs)
    elif isinstance(gate, ReducingGate):
        w.write_u32(15)
        w.write_usize(gate.num_coeffs)
    else:
        from ..gates.lookup_gates import LookupGate, LookupTableGate
        from ..gates.misc_gates import (AddManyGate, ApplyMat4Gate,
                                        Poseidon2InternalPermutationGate)
        from ..gates.poseidon2_bb_gate import Poseidon2BabyBearGate
        if isinstance(gate, LookupGate):
            w.write_u32(6)
            w.write_usize(gate.num_slots)
            w.write_usize(luts.index(gate.lut))
            w.out += gate.lut_hash
        elif isinstance(gate, LookupTableGate):
            w.write_u32(7)
            w.write_usize(gate.num_slots)
            w.write_usize(gate.last_lut_row)
            w.write_usize(luts.index(gate.lut))
            w.out += gate.lut_hash
        elif isinstance(gate, Poseidon2BabyBearGate):
            w.write_u32(16)
        elif isinstance(gate, AddManyGate):
            w.write_u32(17)
            w.write_usize(gate.num_addends)
            w.write_usize(gate.num_ops)
        elif isinstance(gate, ApplyMat4Gate):
            w.write_u32(18)
            w.write_usize(gate.num_ops)
        elif isinstance(gate, Poseidon2InternalPermutationGate):
            w.write_u32(19)
        else:
            raise NotImplementedError(type(gate))


def write_common_circuit_data(common: CommonCircuitData) -> bytes:
    w = Writer()
    _write_circuit_config(w, common.config)
    _write_fri_params(w, common.fri_params)
    w.write_usize_vec(common.selectors_info.selector_indices)
    w.write_usize(len(common.selectors_info.groups))
    for a, b in common.selectors_info.groups:
        w.write_usize(a)
        w.write_usize(b)
    w.write_usize(common.quotient_degree_factor)
    w.write_usize(common.num_gate_constraints)
    w.write_usize(common.num_constants)
    w.write_usize(common.num_public_inputs)
    w.write_usize(len(common.k_is))
    w.write_field_vec(common.k_is)
    w.write_usize(common.num_partial_products)
    w.write_usize(common.num_lookup_polys)
    w.write_usize(common.num_lookup_selectors)
    w.write_usize(len(common.luts))
    for lut in common.luts:
        w.write_usize(len(lut))
        for a, bb_ in lut:
            w.out += struct.pack("<H", a) + struct.pack("<H", bb_)
    w.write_usize(len(common.gates))
    for g in common.gates:
        _write_gate(w, g, common.spec, list(common.luts))
    return bytes(w.out)


def write_verifier_only_circuit_data(vk: VerifierOnlyCircuitData,
                                     spec=host.GOLDILOCKS) -> bytes:
    w = Writer()
    w.write_usize(host.log2_strict(len(vk.constants_sigmas_cap)))
    w.write_merkle_cap(vk.constants_sigmas_cap, spec)
    w.write_hash(vk.circuit_digest, spec)
    return bytes(w.out)


def write_proof_with_public_inputs(pwp: ProofWithPublicInputs,
                                   common: CommonCircuitData) -> bytes:
    spec = common.spec
    w = Writer()
    p = pwp.proof
    w.write_merkle_cap(p.wires_cap, spec)
    w.write_merkle_cap(p.plonk_zs_partial_products_cap, spec)
    w.write_merkle_cap(p.quotient_polys_cap, spec)
    o = p.openings
    w.write_field_ext_vec(o.constants)
    w.write_field_ext_vec(o.plonk_sigmas)
    w.write_field_ext_vec(o.wires)
    w.write_field_ext_vec(o.plonk_zs)
    w.write_field_ext_vec(o.plonk_zs_next)
    w.write_field_ext_vec(o.lookup_zs)
    w.write_field_ext_vec(o.lookup_zs_next)
    w.write_field_ext_vec(o.partial_products)
    w.write_field_ext_vec(o.quotient_polys)
    f = p.opening_proof
    for cap in f.commit_phase_merkle_caps:
        w.write_merkle_cap(cap, spec)
    for rnd in f.query_round_proofs:
        for vals, mp in rnd.initial_trees_proof.evals_proofs:
            w.write_field_vec(vals)
            w.write_merkle_proof(mp, spec)
        for step in rnd.steps:
            w.write_field_ext_vec(step.evals)
            w.write_merkle_proof(step.merkle_proof, spec)
    w.write_field_ext_vec(f.final_poly)
    w.write_field(f.pow_witness)
    w.write_usize(len(pwp.public_inputs))
    w.write_field_vec(pwp.public_inputs)
    return bytes(w.out)


# -- compressed proof bytes (reference serialization/mod.rs:1102-1230,
#    2168-2214: write_compressed_proof / read_compressed_proof) --------------


def write_compressed_proof_with_public_inputs(cpwp, common) -> bytes:
    """reference mod.rs:2216-2245 write_compressed_proof_with_public_inputs.
    Note the reference frames public inputs by the REMAINING buffer length
    (mod.rs:1226), so no count prefix is written."""
    spec = common.spec
    w = Writer()
    p = cpwp.proof
    w.write_merkle_cap(p.wires_cap, spec)
    w.write_merkle_cap(p.plonk_zs_partial_products_cap, spec)
    w.write_merkle_cap(p.quotient_polys_cap, spec)
    o = p.openings
    w.write_field_ext_vec(o.constants)
    w.write_field_ext_vec(o.plonk_sigmas)
    w.write_field_ext_vec(o.wires)
    w.write_field_ext_vec(o.plonk_zs)
    w.write_field_ext_vec(o.plonk_zs_next)
    w.write_field_ext_vec(o.lookup_zs)
    w.write_field_ext_vec(o.lookup_zs_next)
    w.write_field_ext_vec(o.partial_products)
    w.write_field_ext_vec(o.quotient_polys)
    f = p.opening_proof
    for cap in f.commit_phase_merkle_caps:
        w.write_merkle_cap(cap, spec)
    cf = f.query_round_proofs
    for i in cf.indices:
        w.write_u32(i)
    for _, itp in sorted(cf.initial_trees_proofs.items()):
        for vals, mp in itp.evals_proofs:
            w.write_field_vec(vals)
            w.write_merkle_proof(mp, spec)
    for step_map in cf.steps:
        for _, fqs in sorted(step_map.items()):
            w.write_field_ext_vec(fqs.evals)      # arity-1 evals
            w.write_merkle_proof(fqs.merkle_proof, spec)
    w.write_field_ext_vec(f.final_poly)
    w.write_field(f.pow_witness)
    w.write_field_vec(cpwp.public_inputs)         # remaining-length framed
    return bytes(w.out)


def read_compressed_proof_with_public_inputs(data: bytes, common):
    """reference mod.rs:1102-1230."""
    from .compression import (CompressedFriProof, CompressedFriQueryRounds,
                              CompressedProof,
                              CompressedProofWithPublicInputs)

    spec = common.spec
    config = common.config
    ch = config.fri_config.cap_height
    buf = Buffer(data)
    wires_cap = buf.read_merkle_cap(ch, spec)
    zs_pp_cap = buf.read_merkle_cap(ch, spec)
    quotient_cap = buf.read_merkle_cap(ch, spec)

    constants = buf.read_field_ext_vec(common.num_constants, spec)
    plonk_sigmas = buf.read_field_ext_vec(config.num_routed_wires, spec)
    wires = buf.read_field_ext_vec(config.num_wires, spec)
    plonk_zs = buf.read_field_ext_vec(config.num_challenges, spec)
    plonk_zs_next = buf.read_field_ext_vec(config.num_challenges, spec)
    lookup_zs = buf.read_field_ext_vec(common.num_all_lookup_polys(), spec)
    lookup_zs_next = buf.read_field_ext_vec(common.num_all_lookup_polys(),
                                            spec)
    partial_products = buf.read_field_ext_vec(
        common.num_partial_products * config.num_challenges, spec)
    quotient_polys = buf.read_field_ext_vec(
        common.quotient_degree_factor * config.num_challenges, spec)
    openings = OpeningSet(
        constants=constants, plonk_sigmas=plonk_sigmas, wires=wires,
        plonk_zs=plonk_zs, plonk_zs_next=plonk_zs_next,
        partial_products=partial_products, quotient_polys=quotient_polys,
        lookup_zs=lookup_zs, lookup_zs_next=lookup_zs_next)

    salt = 4 if common.fri_params.hiding else 0
    caps = [buf.read_merkle_cap(ch, spec)
            for _ in common.fri_params.reduction_arity_bits]
    original_indices = [buf.read_u32()
                        for _ in range(config.fri_config.num_query_rounds)]
    indices = sorted(set(original_indices))
    initial_trees_proofs = {}
    for i in indices:
        evals_proofs = []
        for n in [common.num_constants + config.num_routed_wires,
                  config.num_wires + salt,
                  config.num_challenges * (1 + common.num_partial_products
                                           + common.num_lookup_polys) + salt,
                  config.num_challenges * common.quotient_degree_factor
                  + salt]:
            vals = buf.read_field_vec(n, spec)
            mp = buf.read_merkle_proof(spec)
            evals_proofs.append((vals, mp))
        initial_trees_proofs[i] = FriInitialTreeProof(evals_proofs)
    steps = []
    cur = list(indices)
    for ar in common.fri_params.reduction_arity_bits:
        cur = sorted(set(x >> ar for x in cur))
        step_map = {}
        for i in cur:
            evals = buf.read_field_ext_vec((1 << ar) - 1, spec)
            mp = buf.read_merkle_proof(spec)
            step_map[i] = FriQueryStep(evals=evals, merkle_proof=mp)
        steps.append(step_map)
    final_poly = buf.read_field_ext_vec(common.fri_params.final_poly_len,
                                        spec)
    pow_witness = buf.read_field(spec)
    remaining = (len(data) - buf.pos) // 8
    public_inputs = buf.read_field_vec(remaining, spec)
    assert buf.pos == len(data)
    return CompressedProofWithPublicInputs(
        proof=CompressedProof(
            wires_cap=wires_cap,
            plonk_zs_partial_products_cap=zs_pp_cap,
            quotient_polys_cap=quotient_cap,
            openings=openings,
            opening_proof=CompressedFriProof(
                commit_phase_merkle_caps=caps,
                query_round_proofs=CompressedFriQueryRounds(
                    indices=original_indices,
                    initial_trees_proofs=initial_trees_proofs,
                    steps=steps),
                final_poly=final_poly,
                pow_witness=pow_witness)),
        public_inputs=public_inputs)


# -- prover-only checkpoint bytes (reference circuit_data.rs:348-365,
#    serialization/mod.rs:858-956, 1939-2027) --------------------------------
#
# TPU-native trade-off: the reference serializes the constants/sigmas
# PolynomialBatch including its full LDE + Merkle digest buffer; here the
# commitment is checkpointed as coefficients + parameters and the device
# tree is REBUILT on load (bit-exact, and the rebuild is a single fused
# device program — cheaper than shipping the digest buffer through the
# host).  Everything else round-trips losslessly.


def write_prover_only_circuit_data(prover_data, common) -> bytes:
    from . import generator_serialization as gser

    spec = common.spec
    w = Writer()
    gen_bytes = gser.write_generators(prover_data.generators, spec)
    w.write_usize(len(gen_bytes))
    w.out += gen_bytes
    watches = prover_data.generator_indices_by_watches
    w.write_usize(len(watches))
    for k in sorted(watches):
        w.write_usize(k)
        w.write_usize_vec(watches[k])

    csc = prover_data.constants_sigmas_commitment
    coeffs = csc.F.to_ints(csc.coeffs)
    num_polys, n = coeffs.shape
    w.write_usize(num_polys)
    w.write_usize(n)
    for row in coeffs:
        w.write_field_vec(row)
    w.write_usize(csc.rate_bits)
    w.write_usize(csc.cap_height)
    w.write_bool(csc.blinding)

    sig = np.asarray(prover_data.sigmas, dtype=np.uint64)
    w.write_usize(sig.shape[0])
    w.write_usize(sig.shape[1])
    for row in sig:
        w.write_field_vec(row)
    w.write_usize(len(prover_data.subgroup))
    w.write_field_vec(prover_data.subgroup)
    gser_w = gser._W(spec)
    gser_w.value(list(prover_data.public_inputs))
    pi_b = gser_w.to_bytes()
    w.write_usize(len(pi_b))
    w.out += pi_b
    rep = np.asarray(prover_data.representative_map, dtype=np.int64)
    w.write_usize(len(rep))
    w.out += rep.tobytes()
    w.write_usize(len(prover_data.circuit_digest))
    w.write_field_vec(prover_data.circuit_digest)
    w.write_usize(len(prover_data.lookup_rows))
    for last_lu, last_lut, first_lut in prover_data.lookup_rows:
        w.write_usize(last_lu)
        w.write_usize(last_lut)
        w.write_usize(first_lut)
    lw = gser._W(spec)
    lw.value([list(map(list, tl)) for tl in prover_data.lut_to_lookups])
    lb = lw.to_bytes()
    w.write_usize(len(lb))
    w.out += lb
    if prover_data.random_wire is None:
        w.write_usize(0)
        w.write_usize(0)
        w.write_bool(False)
    else:
        w.write_usize(prover_data.random_wire[0])
        w.write_usize(prover_data.random_wire[1])
        w.write_bool(True)
    return bytes(w.out)


def read_prover_only_circuit_data(data: bytes, common, F=None, hasher=None):
    from ..field import gl as gl_mod
    from ..fri.oracle import PolynomialBatch
    from ..hash import poseidon_gl
    from . import generator_serialization as gser
    from .circuit_data import ProverOnlyCircuitData

    spec = common.spec
    if F is None:
        F = gl_mod if spec.bits > 32 else __import__(
            "plonky2_goldibear_tpu.field.bb", fromlist=["bb"])
    if hasher is None:
        hasher = poseidon_gl if spec.bits > 32 else __import__(
            "plonky2_goldibear_tpu.hash.poseidon2_bb",
            fromlist=["poseidon2_bb"])
    buf = Buffer(data)
    n = buf.read_usize()
    generators = gser.read_generators(buf.read_exact(n), spec, common.config)
    watches = {}
    for _ in range(buf.read_usize()):
        k = buf.read_usize()
        watches[k] = buf.read_usize_vec()

    num_polys = buf.read_usize()
    deg = buf.read_usize()
    coeffs = np.array([buf.read_field_vec(deg, spec)
                       for _ in range(num_polys)], dtype=np.uint64)
    rate_bits = buf.read_usize()
    cap_height = buf.read_usize()
    blinding = buf.read_bool()
    csc = PolynomialBatch(F, F.from_ints(coeffs), rate_bits, cap_height,
                          hasher=hasher, blinding=blinding)

    r0 = buf.read_usize()
    r1 = buf.read_usize()
    sigmas = np.array([buf.read_field_vec(r1, spec) for _ in range(r0)],
                      dtype=np.uint64)
    subgroup = buf.read_field_vec(buf.read_usize(), spec)
    n = buf.read_usize()
    public_inputs = [tuple(t) for t in gser._R(
        buf.read_exact(n), spec).value()]
    n = buf.read_usize()
    rep = np.frombuffer(buf.read_exact(n * 8), dtype=np.int64).copy()
    circuit_digest = buf.read_field_vec(buf.read_usize(), spec)
    lookup_rows = [(buf.read_usize(), buf.read_usize(), buf.read_usize())
                   for _ in range(buf.read_usize())]
    n = buf.read_usize()
    lut_to_lookups = [[tuple(pair) for pair in tl]
                      for tl in gser._R(buf.read_exact(n), spec).value()]
    row = buf.read_usize()
    col = buf.read_usize()
    has_rw = buf.read_bool()
    assert buf.pos == len(data)
    return ProverOnlyCircuitData(
        generators=generators,
        generator_indices_by_watches=watches,
        constants_sigmas_commitment=csc,
        sigmas=sigmas,
        subgroup=subgroup,
        public_inputs=public_inputs,
        representative_map=rep,
        circuit_digest=circuit_digest,
        random_wire=(row, col) if has_rw else None,
        lookup_rows=lookup_rows,
        lut_to_lookups=lut_to_lookups)
