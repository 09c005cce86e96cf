"""Circuit gadgets used by the recursive verifier
(reference plonky2/src/gadgets/{split_join.rs, split_base.rs,
range_check.rs, random_access.rs, interpolation.rs, select.rs},
util/reducing.rs ReducingFactorTarget, hash/merkle_proofs.rs:97-157).

All functions take the CircuitBuilder as first argument.  ExtensionTargets
are tuples of D targets; "bits" are plain targets constrained boolean by
their producing gates.
"""

from __future__ import annotations

from typing import List, Sequence

from ..field import host
from ..gates.access_gates import BaseSumGate, RandomAccessGate
from ..gates.coset_interpolation import CosetInterpolationGate
from ..gates.reducing import ReducingExtensionGate, ReducingGate
from ..iop import generator as gen
from ..iop import target as tgt


# -- select / boolean --------------------------------------------------------


def select(b, bit, x, y):
    """bit ? x : y  ==  bit*(x - y) + y (reference gadgets/select.rs)."""
    return b.arithmetic(1, 1, bit, b.sub(x, y), y)


def select_ext(b, bit, x, y):
    return tuple(select(b, bit, xc, yc) for xc, yc in zip(x, y))


def assert_bool(b, t):
    # t * t - t == 0
    sq = b.mul(t, t)
    b.connect(sq, t)


# -- exponentiation ----------------------------------------------------------


def num_base_arithmetic_ops_per_gate(b) -> int:
    from ..gates.basic_gates import ArithmeticGate
    return ArithmeticGate.from_config(b.config).num_ops


def exp_from_bits(b, base: tgt.Target, bits: Sequence) -> tgt.Target:
    """base^(sum 2^i bit_i) via one ExponentiationGate (reference
    gadgets/arithmetic.rs:275-296); bits little-endian, zero-padded to the
    gate's power-bit count."""
    from ..gates.access_gates import ExponentiationGate

    gate = ExponentiationGate.from_config(b.config)
    bits = list(bits)
    zero = b.zero()
    while len(bits) < gate.num_power_bits:
        bits.append(zero)
    row = b.add_gate(gate, [])
    b.connect(base, tgt.wire(row, gate.wire_base()))
    for i, bit in enumerate(bits):
        b.connect(bit, tgt.wire(row, gate.wire_power_bit(i)))
    return tgt.wire(row, gate.wire_output())


def exp_from_bits_const_base(b, base: int, bits_le: Sequence) -> tgt.Target:
    """base^(sum 2^i bit_i) for a constant base; bits little-endian
    (reference gadgets/arithmetic.rs:307-335: per-bit
    product = (base^(2^i) - 1) * product * bit + product; falls back to one
    ExponentiationGate when the bit count exceeds a gate's arithmetic
    ops)."""
    p = b.spec.p
    bits = list(bits_le)
    # the reference registers the base constant BEFORE choosing a path
    # (arithmetic.rs:313), even though the arithmetic path never routes it —
    # constant registration order is digest-relevant
    base_t = b.constant(base % p)
    if len(bits) > num_base_arithmetic_ops_per_gate(b):
        return exp_from_bits(b, base_t, bits)
    product = b.one()
    for i, bit in enumerate(bits):
        product = b.arithmetic((pow(base, 1 << i, p) - 1) % p, 1,
                               product, bit, product)
    return product


def exp_power_of_2(b, x, k: int):
    """reference gadgets/arithmetic.rs:262-272: ExponentiateGate when the
    square chain would not fit in one arithmetic gate."""
    if k > num_base_arithmetic_ops_per_gate(b):
        return exp_u64(b, x, 1 << k)
    for _ in range(k):
        x = b.square(x)
    return x


def exp_u64(b, base: tgt.Target, exponent: int) -> tgt.Target:
    """reference gadgets/arithmetic.rs:340-350: constant-bool exponent bits
    into one ExponentiationGate."""
    bits = []
    e = exponent
    while e:
        bits.append(b.constant(e & 1))
        e >>= 1
    return exp_from_bits(b, base, bits)


def exp_power_of_2_extension(b, x, k: int):
    for _ in range(k):
        x = b.square_extension(x)
    return x


# -- bit decomposition -------------------------------------------------------


class _WireSplitGenerator(gen.SimpleGenerator):
    """Splits an integer across BaseSumGate sum wires
    (reference gadgets/split_join.rs:57-100)."""

    def __init__(self, integer, rows, num_limbs, p):
        self.integer = integer
        self.rows = rows
        self.num_limbs = num_limbs
        self.p = p

    def dependencies(self):
        return [self.integer]

    def run_once(self, witness, out):
        v = witness.get_target(self.integer)
        for row in self.rows:
            out.append((tgt.wire(row, BaseSumGate.WIRE_SUM),
                        v & ((1 << self.num_limbs) - 1)))
            v >>= self.num_limbs
        assert v == 0, "integer too large for bit split"


def split_le(b, integer, num_bits: int) -> List[tgt.Target]:
    """Little-endian bits of integer (reference split_join.rs:27-62).
    The sum-reconstruction is mod p, so 64-bit splits admit the
    non-canonical encoding x+p (see fri recursive verifier notes)."""
    if num_bits == 0:
        return []
    gate = BaseSumGate.from_config(b.config, b.spec, 2)
    k = -(-num_bits // gate.num_limbs)
    rows = [b.add_gate(gate, []) for _ in range(k)]
    bits = []
    for row in rows:
        for limb in gate.limbs():
            bits.append(tgt.wire(row, limb))
    for extra in bits[num_bits:]:
        b.assert_zero(extra)
    bits = bits[:num_bits]

    base = pow(2, gate.num_limbs, b.spec.p)
    acc = b.zero()
    for row in reversed(rows):
        # mul_const_add routes the base as a constant target
        # (reference split_join.rs:48-55)
        acc = b.mul_const_add(base, acc, tgt.wire(row, BaseSumGate.WIRE_SUM))
    b.connect(acc, integer)
    b.add_simple_generator(_WireSplitGenerator(integer, rows,
                                               gate.num_limbs, b.spec.p))
    return bits


def low_bits(b, x, num_low_bits: int, noncanonical_ok: bool,
             num_bits: int) -> List[tgt.Target]:
    """reference gadgets/range_check.rs:28-50 (canonicity check only needed
    when the ambiguity probability is non-negligible)."""
    assert noncanonical_ok, "canonicity check not implemented (not needed " \
        "for GL/BB default FRI configs)"
    bits = split_le(b, x, num_bits)
    return bits[:num_low_bits]


def le_sum(b, bits: Sequence) -> tgt.Target:
    """sum 2^i b_i (reference gadgets/split_base.rs le_sum): arithmetic path
    when the chain fits one gate (mul_add with a routed constant two),
    else a single BaseSumGate row."""
    bits = list(bits)
    if not bits:
        return b.zero()
    if len(bits) - 1 <= num_base_arithmetic_ops_per_gate(b):
        two = b.two()
        acc = bits[-1]
        for bit in reversed(bits[:-1]):
            acc = b.mul_add(two, acc, bit)
        return acc
    gate = BaseSumGate.from_config(b.config, b.spec, 2)
    row = b.add_gate(gate, [])
    limbs = list(gate.limbs())
    for bit, w in zip(bits, limbs):
        b.connect(bit, tgt.wire(row, w))
    for w in limbs[len(bits):]:
        b.assert_zero(tgt.wire(row, w))
    b.add_simple_generator(_BaseSumGenerator(row, bits))
    return tgt.wire(row, BaseSumGate.WIRE_SUM)


class _BaseSumGenerator(gen.SimpleGenerator):
    """Fills the BaseSumGate sum wire from its limb bits (reference
    gates/base_sum.rs BaseSumGenerator, used by the le_sum gadget)."""

    def __init__(self, row, bits):
        self.row = row
        self.bits = list(bits)

    def dependencies(self):
        return list(self.bits)

    def run_once(self, witness, out):
        v = 0
        for i, t in enumerate(self.bits):
            v |= int(witness.get_target(t)) << i
        out.append((tgt.wire(self.row, BaseSumGate.WIRE_SUM), v))


def range_check(b, x, n_bits: int):
    """Assert 0 <= x < 2^n_bits."""
    split_le(b, x, n_bits)


def assert_leading_zeros(b, x, n: int):
    """Assert the canonical value of x has >= n leading zeros in 64 bits
    (reference gadgets/range_check.rs assert_leading_zeros)."""
    range_check(b, x, 64 - n)


# -- random access -----------------------------------------------------------


def random_access(b, access_index, v: List[tgt.Target]) -> tgt.Target:
    """v[access_index] via RandomAccessGate (reference
    gadgets/random_access.rs)."""
    n = len(v)
    assert n & (n - 1) == 0, "list length must be a power of two"
    if n == 1:
        return v[0]
    bits = host.log2_strict(n)
    claimed = b.add_virtual_target()
    gate = RandomAccessGate.from_config(b.config, bits)
    row, copy = b.find_slot(gate, [], [])
    # connect order (items, then index, then claimed) mirrors the reference
    # (random_access.rs:30-40) — routing order shapes the copy-permutation
    # forest, hence the sigma polynomials and circuit digest
    for i, val in enumerate(v):
        b.connect(val, tgt.wire(row, gate.wire_list_item(i, copy)))
    b.connect(access_index, tgt.wire(row, gate.wire_access_index(copy)))
    b.connect(claimed, tgt.wire(row, gate.wire_claimed_element(copy)))
    return claimed


def random_access_extension(b, access_index, v: List) -> tuple:
    return tuple(random_access(b, access_index, [e[d] for e in v])
                 for d in range(b.D))


def random_access_hash(b, access_index, hashes: List[List[tgt.Target]]):
    n = b.spec.num_hash_out_elts
    return [random_access(b, access_index, [h[i] for h in hashes])
            for i in range(n)]


# -- coset interpolation -----------------------------------------------------


def interpolate_coset(b, gate: CosetInterpolationGate, shift,
                      values: List, evaluation_point) -> tuple:
    """Evaluate the interpolant of `values` on the coset shift*<g> at
    `evaluation_point` (reference gadgets/interpolation.rs)."""
    row = b.add_gate(gate, [])
    b.connect(shift, tgt.wire(row, gate.wire_shift()))
    for i, v in enumerate(values):
        for t, w in zip(v, gate.wires_value(i)):
            b.connect(t, tgt.wire(row, w))
    for t, w in zip(evaluation_point, gate.wires_evaluation_point()):
        b.connect(t, tgt.wire(row, w))
    return tuple(tgt.wire(row, w) for w in gate.wires_evaluation_value())


# -- reducing factor ---------------------------------------------------------


class ReducingFactorTarget:
    """Horner reduction helper mirroring reference util/reducing.rs:125-260."""

    def __init__(self, base_ext):
        self.base = base_ext
        self.count = 0

    def reduce_base(self, terms: List[tgt.Target], b) -> tuple:
        from ..gates.extension_gates import ArithmeticExtensionGate
        l = len(terms)
        cap = ArithmeticExtensionGate.from_config(b.config, b.D).num_ops + 1
        if l <= cap:
            terms_ext = [b.convert_to_ext(t) for t in terms]
            return self._reduce_arithmetic(terms_ext, b)
        max_len = ReducingGate.max_coeffs_len(b.config.num_wires,
                                              b.config.num_routed_wires, b.D)
        self.count += l
        zero = b.zero()
        acc = b.zero_extension()
        rev = list(terms)
        while len(rev) % max_len:
            rev.append(zero)
        rev.reverse()
        for i in range(0, len(rev), max_len):
            chunk = rev[i:i + max_len]
            gate = ReducingGate(max_len, b.D)
            row = b.add_gate(gate, [])
            b.connect_extension(self.base, tuple(
                tgt.wire(row, w) for w in gate.wires_alpha()))
            b.connect_extension(acc, tuple(
                tgt.wire(row, w) for w in gate.wires_old_acc()))
            for t, c in zip(chunk, gate.wires_coeffs()):
                b.connect(t, tgt.wire(row, c))
            acc = tuple(tgt.wire(row, w) for w in gate.wires_output())
        return acc

    def reduce(self, terms: List[tuple], b) -> tuple:
        from ..gates.extension_gates import ArithmeticExtensionGate
        l = len(terms)
        cap = ArithmeticExtensionGate.from_config(b.config, b.D).num_ops + 1
        if l <= cap:
            return self._reduce_arithmetic(terms, b)
        max_len = ReducingExtensionGate.max_coeffs_len(
            b.config.num_wires, b.config.num_routed_wires, b.D)
        self.count += l
        zero_ext = b.zero_extension()
        acc = b.zero_extension()
        rev = list(terms)
        while len(rev) % max_len:
            rev.append(zero_ext)
        rev.reverse()
        for i in range(0, len(rev), max_len):
            chunk = rev[i:i + max_len]
            gate = ReducingExtensionGate(max_len, b.D)
            row = b.add_gate(gate, [])
            b.connect_extension(self.base, tuple(
                tgt.wire(row, w) for w in gate.wires_alpha()))
            b.connect_extension(acc, tuple(
                tgt.wire(row, w) for w in gate.wires_old_acc()))
            for j, t in enumerate(chunk):
                b.connect_extension(t, tuple(
                    tgt.wire(row, w) for w in gate.wires_coeff(j)))
            acc = tuple(tgt.wire(row, w) for w in gate.wires_output())
        return acc

    def _reduce_arithmetic(self, terms: List[tuple], b) -> tuple:
        self.count += len(terms)
        acc = b.zero_extension()
        for t in reversed(terms):
            acc = b.mul_add_extension(self.base, acc, t)
        return acc

    def shift(self, x, b) -> tuple:
        """x * base^count, then reset (reference reducing.rs:262-280: the
        zeroed-out case skips the exponentiation entirely)."""
        if x == b.zero_extension():
            exp = b.zero_extension()
        else:
            exp = b.exp_u64_extension(self.base, self.count)
        self.count = 0
        return b.mul_extension(exp, x)


# -- in-circuit Merkle verification ------------------------------------------


def verify_merkle_proof_to_cap_with_cap_index(b, leaf_data: List[tgt.Target],
                                              leaf_index_bits: Sequence,
                                              cap_index, cap: List,
                                              siblings: List):
    """reference hash/merkle_proofs.rs:116-157; cap is a list of digests
    (each a list of NUM_HASH_OUT targets), siblings likewise."""
    n = b.spec.num_hash_out_elts
    width = b.hasher.WIDTH
    zero = b.zero()
    state = b.hash_or_noop(leaf_data)
    for bit, sibling in zip(leaf_index_bits, siblings):
        inputs = list(state) + list(sibling)
        inputs += [zero] * (width - len(inputs))
        out = b.permute_swapped(inputs, bit)
        state = out[:n]
    for i in range(n):
        result = random_access(b, cap_index, [h[i] for h in cap])
        b.connect(result, state[i])
