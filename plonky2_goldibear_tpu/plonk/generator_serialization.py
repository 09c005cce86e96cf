"""Witness-generator (de)serialization — checkpoint/resume of prover data
(reference plonky2/src/util/serialization/generator_serialization.rs:23-106,
``impl_generator_serializer!`` + ``DefaultGeneratorSerializer``).

The reference serializes each generator through a tag registry.  Here the
registry maps a stable name tag to the generator class, and the per-class
payload is a structural encoding of the instance state (generators are
plain-int/tuple/dataclass state by construction — the dataflow scheduler
only needs ``dependencies``/``run_once``).  The format is this framework's
own (the reference's ProverOnlyCircuitData format is likewise
implementation-defined), versioned by the registry order.

Extensibility mirrors the reference: user generators register with
``register_generator`` before writing/reading (the square_root example
does exactly what examples/square_root.rs:78-104 demonstrates).
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Dict, List, Type

from ..field import host

# -- structural value encoding ----------------------------------------------

_T_NONE, _T_FALSE, _T_TRUE, _T_INT, _T_BIGINT, _T_STR, _T_BYTES = range(7)
_T_TUPLE, _T_LIST, _T_DICT, _T_SPEC, _T_DATACLASS, _T_GATE, _T_GEN = \
    range(7, 14)


class _W:
    def __init__(self, spec=host.GOLDILOCKS):
        self.spec = spec
        self.parts: List[bytes] = []

    def u8(self, v):
        self.parts.append(bytes([v]))

    def u64(self, v):
        self.parts.append(struct.pack("<Q", v))

    def raw(self, b: bytes):
        self.u64(len(b))
        self.parts.append(b)

    def value(self, v):
        if v is None:
            self.u8(_T_NONE)
        elif v is True:
            self.u8(_T_TRUE)
        elif v is False:
            self.u8(_T_FALSE)
        elif isinstance(v, int):
            if 0 <= v < (1 << 64):
                self.u8(_T_INT)
                self.u64(v)
            else:
                self.u8(_T_BIGINT)
                b = v.to_bytes((v.bit_length() + 15) // 8, "little",
                               signed=True)
                self.raw(b)
        elif isinstance(v, str):
            self.u8(_T_STR)
            self.raw(v.encode())
        elif isinstance(v, bytes):
            self.u8(_T_BYTES)
            self.raw(v)
        elif isinstance(v, tuple):
            self.u8(_T_TUPLE)
            self.u64(len(v))
            for x in v:
                self.value(x)
        elif isinstance(v, list):
            self.u8(_T_LIST)
            self.u64(len(v))
            for x in v:
                self.value(x)
        elif isinstance(v, dict):
            self.u8(_T_DICT)
            self.u64(len(v))
            for k, x in v.items():
                self.value(k)
                self.value(x)
        elif isinstance(v, host.FieldSpec):
            self.u8(_T_SPEC)
            self.raw(v.name.encode())
        elif dataclasses.is_dataclass(v):
            self.u8(_T_DATACLASS)
            self.raw(type(v).__name__.encode())
            fields = dataclasses.fields(v)
            self.u64(len(fields))
            for f in fields:
                self.value(getattr(v, f.name))
        elif hasattr(v, "id") and callable(getattr(v, "id", None)) \
                and hasattr(v, "eval_unfiltered"):
            # a gate object captured by its generator: reference-format tag
            from . import serialization as ser

            self.u8(_T_GATE)
            w = ser.Writer()
            ser._write_gate(w, v, self.spec)
            self.raw(bytes(w.out))
        else:
            raise TypeError(f"unserializable generator state: {type(v)}")

    def to_bytes(self):
        return b"".join(self.parts)


class _R:
    def __init__(self, data: bytes, spec, config=None):
        self.data = data
        self.pos = 0
        self.spec = spec
        self.config = config

    def u8(self):
        v = self.data[self.pos]
        self.pos += 1
        return v

    def u64(self):
        v = struct.unpack_from("<Q", self.data, self.pos)[0]
        self.pos += 8
        return v

    def raw(self):
        n = self.u64()
        b = self.data[self.pos:self.pos + n]
        self.pos += n
        return b

    def value(self):
        t = self.u8()
        if t == _T_NONE:
            return None
        if t == _T_TRUE:
            return True
        if t == _T_FALSE:
            return False
        if t == _T_INT:
            return self.u64()
        if t == _T_BIGINT:
            return int.from_bytes(self.raw(), "little", signed=True)
        if t == _T_STR:
            return self.raw().decode()
        if t == _T_BYTES:
            return self.raw()
        if t == _T_TUPLE:
            return tuple(self.value() for _ in range(self.u64()))
        if t == _T_LIST:
            return [self.value() for _ in range(self.u64())]
        if t == _T_DICT:
            return {self.value(): self.value() for _ in range(self.u64())}
        if t == _T_SPEC:
            name = self.raw().decode()
            return (host.GOLDILOCKS if name == "goldilocks"
                    else host.BABYBEAR)
        if t == _T_DATACLASS:
            name = self.raw().decode()
            cls = _dataclass_registry()[name]
            n = self.u64()
            fields = dataclasses.fields(cls)
            assert len(fields) == n, (name, n)
            obj = cls.__new__(cls)
            for f in fields:
                object.__setattr__(obj, f.name, self.value())
            return obj
        if t == _T_GATE:
            from . import serialization as ser

            buf = ser.Buffer(self.raw())
            return ser._read_gate(buf, self.spec, self.config)
        raise ValueError(f"bad value tag {t}")


def _dataclass_registry() -> Dict[str, type]:
    from ..fri import recursive_verifier as fric
    from ..recursion import recursive_verifier as rv
    from . import proof as proof_mod

    classes = {}
    for mod in (proof_mod, rv, fric):
        for name in dir(mod):
            obj = getattr(mod, name)
            if isinstance(obj, type) and dataclasses.is_dataclass(obj):
                classes[obj.__name__] = obj
    return classes


# -- generator registry ------------------------------------------------------


def _default_registry() -> Dict[str, Type]:
    """All built-in generator classes, by stable name tag (the analog of
    DefaultGeneratorSerializer's macro list)."""
    from ..gates import (access_gates, basic_gates, coset_interpolation,
                         extension_gates, lookup_gates, misc_gates,
                         poseidon, poseidon2_bb_gate, poseidon2_r0_bb_gate,
                         poseidon_mds, reducing)
    from ..iop import generator as gen
    from ..plonk import builder as builder_mod
    from ..plonk import gadgets as gadgets_mod
    from ..recursion import conditional

    classes = [
        gen.ConstantGenerator, gen.CopyGenerator, gen.RandomValueGenerator,
        gen.RandomRowGenerator,
        basic_gates._ArithmeticOpGenerator,
        extension_gates._ArithmeticExtOpGenerator,
        extension_gates._MulExtOpGenerator,
        access_gates._RandomAccessGenerator,
        access_gates._BaseSplitGenerator,
        access_gates._ExponentiationGenerator,
        coset_interpolation._InterpolationGenerator,
        lookup_gates._LookupGenerator,
        lookup_gates._LookupTableGenerator,
        misc_gates._AddManyGenerator,
        misc_gates._ApplyMat4Generator,
        misc_gates._InternalPermGenerator,
        poseidon.PoseidonGenerator,
        poseidon_mds._MdsGenerator,
        poseidon2_bb_gate._Poseidon2Generator,
        poseidon2_r0_bb_gate._Poseidon2R0Generator,
        reducing._ReducingGenerator,
        gadgets_mod._WireSplitGenerator,
        builder_mod._ExtInverseGenerator,
        conditional._DummyProofGenerator,
    ]
    return {c.__name__: c for c in classes}


_USER_GENERATORS: Dict[str, Type] = {}


def register_generator(cls: Type):
    """Register a user generator class for serde (the analog of adding a
    variant to a custom WitnessGeneratorSerializer,
    examples/square_root.rs:78-104)."""
    _USER_GENERATORS[cls.__name__] = cls
    return cls


def _registry() -> Dict[str, Type]:
    reg = _default_registry()
    reg.update(_USER_GENERATORS)
    return reg


def write_generators(generators: List, spec=host.GOLDILOCKS) -> bytes:
    w = _W(spec)
    w.u64(len(generators))
    for g in generators:
        w.raw(type(g).__name__.encode())
        w.value(dict(g.__dict__))
    return w.to_bytes()


def read_generators(data: bytes, spec=host.GOLDILOCKS,
                    config=None) -> List:
    reg = _registry()
    r = _R(data, spec, config)
    n = r.u64()
    out = []
    for _ in range(n):
        name = r.raw().decode()
        cls = reg[name]
        state = r.value()
        obj = cls.__new__(cls)
        obj.__dict__.update(state)
        out.append(obj)
    return out
