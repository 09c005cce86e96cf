"""Fiat-Shamir challenger: duplex sponge in overwrite mode (host-side).

Byte/element-exact port of the reference semantics
(plonky2/src/iop/challenger.rs:18-160):

- ``observe_element`` clears any buffered outputs, pushes to the input
  buffer, and duplexes when the buffer reaches RATE.
- ``get_challenge`` duplexes if inputs are pending or outputs are exhausted,
  then **pops from the END** of the squeezed RATE-element buffer (so the
  first challenge after a duplex is state[RATE-1]).
- ``duplexing`` overwrites state[0..len(inputs)] with the buffered inputs,
  permutes, and refills the output buffer with state[0..RATE].
- ``compact`` flushes pending inputs and exposes the raw sponge state (used
  by the FRI proof-of-work grinder, reference fri/prover.rs:136-188).

The challenger is tiny and inherently sequential, so it runs on host between
the device prover phases (same phase split as the reference).  The in-circuit
twin is ``recursion/recursive_challenger.py``.
"""

from __future__ import annotations

from typing import List, Sequence

from ..field import host
from . import poseidon_gl


class Challenger:
    def __init__(self, permute=None, width: int = None, rate: int = None,
                 spec: host.FieldSpec = host.GOLDILOCKS):
        self.permute = permute or poseidon_gl.permute_host
        self.width = width or poseidon_gl.WIDTH
        self.rate = rate or poseidon_gl.RATE
        self.spec = spec
        self.sponge_state: List[int] = [0] * self.width
        self.input_buffer: List[int] = []
        self.output_buffer: List[int] = []

    def observe_element(self, element: int):
        assert 0 <= element < self.spec.p
        self.output_buffer.clear()
        self.input_buffer.append(element)
        if len(self.input_buffer) == self.rate:
            self._duplexing()

    def observe_elements(self, elements: Sequence[int]):
        for e in elements:
            self.observe_element(e)

    def observe_extension_element(self, element: Sequence[int]):
        self.observe_elements(list(element))

    def observe_extension_elements(self, elements: Sequence[Sequence[int]]):
        for e in elements:
            self.observe_extension_element(e)

    def observe_hash(self, hash_elements):
        if isinstance(hash_elements, (bytes, bytearray)):
            # BytesHash digests observe as 7-byte (GL) / 3-byte (BB) LE
            # chunks (reference hash_types.rs:259-286 GenericHashOut::to_vec)
            chunk = 7 if self.spec.bits > 32 else 3
            self.observe_elements(
                [int.from_bytes(hash_elements[i:i + chunk], "little")
                 for i in range(0, len(hash_elements), chunk)])
        else:
            self.observe_elements(list(hash_elements))

    def observe_cap(self, cap: Sequence):
        for h in cap:
            self.observe_hash(h)

    def get_challenge(self) -> int:
        if self.input_buffer or not self.output_buffer:
            self._duplexing()
        return self.output_buffer.pop()

    def get_n_challenges(self, n: int) -> List[int]:
        return [self.get_challenge() for _ in range(n)]

    def get_hash(self, num_elts: int) -> List[int]:
        return self.get_n_challenges(num_elts)

    def get_extension_challenge(self) -> tuple:
        return tuple(self.get_n_challenges(self.spec.ext_degree))

    def get_n_extension_challenges(self, n: int) -> List[tuple]:
        return [self.get_extension_challenge() for _ in range(n)]

    def _duplexing(self):
        assert len(self.input_buffer) <= self.rate
        for i, x in enumerate(self.input_buffer):
            self.sponge_state[i] = x
        self.input_buffer.clear()
        self.sponge_state = self.permute(self.sponge_state)
        self.output_buffer = list(self.sponge_state[: self.rate])

    def compact(self) -> List[int]:
        """Flush inputs, clear outputs, return raw sponge state."""
        if self.input_buffer:
            self._duplexing()
        self.output_buffer.clear()
        return list(self.sponge_state)
