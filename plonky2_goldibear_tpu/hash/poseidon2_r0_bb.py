"""Poseidon2-risc0-BabyBear: width-24 permutation, host + batched device.

The risc0 parameterization of Poseidon2 (reference
plonky2/src/hash/poseidon2_risc0_babybear.rs:22-230,
gates/poseidon2_risc0_babybear.rs:678-860):

- external linear layer = Horizen-Labs M4 blocks ([[5,7,1,3],[4,6,1,1],
  [1,3,5,7],[1,1,4,6]] via the add-chain in apply_hl_mat4) + the usual
  4-class circulant sums;
- internal (diffusion) layer = sum(state) + M_INT_DIAG_HZN[i] * state[i];
- 2x4 full rounds around 21 partial rounds, x^7 s-box;
- sponge: rate 16, capacity 8, digest = 8 elements; absorption overwrites
  the full rate portion (zero-padding short chunks).

Like poseidon2_bb, every round function is written once over a generic
algebra ``A`` so the verifier (host ext), prover (batched device), witness
generators (host base), and recursive circuit (circuit algebra) share one
implementation.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from ..field import bb
from ..field.host import BABYBEAR
from . import _poseidon2_r0_bb_constants as C

P = BABYBEAR.p
WIDTH = C.SPONGE_WIDTH          # 24
RATE = C.SPONGE_RATE            # 16
CAPACITY = C.SPONGE_CAPACITY    # 8
NUM_HASH_OUT = C.SPONGE_CAPACITY   # digest = 8 elements (HashOut<F, 8>)
F = bb

tree_map = jax.tree_util.tree_map


def apply_hl_mat4_a(A, x: List) -> List:
    """reference gates/poseidon2_risc0_babybear.rs:841-857."""
    t0 = A.add(x[0], x[1])
    t1 = A.add(x[2], x[3])
    t2 = A.add(A.add(x[1], x[1]), t1)
    t3 = A.add(A.add(x[3], x[3]), t0)
    t4 = A.add(A.mul_base_const(t1, 4), t3)
    t5 = A.add(A.mul_base_const(t0, 4), t2)
    t6 = A.add(t3, t5)
    t7 = A.add(t2, t4)
    return [t6, t5, t7, t4]


def external_layer_a(A, state: List) -> List:
    """reference permute_external_mut (:738-767)."""
    out = []
    for i in range(0, WIDTH, 4):
        out.extend(apply_hl_mat4_a(A, state[i:i + 4]))
    sums = []
    for k in range(4):
        acc = out[k]
        for j in range(4, WIDTH, 4):
            acc = A.add(acc, out[j + k])
        sums.append(acc)
    return [A.add(out[i], sums[i % 4]) for i in range(WIDTH)]


def internal_layer_a(A, state: List) -> List:
    """reference permute_internal_mut (:731-737): sum + diag_i * x_i."""
    total = state[0]
    for x in state[1:]:
        total = A.add(total, x)
    return [A.add(total, A.mul_base_const(state[i], C.M_INT_DIAG_HZN[i]))
            for i in range(WIDTH)]


def sbox_a(A, x):
    x2 = A.mul(x, x)
    x3 = A.mul(x2, x)
    return A.mul(x3, A.mul(x2, x2))


def permute_a(A, state: List) -> List:
    assert len(state) == WIDTH
    state = external_layer_a(A, state)
    for r in range(C.HALF_N_FULL_ROUNDS):
        state = [A.add_base_const(x, c)
                 for x, c in zip(state, C.EXTERNAL_CONSTANTS[r])]
        state = [sbox_a(A, x) for x in state]
        state = external_layer_a(A, state)
    for r in range(C.N_PARTIAL_ROUNDS):
        state[0] = A.add_base_const(state[0], C.INTERNAL_CONSTANTS[r])
        state[0] = sbox_a(A, state[0])
        state = internal_layer_a(A, state)
    for r in range(C.HALF_N_FULL_ROUNDS, C.N_FULL_ROUNDS_TOTAL):
        state = [A.add_base_const(x, c)
                 for x, c in zip(state, C.EXTERNAL_CONSTANTS[r])]
        state = [sbox_a(A, x) for x in state]
        state = external_layer_a(A, state)
    return state


# -- host ---------------------------------------------------------------


class _HostA:
    @staticmethod
    def add(a, b):
        return (a + b) % P

    @staticmethod
    def sub(a, b):
        return (a - b) % P

    @staticmethod
    def mul(a, b):
        return a * b % P

    @staticmethod
    def mul_base_const(a, c):
        return a * c % P

    @staticmethod
    def add_base_const(a, c):
        return (a + c) % P


def permute_host(state: Sequence[int]) -> List[int]:
    return permute_a(_HostA, [int(x) % P for x in state])


def hash_n_to_m_no_pad_host(inputs: Sequence[int], num_outputs: int
                            ) -> List[int]:
    state = [0] * WIDTH
    for i in range(0, len(inputs), RATE):
        chunk = [x % P for x in inputs[i:i + RATE]]
        # the R0 sponge zero-fills the rest of the rate portion
        # (reference poseidon2_risc0_babybear.rs:205-212)
        state[:RATE] = chunk + [0] * (RATE - len(chunk))
        state = permute_host(state)
    outputs: List[int] = []
    while True:
        for x in state[:RATE]:
            outputs.append(x)
            if len(outputs) == num_outputs:
                return outputs
        state = permute_host(state)


def hash_no_pad_host(inputs: Sequence[int]) -> List[int]:
    return hash_n_to_m_no_pad_host(inputs, NUM_HASH_OUT)


def hash_or_noop_host(inputs: Sequence[int]) -> List[int]:
    if len(inputs) <= NUM_HASH_OUT:
        return list(inputs) + [0] * (NUM_HASH_OUT - len(inputs))
    return hash_no_pad_host(inputs)


def two_to_one_host(x: Sequence[int], y: Sequence[int]) -> List[int]:
    state = list(x) + list(y) + [0] * CAPACITY
    assert len(state) == WIDTH
    return permute_host(state)[:NUM_HASH_OUT]


# -- device (batched jnp over BabyBear Montgomery arrays) ------------------


class _DevA:
    add = staticmethod(bb.add)
    sub = staticmethod(bb.sub)
    mul = staticmethod(bb.mul)

    @staticmethod
    def mul_base_const(a, c):
        return bb.mul_const(a, c)

    @staticmethod
    def add_base_const(a, c):
        return bb.add(a, bb.full((), c))


_HL_M4_ROWS = [[5, 7, 1, 3], [4, 6, 1, 1], [1, 3, 5, 7], [1, 1, 4, 6]]


def _dev_consts():
    import numpy as np
    return (bb.from_ints(np.array(_HL_M4_ROWS, dtype=np.uint64)),
            bb.from_ints(np.array(C.M_INT_DIAG_HZN, dtype=np.uint64)),
            bb.from_ints(np.array(C.EXTERNAL_CONSTANTS, dtype=np.uint64)),
            bb.from_ints(np.array(C.INTERNAL_CONSTANTS, dtype=np.uint64)))


def _sbox_v(x):
    x2 = bb.mul(x, x)
    return bb.mul(bb.mul(x2, x), bb.mul(x2, x2))


def _external_v(state, m4):
    shape = state.shape
    blocks = state.reshape(shape[:-1] + (WIDTH // 4, 4))
    y = bb.batch_sum(bb.mul(blocks[..., :, None, :], m4), axis=-1)
    sums = bb.batch_sum(y, axis=-2)
    return bb.add(y, sums[..., None, :]).reshape(shape)


def _internal_v(state, diag):
    total = bb.batch_sum(state, axis=-1)
    return bb.add(total[..., None], bb.mul(state, diag))


def permute(state):
    """Batched permutation; state: bb array (..., 24).  Rounds run under
    lax.scan (compact XLA graph — see poseidon2_bb.permute)."""
    m4, diag, ext_c, int_c = _dev_consts()

    def full_step(st, rc):
        return _external_v(_sbox_v(bb.add(st, rc)), m4), None

    def partial_step(st, rc):
        s0 = _sbox_v(bb.add(st[..., 0], rc))
        st = jnp.concatenate([s0[..., None], st[..., 1:]], axis=-1)
        return _internal_v(st, diag), None

    state = _external_v(state, m4)
    state, _ = jax.lax.scan(full_step, state,
                            ext_c[:C.HALF_N_FULL_ROUNDS])
    state, _ = jax.lax.scan(partial_step, state, int_c)
    state, _ = jax.lax.scan(full_step, state,
                            ext_c[C.HALF_N_FULL_ROUNDS:])
    return state


def hash_n_to_m_no_pad(inputs, num_outputs: int):
    L = inputs.shape[-1]
    batch = inputs.shape[:-1]
    state = bb.zeros(batch + (WIDTH,))
    for i in range(0, L, RATE):
        chunk = inputs[..., i:i + RATE]
        k = chunk.shape[-1]
        if k < RATE:
            chunk = jnp.concatenate(
                [chunk, bb.zeros(batch + (RATE - k,))], axis=-1)
        state = jnp.concatenate([chunk, state[..., RATE:]], axis=-1)
        state = permute(state)
    outs = [state[..., :RATE]]
    have = RATE
    while have < num_outputs:
        state = permute(state)
        outs.append(state[..., :RATE])
        have += RATE
    out = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
    return out[..., :num_outputs]


def hash_no_pad(inputs):
    return hash_n_to_m_no_pad(inputs, NUM_HASH_OUT)


def hash_or_noop(inputs):
    L = inputs.shape[-1]
    if L <= NUM_HASH_OUT:
        pad = NUM_HASH_OUT - L
        if pad:
            cfg = [(0, 0)] * (inputs.ndim - 1) + [(0, pad)]
            return jnp.pad(inputs, cfg)
        return inputs
    return hash_no_pad(inputs)


def two_to_one(x, y):
    batch = x.shape[:-1]
    state = jnp.concatenate([x, y, bb.zeros(batch + (CAPACITY,))], axis=-1)
    return permute(state)[..., :NUM_HASH_OUT]
