"""Poseidon2 width-16 permutation over BabyBear: host + batched device.

Semantics follow the reference's in-repo native evaluation exactly
(plonky2/src/gates/poseidon2_babybear.rs:700-860 — permute_external_mut /
permute_internal_mut / add_rc / x^7 sbox; the reference's CI pins these
equal to its external p3_poseidon2 dependency):

- initial external linear layer, then
- 4 full rounds (add EXTERNAL_CONSTANTS[r], sbox all, external layer),
- 13 partial rounds (state[0] += INTERNAL_CONSTANTS[r], sbox state[0],
  internal layer: scale all by INTERNAL_SCALE, s0 = sum(s[1:]) - s0,
  s[i+1] = full_sum + s[i+1] * 2^shift_i),
- 4 more full rounds with EXTERNAL_CONSTANTS[4..8].

External layer: blockwise 4x4 M4 then add per-congruence-class block sums.
Digest width is 8 (BABYBEAR_NUM_HASH_OUT_ELTS, reference field/src/lib.rs:15).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..field import bb
from ..field.host import BABYBEAR
from . import _poseidon2_bb_constants as C

P = BABYBEAR.p
WIDTH = C.SPONGE_WIDTH
RATE = C.SPONGE_RATE
NUM_HASH_OUT = BABYBEAR.num_hash_out_elts  # 8
F = bb   # module attribute for generic users

tree_map = jax.tree_util.tree_map


# --------------------------------------------------------------------------
# Generic algebra rounds (host ints via HostBaseAlgebra, circuit targets via
# CircuitExtAlgebra, device via bb arrays in the batched path below)
# --------------------------------------------------------------------------


def apply_mat4_a(A, x: List) -> List:
    """reference gates/poseidon2_babybear.rs:903-918."""
    t01 = A.add(x[0], x[1])
    t23 = A.add(x[2], x[3])
    t0123 = A.add(t01, t23)
    t01123 = A.add(t0123, x[1])
    t01233 = A.add(t0123, x[3])
    x3 = A.add(t01233, A.add(x[0], x[0]))
    x1 = A.add(t01123, A.add(x[2], x[2]))
    x0 = A.add(t01123, t01)
    x2 = A.add(t01233, t23)
    return [x0, x1, x2, x3]


def external_layer_a(A, state: List) -> List:
    """reference permute_external_mut (:965-995)."""
    out = []
    for i in range(0, WIDTH, 4):
        out.extend(apply_mat4_a(A, state[i:i + 4]))
    sums = []
    for k in range(4):
        acc = out[k]
        for j in range(4, WIDTH, 4):
            acc = A.add(acc, out[j + k])
        sums.append(acc)
    return [A.add(out[i], sums[i % 4]) for i in range(WIDTH)]


def internal_layer_a(A, state: List) -> List:
    """reference permute_internal_mut (:787-803)."""
    state = [A.mul_base_const(x, C.INTERNAL_SCALE) for x in state]
    part_sum = state[1]
    for x in state[2:]:
        part_sum = A.add(part_sum, x)
    full_sum = A.add(part_sum, state[0])
    out = [A.sub(part_sum, state[0])]
    for i, shift in enumerate(C.INTERNAL_DIAG_SHIFTS):
        out.append(A.add(full_sum,
                         A.mul_base_const(state[i + 1], 1 << shift)))
    return out


def sbox_a(A, x):
    x2 = A.mul(x, x)
    x3 = A.mul(x2, x)
    return A.mul(x3, A.mul(x2, x2))


def permute_a(A, state: List) -> List:
    """Full Poseidon2 permutation over any algebra."""
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


# --------------------------------------------------------------------------
# Host (python ints)
# --------------------------------------------------------------------------


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
    # int() coercion matters: numpy scalars would silently overflow
    return permute_a(_HostA, [int(x) % P for x in state])


def hash_n_to_m_no_pad_host(inputs: Sequence[int], num_outputs: int
                            ) -> List[int]:
    state = [0] * WIDTH
    for i in range(0, len(inputs), RATE):
        chunk = inputs[i:i + RATE]
        state[: len(chunk)] = [x % P for x in chunk]
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
    state = list(x) + list(y)
    assert len(state) == WIDTH
    state = permute_host(state)
    return state[:NUM_HASH_OUT]


# --------------------------------------------------------------------------
# Device (batched jnp over BabyBear Montgomery arrays)
# --------------------------------------------------------------------------


class _DevA:
    """Per-lane device algebra: values are bb column arrays (...,)."""

    add = staticmethod(bb.add)
    sub = staticmethod(bb.sub)
    mul = staticmethod(bb.mul)

    @staticmethod
    def mul_base_const(a, c):
        return bb.mul_const(a, c)

    @staticmethod
    def add_base_const(a, c):
        return bb.add(a, bb.full((), c))


# vectorized round functions over the last axis (..., 16) — scanned over
# rounds so the XLA graph stays one round body deep (unrolling all 21
# rounds makes LLVM compile time pathological on CPU hosts)

_M4_ROWS = [[2, 3, 1, 1], [1, 2, 3, 1], [1, 1, 2, 3], [3, 1, 1, 2]]


def _dev_consts():
    import numpy as np
    return (bb.from_ints(np.array(_M4_ROWS, dtype=np.uint64)),
            bb.from_ints(np.array([1 << s for s in C.INTERNAL_DIAG_SHIFTS],
                                  dtype=np.uint64)),
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


def _internal_v(state, shifts):
    st = bb.mul_const(state, C.INTERNAL_SCALE)
    part = bb.batch_sum(st[..., 1:], axis=-1)
    full = bb.add(part, st[..., 0])
    head = bb.sub(part, st[..., 0])
    tail = bb.add(full[..., None], bb.mul(st[..., 1:], shifts))
    return jnp.concatenate([head[..., None], tail], axis=-1)


def _use_pallas(batch: int) -> bool:
    """Trace-time dispatch to the ops/poseidon2_bb.py fused kernel (TPU,
    batch a nonzero multiple of 128).  PLONKY2_TPU_DISABLE_POSEIDON=1
    forces the jnp path (kill switch shared with the GL kernels so the
    prove bisect modes stay one-kernel-per-mode)."""
    from ..utils.envflags import env_flag

    if env_flag("PLONKY2_TPU_DISABLE_POSEIDON"):
        return False
    return (jax.default_backend() == "tpu" and batch >= 128
            and batch % 128 == 0)


def permute(state):
    """Batched permutation; state: bb array (..., 16), returns same shape.
    Rounds run under lax.scan (compact XLA graph); large batches dispatch
    to the VMEM-resident Pallas kernel (ops/poseidon2_bb.py, bit-exact)."""
    batch_shape = state.shape[:-1]
    batch = int(np.prod(batch_shape)) if batch_shape else 1
    if _use_pallas(batch):
        from ..ops import poseidon2_bb as K

        cols = state.reshape(batch, WIDTH).T          # (16, B)
        out = K.permute_cols(cols)
        return out.T.reshape(batch_shape + (WIDTH,))
    m4, shifts, ext_c, int_c = _dev_consts()

    def full_step(st, rc):
        return _external_v(_sbox_v(bb.add(st, rc)), m4), None

    def partial_step(st, rc):
        s0 = _sbox_v(bb.add(st[..., 0], rc))
        st = jnp.concatenate([s0[..., None], st[..., 1:]], axis=-1)
        return _internal_v(st, shifts), None

    state = _external_v(state, m4)
    state, _ = jax.lax.scan(full_step, state,
                            ext_c[:C.HALF_N_FULL_ROUNDS])
    state, _ = jax.lax.scan(partial_step, state, int_c)
    state, _ = jax.lax.scan(full_step, state,
                            ext_c[C.HALF_N_FULL_ROUNDS:])
    return state


def hash_n_to_m_no_pad(inputs, num_outputs: int):
    shape = inputs.shape
    L = shape[-1]
    batch = shape[:-1]
    state = bb.zeros(batch + (WIDTH,))
    for i in range(0, L, RATE):
        chunk = inputs[..., i:i + RATE]
        k = chunk.shape[-1]
        state = jnp.concatenate([chunk, state[..., k:]], axis=-1)
        state = permute(state)
    outs = [state[..., :RATE]]
    have = RATE
    while have < num_outputs:
        state = permute(state)
        outs.append(state[..., :RATE])
        have += RATE
    return jnp.concatenate(outs, axis=-1)[..., :num_outputs] \
        if len(outs) > 1 else outs[0][..., :num_outputs]


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
    state = jnp.concatenate([x, y], axis=-1)
    state = permute(state)
    return state[..., :NUM_HASH_OUT]
