"""Poseidon width-12 permutation over Goldilocks: host + batched device.

Semantics match the reference permutation exactly (KAT-tested against its
committed vectors): 4 full rounds, 22 partial rounds, 4 full rounds, x^7
sbox, constant schedule ALL_ROUND_CONSTANTS[i + 12*round], MDS
``out[r] = sum_i CIRC[i]*s[(i+r)%12] + DIAG[r]*s[r]``
(reference plonky2/src/hash/poseidon_goldilocks.rs:95-108,301-302,760-925).
We implement the *naive* partial-round schedule, which the reference proves
equivalent to its fast-sparse-matrix path (its `consistency` test :1195).

Device MDS strategy (TPU-first): decompose the state into 4 x 16-bit limb
planes and contract each plane with the 12x12 integer MDS matrix in int32
(max |entry| = 41, 13 terms: plane sums < 2^26 — exact), then carry-propagate
the 5 weighted planes into a <2^75 triple-limb value and run one Goldilocks
reduction per lane.  This replaces 13 full field-muls per row with one small
matmul — and maps directly onto the MXU for large batches.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from ..field import gl
from ..field.gl import GL
from ..field.host import GOLDILOCKS
from . import _poseidon_gl_constants as C

P = GOLDILOCKS.p
WIDTH = C.SPONGE_WIDTH
RATE = C.SPONGE_RATE
NUM_HASH_OUT = GOLDILOCKS.num_hash_out_elts  # 4
F = gl   # field module, for field-generic users (merkle, oracle)

# Dense MDS matrix M[r, j] = CIRC[(j - r) mod 12] + (r == j) * DIAG[r]
_MDS = np.zeros((12, 12), dtype=np.int64)
for _r in range(12):
    for _j in range(12):
        _MDS[_r, _j] = C.MDS_MATRIX_CIRC[(_j - _r) % 12]
    _MDS[_r, _r] += C.MDS_MATRIX_DIAG[_r]
_MDS_I32_T = jnp.asarray(_MDS.T.astype(np.int32))  # (j, r) for x @ M^T


# --------------------------------------------------------------------------
# Host (python ints) — used by the Fiat-Shamir challenger and as test oracle
# --------------------------------------------------------------------------


def _sbox(x: int) -> int:
    x2 = x * x % P
    x3 = x2 * x % P
    x4 = x2 * x2 % P
    return x3 * x4 % P


def _mds_host(state: List[int]) -> List[int]:
    out = []
    for r in range(12):
        acc = 0
        for j in range(12):
            acc += int(_MDS[r, j]) * state[j]
        out.append(acc % P)
    return out


def permute_host(state: Sequence[int]) -> List[int]:
    """The width-12 Poseidon permutation on 12 canonical ints."""
    assert len(state) == WIDTH
    s = [x % P for x in state]
    round_ctr = 0
    for phase in range(3):
        n = C.HALF_N_FULL_ROUNDS if phase != 1 else C.N_PARTIAL_ROUNDS
        full = phase != 1
        for _ in range(n):
            rc = C.ALL_ROUND_CONSTANTS[WIDTH * round_ctr: WIDTH * (round_ctr + 1)]
            s = [(x + c) % P for x, c in zip(s, rc)]
            if full:
                s = [_sbox(x) for x in s]
            else:
                s[0] = _sbox(s[0])
            s = _mds_host(s)
            round_ctr += 1
    return s


def hash_n_to_m_no_pad_host(inputs: Sequence[int], num_outputs: int) -> List[int]:
    """Overwrite-mode sponge (reference hash/hashing.rs:100-124)."""
    state = [0] * WIDTH
    for i in range(0, len(inputs), RATE):
        chunk = inputs[i: i + RATE]
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
    """<=4 elements: zero-padded identity; else sponge hash
    (reference plonk/config.rs:70-84)."""
    if len(inputs) <= NUM_HASH_OUT:
        return list(inputs) + [0] * (NUM_HASH_OUT - len(inputs))
    return hash_no_pad_host(inputs)


def two_to_one_host(x: Sequence[int], y: Sequence[int]) -> List[int]:
    """Merkle compression (reference hash/hashing.rs:76-97)."""
    state = list(x) + list(y) + [0] * (WIDTH - 2 * NUM_HASH_OUT)
    state = permute_host(state)
    return state[:NUM_HASH_OUT]


# --------------------------------------------------------------------------
# Generic algebra rounds — shared by the PoseidonGate constraints (host-ext
# at zeta, device-base over the quotient domain) and its witness generator.
# These implement the reference's *fast* partial-round schedule
# (poseidon_goldilocks.rs:632-812: partial_first_constant_layer,
# mds_partial_layer_init with FAST_PARTIAL_ROUND_INITIAL_MATRIX, and sparse
# per-round mds_partial_layer_fast with W_HATS/VS), which the reference's
# `consistency` test proves equal to the naive schedule.
# --------------------------------------------------------------------------


def constant_layer_a(A, state, round_ctr: int):
    return [A.add_base_const(s, C.ALL_ROUND_CONSTANTS[i + WIDTH * round_ctr])
            for i, s in enumerate(state)]


def sbox_monomial_a(A, x):
    # circuit mode emits exp_u64_extension(x, 7) op-for-op (reference
    # hash/poseidon_goldilocks.rs:849-856); other algebras use the same
    # 4-multiplication chain values
    return A.exp7(x)


def sbox_layer_a(A, state):
    return [sbox_monomial_a(A, s) for s in state]


def mds_row_shf_a(A, r: int, v):
    # zero-accumulator const*x + acc chain (reference
    # mds_row_shf_circuit, hash/poseidon_goldilocks.rs:561-581); value-equal
    # for host/device algebras, op-exact for the circuit algebra
    res = A.zero()
    for i in range(WIDTH):
        res = A.const_mul_add(C.MDS_MATRIX_CIRC[i], v[(i + r) % WIDTH], res)
    return A.const_mul_add(C.MDS_MATRIX_DIAG[r], v[r], res)


def mds_layer_a(A, state):
    # circuit algebra: route through a PoseidonMdsGate when it fits
    # (reference hash/poseidon_goldilocks.rs:597-620 mds_layer_circuit)
    hook = getattr(A, "poseidon_mds_layer", None)
    if hook is not None:
        out = hook(state)
        if out is not None:
            return out
    return [mds_row_shf_a(A, r, state) for r in range(WIDTH)]


def partial_first_constant_layer_a(A, state):
    return [A.add_base_const(s, C.FAST_PARTIAL_FIRST_ROUND_CONSTANT[i])
            for i, s in enumerate(state)]


def mds_partial_layer_init_a(A, state):
    # accumulate from zero with fused const*x + acc (reference
    # mds_partial_layer_init_circuit, hash/poseidon_goldilocks.rs:687-720)
    result = [A.zero()] * WIDTH
    result[0] = state[0]
    for r in range(1, WIDTH):
        for c in range(1, WIDTH):
            result[c] = A.const_mul_add(
                C.FAST_PARTIAL_ROUND_INITIAL_MATRIX[r - 1][c - 1],
                state[r], result[c])
    return result


def mds_partial_layer_fast_a(A, state, r: int):
    # reference mds_partial_layer_fast_circuit
    # (hash/poseidon_goldilocks.rs:772-800)
    mds0to0 = C.MDS_MATRIX_CIRC[0] + C.MDS_MATRIX_DIAG[0]
    d = A.const_mul(mds0to0, state[0])
    for i in range(1, WIDTH):
        d = A.const_mul_add(C.FAST_PARTIAL_ROUND_W_HATS[r][i - 1],
                            state[i], d)
    result = [d]
    for i in range(1, WIDTH):
        result.append(A.const_mul_add(C.FAST_PARTIAL_ROUND_VS[r][i - 1],
                                      state[0], state[i]))
    return result


def permute_fast_a(A, state):
    """Full permutation via the fast partial-round schedule, over any
    algebra.  Equals ``permute_host`` (tested)."""
    round_ctr = 0
    for _ in range(C.HALF_N_FULL_ROUNDS):
        state = constant_layer_a(A, state, round_ctr)
        state = sbox_layer_a(A, state)
        state = mds_layer_a(A, state)
        round_ctr += 1
    state = partial_first_constant_layer_a(A, state)
    state = mds_partial_layer_init_a(A, state)
    for r in range(C.N_PARTIAL_ROUNDS):
        state[0] = sbox_monomial_a(A, state[0])
        if r < C.N_PARTIAL_ROUNDS - 1:
            state[0] = A.add_base_const(state[0],
                                        C.FAST_PARTIAL_ROUND_CONSTANTS[r])
        state = mds_partial_layer_fast_a(A, state, r)
    round_ctr += C.N_PARTIAL_ROUNDS
    for _ in range(C.HALF_N_FULL_ROUNDS):
        state = constant_layer_a(A, state, round_ctr)
        state = sbox_layer_a(A, state)
        state = mds_layer_a(A, state)
        round_ctr += 1
    return state


# --------------------------------------------------------------------------
# Device (batched jnp) — the Merkle/transcript hot path
# --------------------------------------------------------------------------

def _round_const_block(lo_r, hi_r):
    """Stacked round constants rows [lo_r, hi_r) as GL (n_rounds, 12)."""
    rows = np.array(C.ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(30, 12)
    return gl.from_ints(rows[lo_r:hi_r])


_RC_FULL0 = _round_const_block(0, C.HALF_N_FULL_ROUNDS)
_RC_PARTIAL = _round_const_block(C.HALF_N_FULL_ROUNDS,
                                 C.HALF_N_FULL_ROUNDS + C.N_PARTIAL_ROUNDS)
_RC_FULL1 = _round_const_block(C.HALF_N_FULL_ROUNDS + C.N_PARTIAL_ROUNDS, 30)


def _sbox_dev(x: GL) -> GL:
    x2 = gl.sqr(x)
    x3 = gl.mul(x2, x)
    x4 = gl.sqr(x2)
    return gl.mul(x3, x4)


def _mds_dev(state: GL) -> GL:
    """state: GL (..., 12) -> MDS @ state via 16-bit limb-plane matmuls."""
    planes = [
        (state.lo & 0xFFFF).astype(jnp.int32),
        (state.lo >> 16).astype(jnp.int32),
        (state.hi & 0xFFFF).astype(jnp.int32),
        (state.hi >> 16).astype(jnp.int32),
    ]
    acc = [jnp.matmul(p, _MDS_I32_T, preferred_element_type=jnp.int32).astype(jnp.uint32)
           for p in planes]  # each < 2^26
    # value = acc0 + acc1*2^16 + acc2*2^32 + acc3*2^48  (< 2^75)
    a1lo, a1hi = acc[1] << 16, acc[1] >> 16
    a3lo, a3hi = acc[3] << 16, acc[3] >> 16
    n0 = acc[0] + a1lo
    c0 = (n0 < acc[0]).astype(jnp.uint32)
    n1a = acc[2] + a1hi + c0
    n1 = n1a + a3lo
    c1 = (n1 < n1a).astype(jnp.uint32)
    n2 = a3hi + c1
    return gl._reduce128(n0, n1, n2, jnp.zeros_like(n2))


def _full_round(state: GL, rc: GL) -> GL:
    state = gl.add(state, rc)
    state = _sbox_dev(state)
    return _mds_dev(state)


def _partial_round(state: GL, rc: GL) -> GL:
    state = gl.add(state, rc)
    s0 = _sbox_dev(GL(state.lo[..., 0], state.hi[..., 0]))
    state = GL(state.lo.at[..., 0].set(s0.lo),
               state.hi.at[..., 0].set(s0.hi))
    return _mds_dev(state)


def _scan_rounds(state: GL, rcs: GL, body) -> GL:
    """Scan ``body`` over the stacked round-constant rows (n_rounds, 12).

    Using lax.scan keeps the traced graph at one round per phase instead of
    30 unrolled rounds — compile time drops ~30x; runtime is unchanged since
    every iteration is the same large batched kernel.
    """
    import jax

    def step(s, rc):
        return body(s, rc), None

    out, _ = jax.lax.scan(step, state, rcs)
    return out


def _use_pallas(batch: int) -> bool:
    """Dispatch to the fused ops/ kernels on TPU for large batches.

    Shapes are static under jit, so this is a trace-time decision; the jnp
    path remains the semantic reference (and the CPU/test path).
    """
    import jax

    from ..utils.envflags import env_flag

    if env_flag("PLONKY2_TPU_DISABLE_POSEIDON"):
        return False
    return (jax.default_backend() == "tpu" and batch >= 128
            and batch % 128 == 0)


def permute(state: GL) -> GL:
    """Batched Poseidon permutation; state: GL (..., 12)."""
    if state.ndim == 2 and _use_pallas(state.shape[0]):
        from ..ops import poseidon_gl as K

        out = K.permute_cols(GL(state.lo.T, state.hi.T))
        return GL(out.lo.T, out.hi.T)
    state = _scan_rounds(state, _RC_FULL0, _full_round)
    state = _scan_rounds(state, _RC_PARTIAL, _partial_round)
    state = _scan_rounds(state, _RC_FULL1, _full_round)
    return state


def hash_n_to_m_no_pad(inputs: GL, num_outputs: int) -> GL:
    """Batched sponge: inputs GL (..., L) with static L -> (..., num_outputs)."""
    shape = inputs.shape
    L = shape[-1]
    batch = shape[:-1]
    if (inputs.ndim == 2 and num_outputs == NUM_HASH_OUT and L > RATE
            and _use_pallas(shape[0])):
        # fused leaf-sponge kernel: the state stays in VMEM across all
        # ceil(L/8) permutations instead of round-tripping HBM per absorb
        from ..ops import poseidon_gl as K

        out = K.hash_cols_no_pad(GL(inputs.lo.T, inputs.hi.T))
        return GL(out.lo.T, out.hi.T)
    state = gl.zeros(batch + (WIDTH,))
    for i in range(0, L, RATE):
        chunk = inputs[..., i: i + RATE]
        k = chunk.shape[-1]
        state = GL(
            jnp.concatenate([chunk.lo, state.lo[..., k:]], axis=-1),
            jnp.concatenate([chunk.hi, state.hi[..., k:]], axis=-1))
        state = permute(state)
    outs = [state[..., :RATE]]
    have = RATE
    while have < num_outputs:
        state = permute(state)
        outs.append(state[..., :RATE])
        have += RATE
    if len(outs) > 1:
        full_out = GL(jnp.concatenate([o.lo for o in outs], axis=-1),
                      jnp.concatenate([o.hi for o in outs], axis=-1))
    else:
        full_out = outs[0]
    return full_out[..., :num_outputs]


def hash_no_pad(inputs: GL) -> GL:
    return hash_n_to_m_no_pad(inputs, NUM_HASH_OUT)


def hash_or_noop(inputs: GL) -> GL:
    L = inputs.shape[-1]
    if L <= NUM_HASH_OUT:
        pad = NUM_HASH_OUT - L
        if pad:
            cfg = [(0, 0)] * (inputs.ndim - 1) + [(0, pad)]
            return GL(jnp.pad(inputs.lo, cfg), jnp.pad(inputs.hi, cfg))
        return inputs
    return hash_no_pad(inputs)


def two_to_one(x: GL, y: GL) -> GL:
    """Batched Merkle compression: x, y GL (..., 4) -> (..., 4)."""
    batch = x.shape[:-1]
    zero = gl.zeros(batch + (WIDTH - 2 * NUM_HASH_OUT,))
    state = GL(jnp.concatenate([x.lo, y.lo, zero.lo], axis=-1),
               jnp.concatenate([x.hi, y.hi, zero.hi], axis=-1))
    state = permute(state)
    return state[..., :NUM_HASH_OUT]
