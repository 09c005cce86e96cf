"""Device-resident Fiat-Shamir transcript.

Element-exact twin of the host :class:`hash.challenger.Challenger`
(reference plonky2/src/iop/challenger.rs:18-160) whose sponge state lives in
device arrays.  Every absorb/squeeze boundary compiles to ONE jitted program
dispatched asynchronously, so the prover's phase chain never blocks on a
host fetch: behind the TPU tunnel a blocking fetch costs a ~28 ms round
trip and the host-side transcript forced ~12 of them per proof (the r4
"compute opening proofs" phase was mostly tunnel latency).

Buffering semantics are tracked STATICALLY on the host (how many elements
are pending, how many outputs remain) while the VALUES stay on device:
``observe_*`` only appends device arrays to a pending list; the next
challenge request replays the exact eager duplex schedule — overwrite
state[0..RATE] and permute at each full buffer, squeeze from the END of the
output buffer — inside one compiled program.  A transcript driven with the
same observation/squeeze sequence produces bit-identical challenges to the
host challenger (tests/test_device_challenger.py).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import numpy as np

from ..field import fft as fftm

tree_map = jax.tree_util.tree_map

# compiled absorb/squeeze programs keyed by
# (hasher, pending lengths, n_out, n_challenges)
_FLUSH_JITS = {}


def _flush_program(F, hasher, pending_lens: Tuple[int, ...], n_out: int,
                   n: int):
    """Build the jitted duplex replay for a static transcript step."""
    R, W = hasher.RATE, hasher.WIDTH

    def run(state, out_buf, *pending):
        # state (W,), out_buf (R,), pending: 1-D arrays
        stream = fftm.tconcat(pending, axis=0) if pending else None
        total = sum(pending_lens)
        outs = []
        # absorb: fill the input buffer; duplex at each full RATE chunk
        pos = 0
        n_full = total // R
        for k in range(n_full):
            chunk = tree_map(lambda a: a[pos:pos + R], stream)
            state = fftm.tconcat(
                [chunk, tree_map(lambda a: a[R:], state)], axis=0)
            state = _permute1(F, hasher, state)
            pos += R
        leftover = total - pos                      # < R
        # host semantics: observe clears the output buffer, but a duplex
        # triggered by the FINAL observed element refills it (challenger.rs
        # observe_element -> duplexing sets output_buffer = state[..RATE])
        if total and leftover == 0 and n_full > 0:
            out_buf = tree_map(lambda a: a[:R], state)
            cur_out = R
        else:
            cur_out = 0 if total else n_out
        for _ in range(n):
            if leftover or cur_out == 0:
                if leftover:
                    chunk = tree_map(lambda a: a[pos:], stream)
                    state = fftm.tconcat(
                        [chunk, tree_map(lambda a: a[leftover:], state)],
                        axis=0)
                    leftover = 0
                state = _permute1(F, hasher, state)
                out_buf = tree_map(lambda a: a[:R], state)
                cur_out = R
            outs.append(tree_map(lambda a: a[cur_out - 1], out_buf))
            cur_out -= 1
        if n == 0 and leftover:
            # pure absorb with a partial chunk: keep it buffered on host
            # side — return the leftover stream values
            rest = tree_map(lambda a: a[pos:], stream)
            return state, out_buf, rest
        challenges = (tree_map(lambda *xs: _stack(xs), *outs) if outs
                      else None)
        return state, out_buf, challenges

    return jax.jit(run)


def _stack(xs):
    import jax.numpy as jnp

    return jnp.stack(xs, axis=0)


def _permute1(F, hasher, state):
    """Permute a single (W,) sponge state via the batched kernel."""
    st = tree_map(lambda a: a[None, :], state)
    out = hasher.permute(st)
    return tree_map(lambda a: a[0], out)


class DeviceChallenger:
    def __init__(self, F, hasher):
        self.F = F
        self.hasher = hasher
        self.R = hasher.RATE
        self.W = hasher.WIDTH
        self.state = F.zeros((self.W,))
        self.out_buf = F.zeros((self.R,))
        self.n_out = 0                    # static count of usable outputs
        self.pending: List = []           # device 1-D arrays awaiting absorb
        self.pending_lens: List[int] = []

    # -- observations (no dispatch) ------------------------------------------

    def observe_array(self, arr, length: int):
        """Absorb a flat device array of ``length`` field elements."""
        if length == 0:
            return
        self.pending.append(arr)
        self.pending_lens.append(length)

    def observe_cap(self, cap, cap_size: int, digest_width: int):
        self.observe_array(tree_map(lambda a: a.reshape(-1), cap),
                           cap_size * digest_width)

    def observe_host_ints(self, values: List[int]):
        arr = self.F.from_ints(np.fromiter((int(v) for v in values),
                                           dtype=np.uint64,
                                           count=len(values)))
        self.observe_array(arr, len(values))

    def observe_ext_flat(self, comps, n_elts: int, D: int):
        """Absorb n_elts extension elements given as D component arrays of
        shape (n_elts,), in (element-major, component-minor) order."""
        inter = tree_map(lambda *xs: _stack(xs), *comps)   # (D, n)
        flat = tree_map(lambda a: a.T.reshape(-1), inter)
        self.observe_array(flat, n_elts * D)

    # -- challenges (one async dispatch) --------------------------------------

    def get_n_challenges(self, n: int):
        """Returns a device (n,) field array of challenges."""
        key = (self.hasher, tuple(self.pending_lens), self.n_out, n)
        fn = _FLUSH_JITS.get(key)
        if fn is None:
            fn = _flush_program(self.F, self.hasher,
                                tuple(self.pending_lens), self.n_out, n)
            _FLUSH_JITS[key] = fn
        state, out_buf, challenges = fn(self.state, self.out_buf,
                                        *self.pending)
        total = sum(self.pending_lens)
        self.pending = []
        self.pending_lens = []
        self.state = state
        self.out_buf = out_buf
        if n > 0:
            # replicate host bookkeeping: each duplex refills to R, each
            # challenge pops one; compute the remaining count statically
            self.n_out = _remaining_outputs(total, self.n_out, n, self.R)
        return challenges

    def get_challenge_scalar(self):
        arr = self.get_n_challenges(1)
        return tree_map(lambda a: a[0], arr)

    def get_extension_challenge(self, D: int):
        arr = self.get_n_challenges(D)
        return tuple(tree_map(lambda a, d=d: a[d], arr) for d in range(D))

    # -- raw state access (PoW grind) -----------------------------------------

    def grind_inputs(self):
        """Returns (state, leftover array or None, leftover length): the
        sponge state plus the un-duplexed input buffer — what the FRI PoW
        grinder embeds the candidate after (fri/prover.rs:136-188)."""
        total = sum(self.pending_lens)
        R = self.R
        if total >= R:
            # flush the full chunks (and capture the remainder) in one jit
            key = (self.hasher, tuple(self.pending_lens), self.n_out, 0)
            fn = _FLUSH_JITS.get(key)
            if fn is None:
                fn = _flush_program(self.F, self.hasher,
                                    tuple(self.pending_lens), self.n_out, 0)
                _FLUSH_JITS[key] = fn
            state, out_buf, rest = fn(self.state, self.out_buf,
                                      *self.pending)
            leftover = total % R
            self.state = state
            self.pending = [rest] if leftover else []
            self.pending_lens = [leftover] if leftover else []
            self.n_out = 0
        if len(self.pending) > 1:
            cat = fftm.tconcat(self.pending, axis=0)
            self.pending = [cat]
            self.pending_lens = [sum(self.pending_lens)]
        left = self.pending[0] if self.pending else None
        return self.state, left, (self.pending_lens[0] if self.pending_lens
                                  else 0)


def _remaining_outputs(n_absorbed: int, n_out_before: int, n: int,
                       R: int) -> int:
    """Static mirror of the host challenger's output-buffer count."""
    leftover = n_absorbed % R if n_absorbed else 0
    if n_absorbed and leftover == 0:
        cur = R          # final observe triggered a duplex: outputs refilled
    else:
        cur = 0 if n_absorbed else n_out_before
    pending_inputs = leftover > 0
    for _ in range(n):
        if pending_inputs or cur == 0:
            cur = R
            pending_inputs = False
        cur -= 1
    return cur
