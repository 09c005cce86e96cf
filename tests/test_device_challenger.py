"""DeviceChallenger must be element-exact with the host Challenger
(reference plonky2/src/iop/challenger.rs:18-160) for arbitrary interleavings
of observes and squeezes."""

import numpy as np
import pytest

from plonky2_goldibear_tpu.field import gl
from plonky2_goldibear_tpu.hash import poseidon_gl
from plonky2_goldibear_tpu.hash.challenger import Challenger
from plonky2_goldibear_tpu.hash.device_challenger import DeviceChallenger


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_host_challenger(seed):
    rng = np.random.default_rng(seed)
    host_ch = Challenger()
    dev_ch = DeviceChallenger(gl, poseidon_gl)
    for _ in range(12):
        k = int(rng.integers(0, 23))
        vals = [int(x) for x in rng.integers(0, gl.P, size=k,
                                             dtype=np.uint64)]
        host_ch.observe_elements(vals)
        dev_ch.observe_host_ints(vals)
        n = int(rng.integers(1, 12))
        want = host_ch.get_n_challenges(n)
        got = [int(x) for x in gl.to_ints(dev_ch.get_n_challenges(n))]
        assert got == want, (k, n)


def test_grind_inputs_match_compact_state():
    rng = np.random.default_rng(3)
    host_ch = Challenger()
    dev_ch = DeviceChallenger(gl, poseidon_gl)
    vals = [int(x) for x in rng.integers(0, gl.P, size=21, dtype=np.uint64)]
    host_ch.observe_elements(vals)
    dev_ch.observe_host_ints(vals)
    state, leftover, L = dev_ch.grind_inputs()
    # host grinder layout: sponge_state with input_buffer overlaid at 0..L
    assert L == len(host_ch.input_buffer)
    host_state = list(host_ch.sponge_state)
    got_state = [int(x) for x in gl.to_ints(state)]
    assert got_state == host_state
    got_left = [int(x) for x in gl.to_ints(leftover)]
    assert got_left == host_ch.input_buffer
    # and the transcripts stay in sync afterwards
    host_ch.observe_element(7)
    dev_ch.observe_host_ints([7])
    assert [int(x) for x in gl.to_ints(dev_ch.get_n_challenges(3))] == \
        host_ch.get_n_challenges(3)
