"""Merkle tree with cap: batched device hashing, host proof verification.

Semantics match the reference (plonky2/src/hash/merkle_tree.rs:19,46,86-222;
merkle_proofs.rs:54-80): leaf digest = hash_or_noop(leaf row), parent =
two_to_one(left, right), the *cap* (layer of 2^cap_height nodes) replaces the
root, and a proof is the sibling chain up to (excluding) the cap; the cap
index is the remaining high bits of the leaf index.

TPU-first design: instead of the reference's interleaved single digest buffer
(recursive fork-join layout), we store one dense digest array per level and
build the tree as log2(n) batched two_to_one rounds — each level is one
embarrassingly-parallel hashing kernel.  Proof extraction is a per-level
gather; sibling values are identical to the reference's.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import numpy as np

from ..field import gl
from ..field.host import log2_strict
from . import poseidon_gl


@jax.jit
def _sibling_gather_jit(levels, idx):
    """Gather the whole sibling chain for a batch of leaf indices as one
    program: per level the digests at (idx ^ 1), stacked along axis 0."""
    import jax.numpy as jnp

    gathers = []
    for lv in levels:
        sib = idx ^ 1
        gathers.append(jax.tree_util.tree_map(lambda a: a[sib], lv))
        idx = idx >> 1
    return jax.tree_util.tree_map(
        lambda *ls: jnp.concatenate(ls, axis=0), *gathers)


def build_levels(leaves, num_layers: int, hasher=poseidon_gl):
    """Pure/jittable tree build: leaves (n, leaf_len) -> list of digest levels.

    levels[k] has n >> k digests of width NUM_HASH_OUT in natural node order;
    levels[-1] (the ``num_layers``-th) is the cap.

    On TPU with the Poseidon-GL hasher the internal levels run through the
    fused column kernels in ops/poseidon_gl.py (bit-reversed pairing; one
    kernel for ALL levels of width <= TAIL_W) — without this, the last
    log2(TAIL_W) levels fall below the pallas batch floor and run as ~30
    tiny XLA rounds each, which costs more than the entire leaf sponge.
    """
    d0 = hasher.hash_or_noop(leaves)
    if num_layers == 0:
        return [d0]
    n = d0.shape[0] if hasattr(d0, "shape") else len(d0)
    from ..utils.envflags import env_flag

    # DISABLE_POSEIDON also gates this dispatch: build_levels_cols invokes
    # the Poseidon Pallas kernels internally, so the poseidon kill switch
    # must remove it too for the bisect modes to be orthogonal.
    if (hasher is poseidon_gl and isinstance(d0, gl.GL) and n >= 256
            and jax.default_backend() == "tpu"
            and not env_flag("PLONKY2_TPU_DISABLE_MERKLE")
            and not env_flag("PLONKY2_TPU_DISABLE_POSEIDON")):
        from ..ops import poseidon_gl as K

        return [d0] + K.build_levels_cols(d0, num_layers)
    levels = [d0]
    for _ in range(num_layers):
        cur = levels[-1]
        levels.append(hasher.two_to_one(cur[0::2], cur[1::2]))
    return levels


class MerkleTree:
    """Device-built Merkle tree over GL leaves.

    leaves: GL array (n_leaves, leaf_len); cap_height: cap layer height.
    """

    def __init__(self, leaves: gl.GL, cap_height: int, hasher=poseidon_gl,
                 levels=None):
        self.hasher = hasher
        self.leaves = leaves
        n = leaves.shape[0]
        self.n_leaves = n
        self.leaf_len = leaves.shape[1]
        self.cap_height = cap_height
        depth = log2_strict(n)
        assert cap_height <= depth, (cap_height, depth)
        self.num_layers = depth - cap_height
        if levels is None:
            levels = build_levels(leaves, self.num_layers, hasher)
        self.levels = levels
        self.cap = levels[-1]
        self._host_levels = None

    # -- host-side extraction ------------------------------------------------

    @property
    def _F(self):
        # field module of the hasher (gl for Poseidon-GL, bb for Poseidon2)
        return getattr(self.hasher, "F", gl)

    def cap_host(self) -> List:
        if hasattr(self.hasher, "digests_host"):
            return self.hasher.digests_host(self.cap)
        c = self._F.to_ints(self.cap)
        return [[int(x) for x in row] for row in c]

    def _levels_host(self) -> List:
        if self._host_levels is None:
            if hasattr(self.hasher, "digests_host"):
                self._host_levels = [self.hasher.digests_host(lv)
                                     for lv in self.levels[:-1]]
            else:
                self._host_levels = [self._F.to_ints(lv)
                                     for lv in self.levels[:-1]]
        return self._host_levels

    def prove(self, leaf_index: int) -> List:
        """Sibling digests from leaf level up to (excluding) the cap."""
        return self.prove_batch([leaf_index])[0]

    def prove_batch(self, leaf_indices: Sequence[int]) -> List[List]:
        """Sibling chains for many leaves with one device gather + one
        transfer per level (the reference reads siblings out of its
        interleaved digest buffer, merkle_tree.rs:188-222; on TPU the analog
        is a batched gather so the 28 FRI query rounds don't pull whole
        levels across the host boundary)."""
        import jax.numpy as jnp  # noqa: F401

        if hasattr(self.hasher, "digests_host"):
            # byte-digest hashers (Keccak) keep the host path
            levels = self._levels_host()
            out = []
            for leaf_index in leaf_indices:
                sibs, idx = [], leaf_index
                for k in range(self.num_layers):
                    sib = levels[k][idx ^ 1]
                    sibs.append(sib if isinstance(sib, bytes)
                                else [int(x) for x in sib])
                    idx >>= 1
                out.append(sibs)
            return out
        if self.num_layers == 0:
            return [[] for _ in leaf_indices]
        idx = np.asarray(list(leaf_indices), dtype=np.int32)
        # ONE jitted program + ONE stacked transfer for the whole sibling
        # chain (eager per-level gathers and fetches are each a separate
        # host round trip — ~ms each through the TPU tunnel)
        stacked = _sibling_gather_jit(tuple(self.levels[:self.num_layers]),
                                      jnp.asarray(idx))
        flat = self._F.to_ints(stacked)
        nq = len(leaf_indices)
        per_level = [flat[k * nq:(k + 1) * nq]
                     for k in range(self.num_layers)]
        return [[[int(x) for x in per_level[k][q]]
                 for k in range(self.num_layers)]
                for q in range(len(leaf_indices))]

    def leaf_host(self, leaf_index: int) -> List[int]:
        return self.leaf_batch([leaf_index])[0]

    def leaf_batch(self, leaf_indices: Sequence[int]) -> List[List[int]]:
        """Many leaf rows with one gather + one transfer."""
        import jax.numpy as jnp

        idx = jnp.asarray(list(leaf_indices), dtype=jnp.int32)
        rows = self._F.to_ints(jax.tree_util.tree_map(
            lambda a: a[idx], self.leaves))
        return [[int(x) for x in row] for row in rows]


def verify_merkle_proof_to_cap(leaf_data: Sequence[int], leaf_index: int,
                               cap: Sequence[Sequence[int]],
                               siblings: Sequence[Sequence[int]],
                               hasher=poseidon_gl) -> bool:
    """Host verification (reference hash/merkle_proofs.rs:54-80)."""
    current = hasher.hash_or_noop_host(list(leaf_data))
    index = leaf_index
    for sib in siblings:
        s = sib if isinstance(sib, bytes) else list(sib)
        if index & 1:
            current = hasher.two_to_one_host(s, current)
        else:
            current = hasher.two_to_one_host(current, s)
        index >>= 1
    expected = cap[index]
    if isinstance(current, bytes):
        return current == bytes(expected)
    return list(current) == list(expected)
