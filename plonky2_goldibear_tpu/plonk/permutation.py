"""Permutation argument: disjoint-set forest + sigma polynomials
(reference plonky2/src/plonk/permutation_argument.rs:13-158).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..iop import target as tgt


class Forest:
    """Union-find over dense target indices (wires row-major, then virtual
    targets)."""

    def __init__(self, num_wires: int, num_routed_wires: int, degree: int,
                 num_virtual_targets: int):
        self.num_wires = num_wires
        self.num_routed_wires = num_routed_wires
        self.degree = degree
        n = num_wires * degree + num_virtual_targets
        self.parents = np.arange(n, dtype=np.int64)

    def target_index(self, t: tgt.Target) -> int:
        return tgt.target_index(t, self.num_wires, self.degree)

    def find(self, x: int) -> int:
        parents = self.parents
        rep = x
        while parents[rep] != rep:
            rep = parents[rep]
        while parents[x] != x:
            parents[x], x = rep, parents[x]
        return int(rep)

    def merge(self, ta: tgt.Target, tb: tgt.Target):
        xa = self.find(self.target_index(ta))
        xb = self.find(self.target_index(tb))
        if xa != xb:
            self.parents[xb] = xa

    def compress_paths(self):
        # one vectorized pointer-jumping pass loop: parents converge in
        # O(log depth) rounds
        p = self.parents
        while True:
            pp = p[p]
            if np.array_equal(pp, p):
                break
            p = pp
        self.parents = p

    def wire_partition(self) -> "WirePartition":
        """Group routed wires by representative (reference
        permutation_argument.rs:88-106)."""
        partition: Dict[int, List[tgt.Target]] = {}
        nw, d = self.num_wires, self.degree
        for row in range(d):
            base = row * nw
            for column in range(self.num_routed_wires):
                rep = int(self.parents[base + column])
                partition.setdefault(rep, []).append((row, column))
        return WirePartition(list(partition.values()))


class WirePartition:
    def __init__(self, partition: List[List]):
        self.partition = partition  # lists of (row, column)

    def get_sigma_map(self, degree: int, num_routed_wires: int) -> np.ndarray:
        """sigma: [k*n] -> [k*n], wire (col, row) -> index col*degree+row of
        its successor in the copy class (reference
        permutation_argument.rs:131-157)."""
        neighbors: Dict = {}
        for subset in self.partition:
            m = len(subset)
            for i, w in enumerate(subset):
                neighbors[w] = subset[(i + 1) % m]
        sigma = np.empty(num_routed_wires * degree, dtype=np.int64)
        idx = 0
        for column in range(num_routed_wires):
            for row in range(degree):
                nrow, ncol = neighbors[(row, column)]
                sigma[idx] = ncol * degree + nrow
                idx += 1
        return sigma

    def get_sigma_polys(self, degree_log: int, k_is: List[int],
                        subgroup: List[int], p: int) -> np.ndarray:
        """(num_routed_wires, degree) uint64 values: sigma poly j at row i is
        k_{col(sigma)} * g^{row(sigma)}."""
        degree = 1 << degree_log
        sigma = self.get_sigma_map(degree, len(k_is))
        k_arr = np.array(k_is, dtype=object)
        sub_arr = np.array(subgroup, dtype=object)
        vals = (k_arr[sigma // degree] * sub_arr[sigma % degree]) % p
        out = np.fromiter((int(v) for v in vals), dtype=np.uint64,
                          count=len(vals))
        return out.reshape(len(k_is), degree)
