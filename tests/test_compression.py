"""Proof compression round trip (reference plonk/proof.rs:512-549)."""

import pytest

from plonky2_goldibear_tpu.plonk import compression as comp
from plonky2_goldibear_tpu.plonk.verifier import verify
from tests.test_e2e_prove_verify import fib_proof  # noqa: F401 (fixture)


def test_compress_decompress_roundtrip(fib_proof):  # noqa: F811
    data, proof = fib_proof
    cproof = comp.compress(proof, data.verifier_only, data.common)
    # dedup actually shrinks the proof: count total sibling hashes
    orig_sibs = sum(len(mp) for rnd in proof.proof.opening_proof
                    .query_round_proofs
                    for _, mp in rnd.initial_trees_proof.evals_proofs)
    comp_sibs = sum(len(mp) for itp in cproof.proof.opening_proof
                    .query_round_proofs.initial_trees_proofs.values()
                    for _, mp in itp.evals_proofs)
    assert comp_sibs < orig_sibs

    restored = comp.decompress(cproof, data.verifier_only, data.common)
    # exact round trip
    r0 = proof.proof.opening_proof
    r1 = restored.proof.opening_proof
    assert len(r0.query_round_proofs) == len(r1.query_round_proofs)
    for a, b in zip(r0.query_round_proofs, r1.query_round_proofs):
        assert a.initial_trees_proof.evals_proofs == \
            b.initial_trees_proof.evals_proofs
        assert len(a.steps) == len(b.steps)
        for sa, sb in zip(a.steps, b.steps):
            assert [tuple(e) for e in sa.evals] == \
                [tuple(e) for e in sb.evals]
            assert sa.merkle_proof == sb.merkle_proof
    verify(restored, data.verifier_only, data.common)
