"""Row-divergence localizer for the digest-identity workstream.

The rebuilt regression circuit's preprocessed polys all differ from the
reference while CommonCircuitData matches byte-for-byte — consistent with a
small row-placement difference (e.g. ONE extra or missing row somewhere in
the emission, shifting everything after it).

This script tests every single-row INSERTION and DELETION hypothesis in
O(N) total using Lagrange weights at zeta:

    S_ref(zeta) = sum_r v_ref[r] * L_r(zeta),   L_r(x) = g^r (x^n-1)/(n(x-g^r))

For "reference = ours with a row inserted at p" the implied inserted
selector value tv = (ref_open - prefix(p) - shifted_suffix(p+1)) / L_p must
be a LEGAL selector value (gate index in group / UNUSED); positions where
all selector polys yield legal values simultaneously are reported.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

from plonky2_goldibear_tpu.field import host  # noqa: E402
from plonky2_goldibear_tpu.gates import selectors as selectors_mod  # noqa: E402
from plonky2_goldibear_tpu.hash import poseidon_gl  # noqa: E402
from plonky2_goldibear_tpu.plonk import serialization as ser  # noqa: E402
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder  # noqa: E402
from plonky2_goldibear_tpu.plonk.config import CircuitConfig  # noqa: E402
from plonky2_goldibear_tpu.plonk.get_challenges import get_challenges  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPEC = host.GOLDILOCKS
P = SPEC.p


def emit_outer_rows():
    """Emit the outer circuit and replicate build()'s row appends (pi gate,
    blinding, padding) WITHOUT committing; returns (builder, gate_instances)."""
    from plonky2_goldibear_tpu.gates.basic_gates import (NoopGate,
                                                         PublicInputGate)
    from plonky2_goldibear_tpu.iop import target as tgt
    from plonky2_goldibear_tpu.recursion import recursive_verifier as rv

    config = CircuitConfig.standard_recursion_zk_config_gl()
    cache = "/tmp/inner_common.bin"
    inner_common = ser.read_common_circuit_data(open(cache, "rb").read())

    b = CircuitBuilder(config)
    pt = rv.add_virtual_proof_with_pis(b, inner_common)
    vk_t = rv.add_virtual_verifier_data(b, config.fri_config.cap_height)
    rv.verify_proof(b, pt, vk_t, inner_common)

    # build() prefix: pi hash (0 PIs -> no gates), PI gate, slot completion,
    # constants routing (no ConstantGates here), blinding, padding
    pi_hash_targets = b.hash_n_to_m_no_pad(b.public_inputs,
                                           b.spec.num_hash_out_elts)
    pi_gate = b.add_gate(PublicInputGate(b.spec.num_hash_out_elts), [])
    for i, t in enumerate(pi_hash_targets):
        b.connect(t, tgt.wire(pi_gate, i))
    for gate_id, slots in list(b.current_slots.items()):
        gate = b._slot_gates[gate_id]
        for params, (gate_idx, slot_idx) in list(slots.items()):
            if gate.complete_wires(b, gate_idx, slot_idx):
                slots.pop(params, None)
    assert not b.luts
    assert len(b.constants_to_targets) <= len(b.constant_generators), \
        (len(b.constants_to_targets), len(b.constant_generators))
    pairs = sorted(b.constants_to_targets.items(), key=lambda kv: kv[0])
    for (c, t), cg in zip(pairs, b.constant_generators):
        b.gate_instances[cg.row].constants[cg.constant_index] = c
    if config.zero_knowledge:
        b._blind()
    while len(b.gate_instances) & (len(b.gate_instances) - 1):
        b.add_gate(NoopGate(), [])
    return b


def ext_scale(v: int, e):
    return tuple(v * x % P for x in e)


def ext_add(a, b):
    return host.ext_add(SPEC, a, b)


def ext_sub(a, b):
    return host.ext_sub(SPEC, a, b)


def ext_mul(a, b):
    return host.ext_mul(SPEC, a, b)


def main():
    common = ser.read_common_circuit_data(
        open(os.path.join(HERE, "tests/data/gl_regression_common.bin"),
             "rb").read())
    vk = ser.read_verifier_only_circuit_data(
        open(os.path.join(HERE, "tests/data/gl_regression_verifier.bin"),
             "rb").read())
    proof_wp = ser.read_proof_with_public_inputs(
        open(os.path.join(HERE, "tests/data/gl_regression_proof.bin"),
             "rb").read(), common)
    pi_hash = poseidon_gl.hash_no_pad_host(proof_wp.public_inputs)
    challenges = get_challenges(proof_wp, pi_hash, vk.circuit_digest, common,
                                poseidon_gl)
    zeta = challenges["plonk_zeta"]
    ref_open = [tuple(int(x) for x in v)
                for v in proof_wp.proof.openings.constants]  # 5 ext values

    print("emitting rows...", flush=True)
    b = emit_outer_rows()
    n = len(b.gate_instances)
    degree_bits = host.log2_strict(n)
    assert degree_bits == common.degree_bits, (degree_bits, common.degree_bits)

    gates = sorted(b.gates.values(), key=lambda g: (g.degree(), g.id()))
    sel_polys, sel_info = selectors_mod.selector_polynomials(
        gates, b.gate_instances, common.quotient_degree_factor + 1, P)
    const_polys = b._constant_polys(gates)
    polys = [np.asarray(v, dtype=np.uint64) for v in sel_polys] + \
            [np.asarray(v, dtype=np.uint64) for v in const_polys]
    assert len(polys) == common.num_constants, len(polys)
    print(f"n={n} polys={len(polys)}", flush=True)

    # Lagrange weights L_r(zeta) = g^r (zeta^n - 1) / (n (zeta - g^r))
    g = SPEC.two_adic_generator(degree_bits)
    print("computing Lagrange weights...", flush=True)
    powers = [1] * n
    for r in range(1, n):
        powers[r] = powers[r - 1] * g % P
    zeta_pow_n = zeta
    for _ in range(degree_bits):
        zeta_pow_n = ext_mul(zeta_pow_n, zeta_pow_n)
    zn_minus_1 = ext_sub(zeta_pow_n, (1, 0))
    denoms = [ext_scale(n % P, ext_sub(zeta, (powers[r], 0)))
              for r in range(n)]
    inv_denoms = host.ext_batch_inv(SPEC, denoms) if hasattr(
        host, "ext_batch_inv") else [host.ext_inv(SPEC, d) for d in denoms]
    L = [ext_scale(powers[r], ext_mul(zn_minus_1, inv_denoms[r]))
         for r in range(n)]

    # sanity: sum L_r = 1
    acc = (0, 0)
    for e in L:
        acc = ext_add(acc, e)
    print("sum L_r =", acc, "(expect (1,0))", flush=True)

    results = []
    for pi_idx, v in enumerate(polys):
        v = [int(x) for x in v]
        base = (0, 0)
        for r in range(n):
            base = ext_add(base, ext_scale(v[r], L[r]))
        ref = ref_open[pi_idx]
        print(f"poly {pi_idx}: ours(zeta)={base} ref={ref} "
              f"{'MATCH' if base == ref else 'DIFFER'}", flush=True)
        if base == ref:
            results.append(None)
            continue
        # suffix sums: A[q] = sum_{r>=q} v[r] L[r];  W[q] = sum_{r>=q} v[r-1] L[r]
        A = [(0, 0)] * (n + 1)
        for r in range(n - 1, -1, -1):
            A[r] = ext_add(A[r + 1], ext_scale(v[r], L[r]))
        W = [(0, 0)] * (n + 1)
        for r in range(n - 1, 0, -1):
            W[r] = ext_add(W[r + 1], ext_scale(v[r - 1], L[r]))
        inv_L = host.ext_batch_inv(SPEC, L) if hasattr(
            host, "ext_batch_inv") else [host.ext_inv(SPEC, e) for e in L]
        # insertion at p: ref = (base - A[p]) + tv L[p] + W[p+1]
        ins = {}
        for p in range(n):
            prefix = ext_sub(base, A[p])
            rem = ext_sub(ext_sub(ref, prefix), W[p + 1])
            tv = ext_mul(rem, inv_L[p])
            if tv[1] == 0 and (tv[0] < 16 or tv[0] == (1 << 32) - 1):
                ins[p] = tv[0]
        # deletion at p: ref = (base - A[p]) + sum_{r=p}^{n-2} v[r+1] L[r] + v_pad L[n-1]
        #   sum_{r=p}^{n-2} v[r+1] L[r] = sum_{q=p+1}^{n-1} v[q] L[q-1]
        # precompute U[q] = sum_{r>=q} v[r] L[r-1]
        U = [(0, 0)] * (n + 1)
        for r in range(n - 1, 0, -1):
            U[r] = ext_add(U[r + 1], ext_scale(v[r], L[r - 1]))
        v_pad = v[n - 1]
        dels = []
        for p in range(n):
            pred = ext_add(ext_add(ext_sub(base, A[p]), U[p + 1]),
                           ext_scale(v_pad, L[n - 1]))
            if pred == ref:
                dels.append(p)
        print(f"  poly {pi_idx}: insertion hits={len(ins)} "
              f"deletion hits={len(dels)}", flush=True)
        results.append((ins, dels))

    # intersect insertion positions across the SELECTOR polys only (their
    # legality filter is strong; constant-poly values can be arbitrary)
    sel_results = [r for r in results[:len(sel_polys)] if r is not None]
    if sel_results:
        common_pos = set.intersection(*(set(r[0]) for r in sel_results))
        print("insertion positions consistent across selector polys:",
              sorted(common_pos)[:30], flush=True)
        for p in sorted(common_pos)[:10]:
            print(f"  p={p}: implied selector values:",
                  [r[0].get(p) for r in sel_results])
        dcommon = set.intersection(*(set(r[1]) for r in sel_results))
        print("deletion positions consistent across selector polys:",
              sorted(dcommon)[:30], flush=True)


if __name__ == "__main__":
    main()
