"""Row-divergence localizer v2: use 29 evaluation points (zeta + the 28 FRI
query LDE points) of the 5 selector/constant polys to test count-preserving
row-map hypotheses:

  (a) single row value change        D = delta * L_p
  (b) single adjacent transposition  D = (v[p+1]-v[p]) (L_p - L_{p+1})
  (c) block insertion of size k      (solve inserted values, verify)
  (d) block deletion of size k
  (e) the same adjacent transposition repeated at one offset inside every
      FRI query round (28 repeats)

Needs /tmp/inner_common.bin (cached inner) and /tmp/regression_pre.npz
(our LDE from check_zeta_openings.py).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import numpy as np  # noqa: E402

from plonky2_goldibear_tpu.field import host  # noqa: E402
from plonky2_goldibear_tpu.gates import selectors as selectors_mod  # noqa: E402
from plonky2_goldibear_tpu.hash import poseidon_gl  # noqa: E402
from plonky2_goldibear_tpu.plonk import serialization as ser  # noqa: E402
from plonky2_goldibear_tpu.plonk.get_challenges import get_challenges  # noqa: E402

from localize_row_divergence import emit_outer_rows  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPEC = host.GOLDILOCKS
P = SPEC.p


def ext_from(b):
    return (b % P, 0)


def e_add(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def e_sub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def e_mul(a, b):
    # GL quadratic extension x^2 = W
    W = SPEC.ext_w
    return ((a[0] * b[0] + W * a[1] * b[1]) % P,
            (a[0] * b[1] + a[1] * b[0]) % P)


def e_scale(v, a):
    return (v * a[0] % P, v * a[1] % P)


def lagrange_weights(n, degree_bits, point):
    """L_r(point) for all r; point is an ext tuple."""
    g = SPEC.two_adic_generator(degree_bits)
    powers = [1] * n
    for r in range(1, n):
        powers[r] = powers[r - 1] * g % P
    zp = point
    for _ in range(degree_bits):
        zp = e_mul(zp, zp)
    zn1 = e_sub(zp, (1, 0))
    denoms = [e_scale(n % P, e_sub(point, (powers[r], 0))) for r in range(n)]
    # batch inversion over the extension via norms
    inv = []
    # Montgomery batch: prefix products
    pref = [(1, 0)]
    for d in denoms:
        pref.append(e_mul(pref[-1], d))
    total_inv = host.ext_inv(SPEC, pref[-1])
    acc = total_inv
    inv = [None] * n
    for r in range(n - 1, -1, -1):
        inv[r] = e_mul(acc, pref[r])
        acc = e_mul(acc, denoms[r])
    return [e_scale(powers[r], e_mul(zn1, inv[r])) for r in range(n)]


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
    q_indices = challenges["fri_query_indices"]
    lde_bits = common.degree_bits + common.config.fri_config.rate_bits

    print("emitting rows...", flush=True)
    b = emit_outer_rows()
    n = len(b.gate_instances)
    degree_bits = host.log2_strict(n)

    gates = sorted(b.gates.values(), key=lambda g: (g.degree(), g.id()))
    sel_polys, _ = selectors_mod.selector_polynomials(
        gates, b.gate_instances, common.quotient_degree_factor + 1, P)
    const_polys = b._constant_polys(gates)
    polys = [[int(x) for x in v] for v in sel_polys] + \
            [[int(x) for x in v] for v in const_polys]
    npolys = len(polys)

    # evaluation points: zeta (ext) + 28 base LDE points as ext
    shift = SPEC.coset_shift
    g17 = SPEC.two_adic_generator(lde_bits)
    points = [zeta]
    ref_vals = [[tuple(int(x) for x in v)
                 for v in proof_wp.proof.openings.constants]]
    for qi, x_index in enumerate(q_indices):
        nat = host.reverse_bits(x_index, lde_bits)
        points.append(ext_from(shift * pow(g17, nat, P)))
        leaf, _sib = proof_wp.proof.opening_proof.query_round_proofs[
            qi].initial_trees_proof.evals_proofs[0]
        ref_vals.append([ext_from(int(leaf[j])) for j in range(npolys)])
    npts = len(points)

    print(f"computing Lagrange weights at {npts} points...", flush=True)
    Ls = [lagrange_weights(n, degree_bits, pt) for pt in points]

    # our evals + D
    D = [[None] * npts for _ in range(npolys)]
    for j in range(npolys):
        v = polys[j]
        for i in range(npts):
            L = Ls[i]
            acc = (0, 0)
            for r in range(n):
                if v[r]:
                    acc = e_add(acc, e_scale(v[r], L[r]))
            D[j][i] = e_sub(ref_vals[i][j], acc)
    ndiff = sum(1 for j in range(npolys) if any(d != (0, 0) for d in D[j]))
    print(f"diverging polys at these points: {ndiff}/{npolys}", flush=True)

    # (a) single value change: D_j = delta_j * L_p for all points
    print("scan (a) single value change...", flush=True)
    hits_a = []
    for p in range(n):
        ok = True
        for j in range(3):  # selectors suffice
            L0 = Ls[0][p]
            delta = e_mul(D[j][0], host.ext_inv(SPEC, L0))
            for i in range(1, npts):
                if e_mul(delta, Ls[i][p]) != D[j][i]:
                    ok = False
                    break
            if not ok:
                break
        if ok:
            hits_a.append(p)
    print("  hits:", hits_a[:10], flush=True)

    # (b) single adjacent transposition
    print("scan (b) adjacent transposition...", flush=True)
    hits_b = []
    for p in range(n - 1):
        ok = True
        for j in range(3):
            c = ext_from(polys[j][p + 1] - polys[j][p])
            for i in range(npts):
                pred = e_mul(c, e_sub(Ls[i][p], Ls[i][p + 1]))
                if pred != D[j][i]:
                    ok = False
                    break
            if not ok:
                break
        if ok:
            hits_b.append(p)
    print("  hits:", hits_b[:10], flush=True)

    # (e) repeated adjacent transposition at one offset in every query:
    # query start rows: find them from instance list — each query begins
    # with two BaseSumGate rows (split_le of x_index).  Collect all BaseSum
    # row indices and pair them.
    bs_rows = [r for r, inst in enumerate(b.gate_instances)
               if inst.gate.id().startswith("BaseSumGate")]
    # first BaseSum row is the PoW range check (single row); queries then
    # contribute 2 rows each
    pow_row = bs_rows[0]
    q_starts = bs_rows[1::2]
    assert len(q_starts) == 28, (len(bs_rows), len(q_starts))
    span = q_starts[1] - q_starts[0]
    print(f"query starts: first={q_starts[0]} span~{span}", flush=True)
    print("scan (e) per-query repeated transposition...", flush=True)
    hits_e = []
    max_off = min(span + 50, n - q_starts[-1] - 1)
    for off in range(-20, max_off):
        ok = True
        for j in range(3):
            for i in range(npts):
                pred = (0, 0)
                for qs in q_starts:
                    p = qs + off
                    if p < 0 or p + 1 >= n:
                        ok = False
                        break
                    c = ext_from(polys[j][p + 1] - polys[j][p])
                    pred = e_add(pred, e_mul(
                        c, e_sub(Ls[i][p], Ls[i][p + 1])))
                if not ok or pred != D[j][i]:
                    ok = False
                    break
            if not ok:
                break
        if ok:
            hits_e.append(off)
    print("  hits:", hits_e[:10], flush=True)

    np.savez_compressed(
        "/tmp/localizer_state.npz",
        D=np.array([[list(x) for x in row] for row in D], dtype=object),
        polys=np.array(polys, dtype=np.uint64),
        q_starts=np.array(q_starts + [pow_row]))
    print("saved /tmp/localizer_state.npz (D, polys, q_starts)", flush=True)


if __name__ == "__main__":
    main()
