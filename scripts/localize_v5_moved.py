"""Row-divergence localizer v5: single MOVED row (insert at p1 + delete of
the same-typed row at p2) — the signature of one gate row being created at
a different time than the reference.

For p1 < p2 (row moved EARLIER in reference):
  ref[r]=v[r] (r<p1); ref[p1]=v[p2]; ref[r]=v[r-1] (p1<r<=p2); ref[r]=v[r] (r>p2)
  D(x) = v[p2] L_{p1} + sum_{r=p1}^{p2-1} v[r](L_{r+1}-L_r) - v[p2] L_{p2}
Let C[q] = sum_{r<q} v[r](L_{r+1}-L_r).  Then
  D = v[p2] (L_{p1}-L_{p2}) + C[p2] - C[p1]
  =>  C[p2] - v[p2] L_{p2}  +  v[p2] L_{p1}  =  D + C[p1]
Group p2 by b=v[p2] (few distinct selector values) and hash a[p2] =
C[p2]-v[p2]L_{p2}; for each p1 and b: lookup  D + C[p1] - b L_{p1}.
Symmetric scan for p2 < p1 (moved LATER).  Candidates verified on all 28
other evaluation points.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from plonky2_goldibear_tpu.field import host  # noqa: E402
from plonky2_goldibear_tpu.hash import poseidon_gl  # noqa: E402
from plonky2_goldibear_tpu.plonk import serialization as ser  # noqa: E402
from plonky2_goldibear_tpu.plonk.get_challenges import get_challenges  # noqa: E402

from localize_v3_prony import e_add, e_sub, e_mul  # noqa: E402
from localize_v2 import lagrange_weights  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPEC = host.GOLDILOCKS
P = SPEC.p


def scan_moved(v, L, d):
    """Returns candidate (p1, p2) pairs (p1 != p2, either order) satisfying
    the moved-row equation at this one point."""
    n = len(v)
    C = [(0, 0)] * (n + 1)
    for r in range(n - 1):
        C[r + 1] = e_add(C[r], (v[r] * (L[r + 1][0] - L[r][0]) % P,
                                v[r] * (L[r + 1][1] - L[r][1]) % P))
    # reverse-shift cumulative for the p2<p1 case:
    # Cb[q] = sum_{r<q} v[r+1](L_r - L_{r+1})
    Cb = [(0, 0)] * (n + 1)
    for r in range(n - 1):
        Cb[r + 1] = e_add(Cb[r], (v[r + 1] * (L[r][0] - L[r + 1][0]) % P,
                                  v[r + 1] * (L[r][1] - L[r + 1][1]) % P))
    out = []
    # forward: D = b(L_{p1}-L_{p2}) + C[p2]-C[p1],  b = v[p2]
    lut = {}
    for p2 in range(n):
        b = v[p2]
        a = e_sub(C[p2], (b * L[p2][0] % P, b * L[p2][1] % P))
        lut.setdefault(b, {}).setdefault(a, []).append(p2)
    for p1 in range(n):
        base = e_add(d, C[p1])
        for b, table in lut.items():
            key = e_sub(base, (b * L[p1][0] % P, b * L[p1][1] % P))
            for p2 in table.get(key, ()):
                if p2 > p1:
                    out.append((p1, p2))
    # backward (row moved later): ref has our row p2 moved to position p1>p2:
    # ref[r]=v[r] (r<p2); ref[r]=v[r+1] (p2<=r<p1); ref[p1]=v[p2]; rest same
    # D = sum_{r=p2}^{p1-1} v[r+1](L_r - L_{r+1}) ... careful:
    # D(x) = -v[p2]L_{p2} + sum_{r=p2}^{p1-1} v[r+1](L_r(x)-L_{r+1}(x))
    #        + v[p2] L_{p1}
    #   = v[p2](L_{p1}-L_{p2}) + Cb[p1] - Cb[p2]
    lut2 = {}
    for p2 in range(n):
        b = v[p2]
        a = e_add(e_sub((0, 0), Cb[p2]),
                  ((-b) * L[p2][0] % P, (-b) * L[p2][1] % P))
        lut2.setdefault(b, {}).setdefault(a, []).append(p2)
    for p1 in range(n):
        base = e_sub(d, Cb[p1])
        for b, table in lut2.items():
            key = e_sub(base, (b * L[p1][0] % P, b * L[p1][1] % P))
            for p2 in table.get(key, ()):
                if p2 < p1:
                    out.append((p1, p2))
    return out


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
    challenges = get_challenges(proof_wp, pi_hash, vk.circuit_digest,
                                common, poseidon_gl)
    zeta = challenges["plonk_zeta"]
    q_indices = challenges["fri_query_indices"]
    lde_bits = common.degree_bits + common.config.fri_config.rate_bits
    n = 1 << common.degree_bits

    st = np.load("/tmp/localizer_state.npz", allow_pickle=True)
    D = st["D"]
    polys = st["polys"]

    shift = SPEC.coset_shift
    g17 = SPEC.two_adic_generator(lde_bits)
    points = [zeta]
    for x_index in q_indices:
        nat = host.reverse_bits(x_index, lde_bits)
        points.append((shift * pow(g17, nat, P) % P, 0))
    npts = len(points)

    NPOL = 3
    V = [[int(x) for x in polys[j]] for j in range(NPOL)]
    Dv = [[tuple(int(x) for x in D[j][i]) for i in range(npts)]
          for j in range(NPOL)]

    print("weights at zeta...", flush=True)
    L0 = lagrange_weights(n, common.degree_bits, points[0])

    cands = None
    for j in range(NPOL):
        print(f"scan poly {j}...", flush=True)
        c = set(scan_moved(V[j], L0, Dv[j][0]))
        print(f"  poly {j}: {len(c)} candidate pairs", flush=True)
        cands = c if cands is None else (cands & c)
        if not cands:
            break
    print("intersection across selector polys:",
          sorted(cands)[:20] if cands else [], flush=True)

    if cands:
        # verify on remaining points
        for i in range(1, npts):
            L = lagrange_weights(n, common.degree_bits, points[i])
            still = set()
            for j in range(NPOL):
                c = set(scan_moved(V[j], L, Dv[j][i]))
                still = c if not still else still
                cands &= c
            if not cands:
                break
            print(f"  after point {i}: {len(cands)}", flush=True)
        print("VERIFIED moved-row pairs:", sorted(cands)[:10], flush=True)


if __name__ == "__main__":
    main()
