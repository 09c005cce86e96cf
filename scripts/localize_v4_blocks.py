"""Row-divergence localizer v4: k-block deletion / constant-type insertion
scans, candidates from point 0 (zeta), verified on the other 28 points.
See localize_v2/v3 for the machinery; state from /tmp/localizer_state.npz.
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

from localize_v3_prony import e_add, e_sub, e_mul, e_inv  # noqa: E402
from localize_v2 import lagrange_weights  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPEC = host.GOLDILOCKS
P = SPEC.p

KS = [2, 3, 4, 5, 6, 7, 8, 10, 12, 16, 20, 24, 28, 32, 40, 48, 64]
UN = ((1 << 32) - 1) % P


def suffix_arrays(v, L, n, k):
    A = [(0, 0)] * (n + 1)
    for r in range(n - 1, -1, -1):
        A[r] = e_add(A[r + 1], (v[r] * L[r][0] % P, v[r] * L[r][1] % P))
    Sdel = [(0, 0)] * (n + 1)
    for r in range(n - 1, k - 1, -1):
        Sdel[r] = e_add(Sdel[r + 1],
                        (v[r] * (L[r - k][0] - L[r][0]) % P,
                         v[r] * (L[r - k][1] - L[r][1]) % P))
    Sins = [(0, 0)] * (n + 1)
    for r in range(n - k - 1, -1, -1):
        Sins[r] = e_add(Sins[r + 1],
                        (v[r] * (L[r + k][0] - L[r][0]) % P,
                         v[r] * (L[r + k][1] - L[r][1]) % P))
    return A, Sdel, Sins


def batch_inv(vals):
    pref = [(1, 0)]
    for d in vals:
        pref.append(e_mul(pref[-1], d if d != (0, 0) else (1, 0)))
    acc = e_inv(pref[-1])
    out = [None] * len(vals)
    for r in range(len(vals) - 1, -1, -1):
        d = vals[r] if vals[r] != (0, 0) else (1, 0)
        out[r] = e_mul(acc, pref[r])
        acc = e_mul(acc, d)
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
    other_L = {}

    def get_L(i):
        if i not in other_L:
            other_L[i] = lagrange_weights(n, common.degree_bits, points[i])
        return other_L[i]

    for k in KS:
        for j in range(NPOL):
            v = V[j]
            d0 = Dv[j][0]
            A, Sdel, Sins = suffix_arrays(v, L0, n, k)
            pad_v = v[n - 1]
            tailL = (0, 0)
            for r in range(n - k, n):
                tailL = e_add(tailL, L0[r])
            pad_term = (pad_v * tailL[0] % P, pad_v * tailL[1] % P)
            tail_ins = e_sub((0, 0), A[n - k])

            del_cands = []
            for p in range(0, n - k):
                blk = e_sub(A[p], A[p + k])
                pred = e_add(e_sub(Sdel[p + k], blk), pad_term)
                if pred == d0:
                    del_cands.append(p)

            winLs = []
            winL = (0, 0)
            for r in range(k):
                winL = e_add(winL, L0[r])
            for p in range(0, n - k):
                if p > 0:
                    winL = e_add(e_sub(winL, L0[p - 1]), L0[p + k - 1])
                winLs.append(winL)
            inv_win = batch_inv(winLs)
            ins_cands = []
            for p in range(0, n - k):
                need = e_sub(e_sub(d0, Sins[p]), tail_ins)
                tv = e_mul(need, inv_win[p])
                if tv[1] == 0 and (tv[0] <= 12 or tv[0] == UN):
                    ins_cands.append((p, tv[0]))

            # verify candidates on other points
            def verify_del(p):
                for i in range(1, npts):
                    L = get_L(i)
                    Ai, Sdi, _ = suffix_arrays(v, L, n, k)
                    tl = (0, 0)
                    for r in range(n - k, n):
                        tl = e_add(tl, L[r])
                    pt = (pad_v * tl[0] % P, pad_v * tl[1] % P)
                    blk = e_sub(Ai[p], Ai[p + k])
                    if e_add(e_sub(Sdi[p + k], blk), pt) != Dv[j][i]:
                        return False
                return True

            def verify_ins(p, tv):
                for i in range(1, npts):
                    L = get_L(i)
                    Ai, _, Sii = suffix_arrays(v, L, n, k)
                    ti = e_sub((0, 0), Ai[n - k])
                    wl = (0, 0)
                    for r in range(p, p + k):
                        wl = e_add(wl, L[r])
                    pred = e_add(e_add((tv * wl[0] % P, tv * wl[1] % P),
                                       Sii[p]), ti)
                    if pred != Dv[j][i]:
                        return False
                return True

            good_del = [p for p in del_cands[:50] if verify_del(p)]
            good_ins = [(p, tv) for p, tv in ins_cands[:50]
                        if verify_ins(p, tv)]
            if good_del or good_ins:
                print(f"k={k} poly {j}: DEL {good_del[:5]} "
                      f"INS {good_ins[:5]}", flush=True)
        print(f"k={k} scanned", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
