"""Row-divergence localizer v3: rational reconstruction (Cauchy/Prony).

If the reference selector polys differ from ours in a SMALL set S of rows,
then  R(x) = D(x) * n / (x^n - 1) = sum_{r in S} delta_r g^r / (x - g^r)
is a proper rational function with poles exactly at {g^r : r in S}.
Fit N(x)/Den(x) with deg Den <= m from the 29 evaluations, factor Den over
the subgroup -> the exact changed rows.  Fails detectably if |S| > m.
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

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPEC = host.GOLDILOCKS
P = SPEC.p
W = SPEC.ext_w


def e_add(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def e_sub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def e_mul(a, b):
    return ((a[0] * b[0] + W * a[1] * b[1]) % P,
            (a[0] * b[1] + a[1] * b[0]) % P)


def e_inv(a):
    return host.ext_inv(SPEC, a)


def e_pow(a, k):
    r = (1, 0)
    while k:
        if k & 1:
            r = e_mul(r, a)
        a = e_mul(a, a)
        k >>= 1
    return r


def solve_linear(Amat, bvec):
    """Gaussian elimination over GF(p^2); returns solution or None."""
    m = len(Amat)
    ncols = len(Amat[0])
    M = [row[:] + [bvec[i]] for i, row in enumerate(Amat)]
    piv_cols = []
    r = 0
    for c in range(ncols):
        pr = None
        for rr in range(r, m):
            if M[rr][c] != (0, 0):
                pr = rr
                break
        if pr is None:
            continue
        M[r], M[pr] = M[pr], M[r]
        inv = e_inv(M[r][c])
        M[r] = [e_mul(x, inv) for x in M[r]]
        for rr in range(m):
            if rr != r and M[rr][c] != (0, 0):
                f = M[rr][c]
                M[rr] = [e_sub(M[rr][k], e_mul(f, M[r][k]))
                         for k in range(ncols + 1)]
        piv_cols.append(c)
        r += 1
        if r == m:
            break
    # check consistency
    for rr in range(r, m):
        if M[rr][ncols] != (0, 0):
            return None
    sol = [(0, 0)] * ncols
    for i, c in enumerate(piv_cols):
        sol[c] = M[i][ncols]
    return sol


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
    D = st["D"]  # (npolys, npts) of [a, b]
    npolys, npts = D.shape[0], D.shape[1]

    shift = SPEC.coset_shift
    g17 = SPEC.two_adic_generator(lde_bits)
    points = [zeta]
    for x_index in q_indices:
        nat = host.reverse_bits(x_index, lde_bits)
        points.append((shift * pow(g17, nat, P) % P, 0))
    assert len(points) == npts

    g = SPEC.two_adic_generator(common.degree_bits)

    for j in range(3):
        Dj = [tuple(int(v) for v in D[j][i]) for i in range(npts)]
        if all(d == (0, 0) for d in Dj):
            print(f"poly {j}: no divergence")
            continue
        # R_i = D_i * n / (x_i^n - 1)
        R = []
        for i, x in enumerate(points):
            xn = e_pow(x, n)
            R.append(e_mul(Dj[i], e_mul((n % P, 0),
                                        (0, 0) if xn == (1, 0)
                                        else e_inv(e_sub(xn, (1, 0))))))
        best = None
        for m in range(1, 15):
            # unknowns: num_0..num_{m-1}, den_0..den_{m-1} (den monic deg m)
            rows = []
            rhs = []
            for i in range(2 * m + 1):
                if i >= npts:
                    break
                x = points[i]
                xp = [(1, 0)]
                for _ in range(m):
                    xp.append(e_mul(xp[-1], x))
                row = [xp[k] for k in range(m)]
                row += [e_sub((0, 0), e_mul(R[i], xp[k])) for k in range(m)]
                rows.append(row)
                rhs.append(e_mul(R[i], xp[m]))
            sol = solve_linear(rows, rhs)
            if sol is None:
                continue
            num = sol[:m]
            den = sol[m:] + [(1, 0)]
            # verify on ALL points
            ok = True
            for i in range(npts):
                x = points[i]
                nv = (0, 0)
                for k in range(m - 1, -1, -1):
                    nv = e_add(e_mul(nv, x), num[k])
                dv = (0, 0)
                for k in range(m, -1, -1):
                    dv = e_add(e_mul(dv, x), den[k])
                if e_mul(R[i], dv) != nv:
                    ok = False
                    break
            if ok:
                best = (m, num, den)
                break
        if best is None:
            print(f"poly {j}: support > 14 (no rational fit)", flush=True)
            continue
        m, num, den = best
        # find subgroup roots of den
        roots = []
        gi = (1, 0)
        for r in range(n):
            dv = (0, 0)
            for k in range(m, -1, -1):
                dv = e_add(e_mul(dv, gi), den[k])
            if dv == (0, 0):
                roots.append(r)
            gi = e_mul(gi, (g, 0))
        print(f"poly {j}: support size {m}, divergent rows: {roots}",
              flush=True)


if __name__ == "__main__":
    main()
