"""Row-divergence localizer v6: within-query block rotation repeated across
queries 2..28 (same offsets relative to each query start), with query 1
handled by subtracting the repeated component and scanning its span.

Hypothesis: in every query, the block of m rows at offset s is placed at
offset t (t < s) by the reference (or the mirror: t > s).  Uses aggregated
G[a][b] = sum_{q=2..28} v[qs_q+a] * L0[qs_q+b] so each hypothesis is O(m+s-t).
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

from localize_v3_prony import e_add, e_sub  # noqa: E402
from localize_v2 import lagrange_weights  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPEC = host.GOLDILOCKS
P = SPEC.p

SPAN = 170      # max within-query offset examined
MAXM = 12       # max moved-block size
MAXD = 80       # max move distance


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
    n = 1 << common.degree_bits

    st = np.load("/tmp/localizer_state.npz", allow_pickle=True)
    D = st["D"]
    polys = st["polys"]
    q_starts = [int(x) for x in st["q_starts"][:-1]]
    assert len(q_starts) == 28

    NPOL = 3
    V = [[int(x) for x in polys[j]] for j in range(NPOL)]
    D0 = [tuple(int(x) for x in D[j][0]) for j in range(NPOL)]

    print("weights at zeta...", flush=True)
    L0 = lagrange_weights(n, common.degree_bits, zeta)

    # aggregate G[j][a][b-a+MAXD] over queries 2..28 (index 1..27)
    qs_list = q_starts[1:]
    width = MAXM + MAXD + 1
    print("building G...", flush=True)
    G = [[[None] * (2 * width + 1) for _ in range(SPAN + width)]
         for _ in range(NPOL)]
    for j in range(NPOL):
        v = V[j]
        for a in range(SPAN + width):
            for db in range(-width, width + 1):
                acc = (0, 0)
                for qs in qs_list:
                    ra, rb = qs + a, qs + a + db
                    if rb < 0 or rb >= n or ra >= n:
                        continue
                    acc = e_add(acc, (v[ra] * L0[rb][0] % P,
                                      v[ra] * L0[rb][1] % P))
                G[j][a][db + width] = acc
    print("scanning hypotheses...", flush=True)

    # prefix sums over r of (G[j][r][m+width]-G[j][r][width]) per (j, m),
    # and the -m variant, so window sums are O(1)
    RMAX = SPAN + width - 1
    PS_fw = {}
    PS_bw = {}
    for j in range(NPOL):
        for m in range(1, MAXM + 1):
            acc = [(0, 0)]
            for r in range(RMAX):
                acc.append(e_add(acc[-1],
                                 e_sub(G[j][r][m + width], G[j][r][width])))
            PS_fw[(j, m)] = acc
            acc2 = [(0, 0)]
            for r in range(RMAX):
                acc2.append(e_add(acc2[-1],
                                  e_sub(G[j][r][(-m) + width],
                                        G[j][r][width])))
            PS_bw[(j, m)] = acc2

    def pred_rot_earlier(j, t, s, m):
        """block [s,s+m) moved to t (t<s): contributions for queries 2..28."""
        acc = (0, 0)
        for off in range(m):
            a = s + off
            acc = e_add(acc, e_sub(G[j][a][(t + off - a) + width],
                                   G[j][a][width]))
        ps = PS_fw[(j, m)]
        return e_add(acc, e_sub(ps[s], ps[t]))

    def pred_rot_later(j, s, t, m):
        """block [s,s+m) moved to t (t>s)."""
        acc = (0, 0)
        for off in range(m):
            a = s + off
            acc = e_add(acc, e_sub(G[j][a][(t + off - a) + width],
                                   G[j][a][width]))
        ps = PS_bw[(j, m)]
        return e_add(acc, e_sub(ps[t + m], ps[s + m]))

    # Query-1 residual check: given repeated component p for queries 2..28
    # and the same structural move in query 1 at unknown local offsets, we
    # first just report hypotheses whose residual D0 - pred is SMALL-support
    # (testable); simplest: also try the SAME offsets for query 1.
    q1 = q_starts[0]
    v0 = V

    # query-1 prefix sums per (j, m)
    Q1F = {}
    Q1B = {}
    for j in range(NPOL):
        v = v0[j]
        for m in range(1, MAXM + 1):
            acc = [(0, 0)]
            for r in range(q1, q1 + RMAX):
                acc.append(e_add(acc[-1],
                                 (v[r] * (L0[r + m][0] - L0[r][0]) % P,
                                  v[r] * (L0[r + m][1] - L0[r][1]) % P)))
            Q1F[(j, m)] = acc
            acc2 = [(0, 0)]
            for r in range(q1, q1 + RMAX):
                acc2.append(e_add(acc2[-1],
                                  (v[r] * (L0[r - m][0] - L0[r][0]) % P,
                                   v[r] * (L0[r - m][1] - L0[r][1]) % P)))
            Q1B[(j, m)] = acc2

    def q1_term_earlier(j, t, s, m):
        acc = (0, 0)
        v = v0[j]
        for off in range(m):
            a, b = q1 + s + off, q1 + t + off
            acc = e_add(acc, (v[a] * (L0[b][0] - L0[a][0]) % P,
                              v[a] * (L0[b][1] - L0[a][1]) % P))
        ps = Q1F[(j, m)]
        return e_add(acc, e_sub(ps[s], ps[t]))

    def q1_term_later(j, s, t, m):
        acc = (0, 0)
        v = v0[j]
        for off in range(m):
            a, b = q1 + s + off, q1 + t + off
            acc = e_add(acc, (v[a] * (L0[b][0] - L0[a][0]) % P,
                              v[a] * (L0[b][1] - L0[a][1]) % P))
        ps = Q1B[(j, m)]
        return e_add(acc, e_sub(ps[t + m], ps[s + m]))

    hits = []
    for m in range(1, MAXM + 1):
        for s in range(0, SPAN):
            for dist in range(1, MAXD + 1):
                t = s - dist
                if t >= 0:
                    ok = True
                    for j in range(NPOL):
                        if e_add(pred_rot_earlier(j, t, s, m),
                                 q1_term_earlier(j, t, s, m)) != D0[j]:
                            ok = False
                            break
                    if ok:
                        hits.append(("earlier", t, s, m))
                        print("HIT earlier", t, s, m, flush=True)
                t2 = s + dist
                if t2 + m <= SPAN + MAXD:
                    ok = True
                    for j in range(NPOL):
                        if e_add(pred_rot_later(j, s, t2, m),
                                 q1_term_later(j, s, t2, m)) != D0[j]:
                            ok = False
                            break
                    if ok:
                        hits.append(("later", s, t2, m))
                        print("HIT later", s, t2, m, flush=True)
        print(f"m={m} done", flush=True)
    print("hits:", hits[:10], flush=True)


if __name__ == "__main__":
    main()
