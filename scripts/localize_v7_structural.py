"""Row-divergence localizer v7: per-query STRUCTURAL group moves.

Parse /tmp/gate_seq.txt (row, gate-type, caller) records, split the query
region into per-query group lists (maximal runs of identical (type, tag)),
and test every hypothesis "group X (same size m in all queries) is placed
before group Y in the reference" — with per-query positions taken from the
ACTUAL rows, so heterogeneous first-query layouts are handled.
Verified at zeta; survivors re-verified at 5 more points.
"""

import os
import re
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


def parse_records():
    lines = open("/tmp/gate_seq.txt").read().splitlines()
    start = lines.index("") + 1
    rows = []
    for ln in lines[start:]:
        m = re.match(r"\s*(\d+)\s\s(\S.*?)\s\s(\[.*?\]\s\s)?(\S+)$", ln)
        if not m:
            continue
        row = int(m.group(1))
        gid = m.group(2).split("{")[0].split("<")[0].strip()
        chain = m.group(4)
        # tag: last two meaningful frames
        parts = [p for p in chain.split(">") if p not in
                 ("traced_find_slot", "_chain", "<module>", "main")]
        tag = ">".join(parts[-2:])
        rows.append((row, gid, tag))
    return rows


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
    q_starts = [int(x) for x in st["q_starts"][:-1]]

    NPOL = 3
    V = [[int(x) for x in polys[j]] for j in range(NPOL)]
    Dv = [[tuple(int(x) for x in D[j][i]) for i in range(D.shape[1])]
          for j in range(NPOL)]

    records = parse_records()
    end_user = max(r for r, _, _ in records) + 1

    # per-query group lists
    bounds = q_starts + [end_user]
    queries = []
    for qi in range(28):
        lo, hi = bounds[qi], bounds[qi + 1]
        rs = [(r, g, t) for (r, g, t) in records if lo <= r < hi]
        groups = []
        for r, g, t in rs:
            if groups and groups[-1][1] == (g, t):
                groups[-1][2].append(r)
            else:
                groups.append([len(groups), (g, t), [r]])
        queries.append(groups)

    # group signatures present in ALL queries with identical size
    sig_counts = {}
    for groups in queries:
        seen = {}
        for _, key, rws in groups:
            seen.setdefault(key, []).append(len(rws))
        for key, sizes in seen.items():
            sig_counts.setdefault(key, []).append(tuple(sizes))
    movable = []
    for key, per_q in sig_counts.items():
        if len(per_q) == 28 and all(p == per_q[0] for p in per_q) and \
                len(per_q[0]) >= 1 and per_q[0][0] <= 4:
            movable.append((key, per_q[0]))
    print(f"group kinds: {len(sig_counts)}, movable: {len(movable)}",
          flush=True)

    print("weights at zeta...", flush=True)
    L0 = lagrange_weights(n, common.degree_bits, zeta)

    def move_term(v, L, s, t, m):
        """block [s,s+m) moved to t (either direction)."""
        acc = (0, 0)
        if t < s:
            for off in range(m):
                a = s + off
                acc = e_add(acc, (v[a] * (L[t + off][0] - L[a][0]) % P,
                                  v[a] * (L[t + off][1] - L[a][1]) % P))
            for r in range(t, s):
                acc = e_add(acc, (v[r] * (L[r + m][0] - L[r][0]) % P,
                                  v[r] * (L[r + m][1] - L[r][1]) % P))
        else:
            for off in range(m):
                a = s + off
                acc = e_add(acc, (v[a] * (L[t + off][0] - L[a][0]) % P,
                                  v[a] * (L[t + off][1] - L[a][1]) % P))
            for r in range(s + m, t + m):
                acc = e_add(acc, (v[r] * (L[r - m][0] - L[r][0]) % P,
                                  v[r] * (L[r - m][1] - L[r][1]) % P))
        return acc

    # hypotheses: move occurrence #oi of group kind A to sit right before
    # group kind B occurrence #bi (per query).
    hyps = []
    for (ka, sizes_a) in movable:
        for oi in range(len(sizes_a)):
            m = sizes_a[oi]
            for (kb, sizes_b) in sig_counts.items():
                if len(sizes_b) != 28 or any(p != sizes_b[0]
                                             for p in sizes_b):
                    continue
                for bi in range(len(sizes_b[0])):
                    if ka == kb and oi == bi:
                        continue
                    hyps.append((ka, oi, m, kb, bi))
    print(f"hypotheses: {len(hyps)}", flush=True)

    hits = []
    for hi_, (ka, oi, m, kb, bi) in enumerate(hyps):
        ok = True
        for j in range(NPOL):
            v = V[j]
            acc = (0, 0)
            valid = True
            for groups in queries:
                ga = [g for g in groups if g[1] == ka]
                gb = [g for g in groups if g[1] == kb]
                if oi >= len(ga) or bi >= len(gb):
                    valid = False
                    break
                s = ga[oi][2][0]
                t = gb[bi][2][0]
                if s == t:
                    valid = False
                    break
                if abs(s - t) > 200:
                    valid = False
                    break
                acc = e_add(acc, move_term(v, L0, s, t, m))
            if not valid or acc != Dv[j][0]:
                ok = False
                break
        if ok:
            hits.append((ka, oi, m, kb, bi))
            print("HIT:", ka, oi, "->before", kb, bi, flush=True)
    print("total hits:", len(hits), flush=True)


if __name__ == "__main__":
    main()
