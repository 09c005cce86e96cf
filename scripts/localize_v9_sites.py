"""Row-divergence localizer v9: per-query systematic event edits on the
virtual re-emitter.

Group emission events by CODE SITE (caller chain + gate kind) and
within-query ordinal; hypotheses are applied at the SAME site in EVERY
query simultaneously:
  (a) delete the k-th op/add of site S in each query
  (b) duplicate it
  (c) relocate ALL events of site S to just before the first event of
      site T within each query (both directions of interleaving)
Replay the edited stream, compare selector openings at zeta.
"""

import os
import pickle
import sys
from collections import defaultdict

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
from localize_v8_reemit import replay, selector_values  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPEC = host.GOLDILOCKS
P = SPEC.p
UN = ((1 << 32) - 1) % P


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

    events = pickle.load(open("/tmp/event_stream.pkl", "rb"))
    gates_sorted = [g.id() for g in common.gates]

    def full_gid(gid):
        for g in gates_sorted:
            if g.startswith(gid):
                return g
        raise KeyError(gid)

    events = [ev if ev[0] == "add" else
              (ev[0], ev[1], ev[2], full_gid(ev[3]), ev[4], ev[5], ev[6])
              for ev in events]

    groups = [tuple(g) for g in common.selectors_info.groups]
    noop_id = "NoopGate"
    pi_id = next(g for g in gates_sorted if g.startswith("PublicInputGate"))

    # query boundaries in event-index space: the low_bits split_le BaseSum
    # "add" events come in pairs at each query start
    qb = [i for i, ev in enumerate(events)
          if ev[0] == "add" and "low_bits>split_le" in ev[3]]
    q_starts_ev = qb[0::2]
    assert len(q_starts_ev) == 28, len(q_starts_ev)
    bounds = q_starts_ev + [len(events)]

    def site_of(ev):
        if ev[0] == "add":
            return ("add", ev[2].split("{")[0].split("<")[0], ev[3])
        return ("op", ev[3].split("{")[0].split("<")[0], ev[6])

    # per-query: list of (site, ordinal) per event
    per_q_sites = []
    for qi in range(28):
        lo, hi = bounds[qi], bounds[qi + 1]
        cnt = defaultdict(int)
        lst = []
        for i in range(lo, hi):
            s = site_of(events[i])
            lst.append((i, s, cnt[s]))
            cnt[s] += 1
        per_q_sites.append(lst)

    # sites with uniform per-query count
    site_counts = defaultdict(list)
    for lst in per_q_sites:
        c = defaultdict(int)
        for _, s, _ in lst:
            c[s] += 1
        for s, k in c.items():
            site_counts[s].append(k)
    uniform = {s: ks[0] for s, ks in site_counts.items()
               if len(ks) == 28 and all(k == ks[0] for k in ks)}
    print(f"sites: {len(site_counts)}, uniform across queries: "
          f"{len(uniform)}", flush=True)

    base_rows = replay(events, n)
    base_full = base_rows + [pi_id] + [noop_id] * (n - len(base_rows) - 1)
    sel_base = selector_values(base_full, gates_sorted, groups)

    st = np.load("/tmp/localizer_state.npz", allow_pickle=True)
    D = st["D"]
    target = [tuple(int(x) for x in D[g][0]) for g in range(3)]

    print("weights at zeta...", flush=True)
    L0 = lagrange_weights(n, common.degree_bits, zeta)

    index = {gid: i for i, gid in enumerate(gates_sorted)}
    gidx = [next(k for k, (a, b) in enumerate(groups) if a <= i < b)
            for i in range(len(gates_sorted))]

    def check(new_events):
        rows2 = replay(new_events, n)
        if len(rows2) + 1 > n:
            return False
        new_full = rows2 + [pi_id] + [noop_id] * (n - len(rows2) - 1)
        deltas = [(0, 0)] * 3
        for r in range(n):
            a, b = base_full[r], new_full[r]
            if a == b:
                continue
            ia, ib = index[a], index[b]
            for g in range(3):
                va = ia if gidx[ia] == g else UN
                vb = ib if gidx[ib] == g else UN
                if va != vb:
                    deltas[g] = e_add(
                        deltas[g], ((vb - va) * L0[r][0] % P,
                                    (vb - va) * L0[r][1] % P))
        return all(deltas[g] == target[g] for g in range(3))

    hits = []

    # (a)/(b): delete/duplicate ordinal k of site S in every query
    for s, cnt in uniform.items():
        for k in range(cnt):
            idxs = []
            for lst in per_q_sites:
                idxs.extend(i for i, ss, o in lst if ss == s and o == k)
            idel = set(idxs)
            ev_del = [e for i, e in enumerate(events) if i not in idel]
            if check(ev_del):
                hits.append(("del", s, k))
                print("HIT del", s, k, flush=True)
            ev_dup = []
            for i, e in enumerate(events):
                if i in idel:
                    ev_dup.append(e)
                ev_dup.append(e)
            if check(ev_dup):
                hits.append(("dup", s, k))
                print("HIT dup", s, k, flush=True)
    print("(a)/(b) done", flush=True)

    # (c): relocate all events of site S to just before the first event of
    # site T, per query
    usites = list(uniform)
    for s in usites:
        for t in usites:
            if s == t:
                continue
            new_events = list(events)
            moves = []
            okq = True
            for lst in per_q_sites:
                s_idx = [i for i, ss, _ in lst if ss == s]
                t_idx = [i for i, ss, _ in lst if ss == t]
                if not s_idx or not t_idx:
                    okq = False
                    break
                moves.append((s_idx, t_idx[0]))
            if not okq:
                continue
            moved = set()
            for s_idx, _ in moves:
                moved.update(s_idx)
            out = []
            for i, e in enumerate(events):
                for s_idx, t0 in moves:
                    if i == t0:
                        out.extend(events[j] for j in s_idx if j > t0)
                if i in moved and any(i > t0 for s_idx, t0 in moves
                                      if i in s_idx):
                    continue
                out.append(e)
            if len(out) != len(events):
                continue
            if check(out):
                hits.append(("move", s, "before", t))
                print("HIT move", s, "->", t, flush=True)
    print("(c) done; hits:", hits, flush=True)


if __name__ == "__main__":
    main()
