"""Row-divergence localizer v8: virtual re-emitter.

Replays the captured emission event stream (/tmp/event_stream.pkl) through
slot mechanics to regenerate the row-TYPE sequence, then tests single-op
edit hypotheses — DELETE op i / INSERT a duplicate op of kind K at i — by
replaying the edited stream and comparing the predicted selector-poly
openings at zeta (incrementally, only over changed rows) to the reference.
Survivors are verified at the other 28 evaluation points.

An op hypothesis that matches identifies the exact CODE SITE (the op's
caller chain) where our emission departs from the reference.
"""

import os
import pickle
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
UN = ((1 << 32) - 1) % P


def replay(events, n_total):
    """events -> list of gate-id per row (emission region only)."""
    rows = []
    slots = {}  # (gid, key) -> remaining ops in current row
    for ev in events:
        if ev[0] == "add":
            rows.append(ev[2])
        else:
            _, _row, _slot, gid, key, num_ops, _ = ev
            k = (gid, key)
            rem = slots.get(k, 0)
            if rem == 0:
                rows.append(gid)
                rem = num_ops
            rem -= 1
            if rem == 0:
                slots.pop(k, None)
            else:
                slots[k] = rem
    return rows


def selector_values(row_gids, gates_sorted, groups):
    """gate-id per row -> selector poly value arrays (3 groups)."""
    index = {g: i for i, g in enumerate(gates_sorted)}
    gidx = []
    for i in range(len(gates_sorted)):
        gidx.append(next(k for k, (a, b) in enumerate(groups)
                         if a <= i < b))
    out = [[], [], []]
    for gid in row_gids:
        i = index[gid]
        gr = gidx[i]
        for g in range(3):
            out[g].append(i if g == gr else UN)
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

    events = pickle.load(open("/tmp/event_stream.pkl", "rb"))
    print(f"{len(events)} events", flush=True)

    gates_sorted = [g.id() for g in common.gates]

    def full_gid(gid):
        # event op gids are truncated prefixes; map back to full ids
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

    base_rows = replay(events, n)
    n_user = len(base_rows)
    tail = [pi_id] + [noop_id] * (n - n_user - 1)
    base_rows_full = base_rows + tail
    assert len(base_rows_full) == n

    # cross-check against the localizer state's selector polys
    st = np.load("/tmp/localizer_state.npz", allow_pickle=True)
    polys = st["polys"]
    D = st["D"]
    sel_base = selector_values(base_rows_full, gates_sorted, groups)
    for g in range(3):
        assert [int(x) for x in polys[g]] == sel_base[g], f"replay mismatch g={g}"
    print("replay reproduces the actual selector polys", flush=True)

    points = [zeta]
    shift = SPEC.coset_shift
    g17 = SPEC.two_adic_generator(lde_bits)
    for x_index in q_indices:
        nat = host.reverse_bits(x_index, lde_bits)
        points.append((shift * pow(g17, nat, P) % P, 0))
    npts = len(points)
    Dv = [[tuple(int(x) for x in D[j][i]) for i in range(npts)]
          for j in range(3)]

    print("weights at zeta...", flush=True)
    L0 = lagrange_weights(n, common.degree_bits, zeta)

    # base evals at zeta
    base_eval = []
    for g in range(3):
        acc = (0, 0)
        v = sel_base[g]
        for r in range(n):
            acc = e_add(acc, (v[r] * L0[r][0] % P, v[r] * L0[r][1] % P))
        base_eval.append(acc)

    op_idx = [i for i, ev in enumerate(events) if ev[0] == "op"]
    print(f"{len(op_idx)} op events; scanning edits...", flush=True)

    def eval_delta(new_rows):
        """evaluation delta of the 3 selector polys vs base, only over
        rows where the type differs."""
        sel_new = None
        deltas = [(0, 0), (0, 0), (0, 0)]
        new_full = new_rows + [pi_id] + [noop_id] * (n - len(new_rows) - 1)
        if len(new_full) != n:
            return None
        index = {gid: i for i, gid in enumerate(gates_sorted)}
        gidx = [next(k for k, (a, b) in enumerate(groups) if a <= i < b)
                for i in range(len(gates_sorted))]
        for r in range(n):
            a, b = base_rows_full[r], new_full[r]
            if a == b:
                continue
            ia, ib = index[a], index[b]
            for g in range(3):
                va = ia if gidx[ia] == g else UN
                vb = ib if gidx[ib] == g else UN
                if va != vb:
                    deltas[g] = e_add(deltas[g],
                                      ((vb - va) * L0[r][0] % P,
                                       (vb - va) * L0[r][1] % P))
        return deltas

    target = [e_sub(Dv[g][0], (0, 0)) for g in range(3)]

    hits = []
    # hypothesis 1: DELETE op i (reference emits one fewer op here)
    # hypothesis 2: INSERT a duplicate of op i right before it
    for which in ("del", "ins"):
        seen_keys = set()
        for i in op_idx:
            ev = events[i]
            # dedup: editing two attaching ops of the same (kind, position
            # in row cycle) gives identical row sequences; key on the
            # replayed state is overkill — just test all (cheap enough)
            if which == "del":
                cand = events[:i] + events[i + 1:]
            else:
                cand = events[:i] + [ev] + events[i:]
            rows2 = replay(cand, n)
            if len(rows2) + 1 + (n - len(rows2) - 1) != n:
                continue
            d = eval_delta(rows2)
            if d is None:
                continue
            if all(d[g] == target[g] for g in range(3)):
                hits.append((which, i, ev[3], ev[4], ev[6][-120:]))
                print("HIT:", which, i, ev[3], ev[4], flush=True)
        print(f"{which} scan done", flush=True)
    print("hits:", len(hits), flush=True)
    with open("/tmp/v8_hits.txt", "w") as f:
        for h in hits:
            f.write(repr(h) + "\n")


if __name__ == "__main__":
    main()
