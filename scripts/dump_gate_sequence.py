"""Dump the outer regression circuit's gate-instance sequence with Python
call-stack provenance, for row-placement comparison against the reference
emission flow (the digest-identity workstream's positional oracle).

Writes /tmp/gate_seq.txt: one line per gate instance
    row  gate_id  constants  caller-chain
plus a per-type count summary at the top.
"""

import os
import sys
import traceback

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder  # noqa: E402
from plonky2_goldibear_tpu.plonk.config import CircuitConfig  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(HERE, "scripts"))
from compare_regression_build import build_inner, build_outer  # noqa: E402

SKIP = {"add_gate", "find_slot", "_add_base_arithmetic_operation",
        "_compute_arithmetic_extension_operation", "arithmetic",
        "_compute_mul_extension_operation", "arithmetic_extension",
        "mul", "add", "sub", "mul_add", "mul_sub", "mul_const_add",
        "mul_extension", "add_extension", "sub_extension",
        "mul_add_extension", "mul_sub_extension", "mul_const_extension",
        "mul_extension_with_const", "square_extension", "cube_extension",
        "mul_many_extension", "scalar_mul_ext", "scalar_mul_add_extension",
        "mul_const", "square", "cube", "mul_many", "add_many",
        "add_const_extension", "exp_u64_extension", "<listcomp>",
        "<genexpr>"}

records = []
ops = []
orig_add_gate = CircuitBuilder.add_gate
orig_find_slot = CircuitBuilder.find_slot


def _chain(skip_self):
    stack = traceback.extract_stack(limit=16)
    return ">".join(f.name for f in stack
                    if f.name not in SKIP and f.name != skip_self)


events = []  # merged, true emission order: ("add"|"op", ...)
_IN_FIND_SLOT = [False]


def traced_add_gate(self, gate, constants):
    row = orig_add_gate(self, gate, constants)
    stack = traceback.extract_stack(limit=14)
    chain = [f.name for f in stack
             if f.name not in SKIP and f.name != "traced_add_gate"]
    records.append((row, gate.id(), tuple(constants), ">".join(chain[-5:])))
    if not _IN_FIND_SLOT[0]:
        events.append(("add", row, gate.id(), ">".join(chain[-4:])))
    return row


def traced_find_slot(self, gate, params, constants):
    _IN_FIND_SLOT[0] = True
    try:
        row, slot = orig_find_slot(self, gate, params, constants)
    finally:
        _IN_FIND_SLOT[0] = False
    gid = gate.id().split(" ")[0].split("{")[0]
    key = tuple(int(x) for x in params)
    num_ops = gate.num_ops
    ops.append((row, slot, gid, key, _chain("traced_find_slot")))
    events.append(("op", row, slot, gid, key, num_ops,
                   _chain("traced_find_slot")))
    return row, slot


class _InnerShim:
    """Stands in for the built inner circuit: build_outer only needs
    .common, and ours is byte-identical to the committed reference bytes."""

    def __init__(self, common):
        self.common = common


def main():
    from plonky2_goldibear_tpu.plonk import serialization as ser

    config = CircuitConfig.standard_recursion_zk_config_gl()
    cache = "/tmp/inner_common.bin"
    if os.path.exists(cache):
        print("using cached inner common...", flush=True)
        inner = _InnerShim(
            ser.read_common_circuit_data(open(cache, "rb").read()))
    else:
        print("building inner...", flush=True)
        inner = build_inner(config)
        open(cache, "wb").write(
            ser.write_common_circuit_data(inner.common))

    CircuitBuilder.add_gate = traced_add_gate
    CircuitBuilder.find_slot = traced_find_slot
    records.clear()
    ops.clear()
    print("emitting outer circuit (no build)...", flush=True)
    from plonky2_goldibear_tpu.recursion import recursive_verifier as rv
    b = CircuitBuilder(config)
    pt = rv.add_virtual_proof_with_pis(b, inner.common)
    vk_t = rv.add_virtual_verifier_data(b, config.fri_config.cap_height)
    rv.verify_proof(b, pt, vk_t, inner.common)

    class _O:
        class common:
            degree = len(b.gate_instances)
    outer = _O()
    CircuitBuilder.add_gate = orig_add_gate
    CircuitBuilder.find_slot = orig_find_slot

    # op-level stream: aggregate into contiguous segments of identical
    # (caller chain); write counts per segment for reference comparison
    with open("/tmp/op_segments.txt", "w") as f:
        seg_chain = None
        seg_counts = {}
        seg_start = 0
        for k, (row, slot, gid, params, chain) in enumerate(ops):
            if chain != seg_chain:
                if seg_chain is not None:
                    c = " ".join(f"{g}:{n}" for g, n in seg_counts.items())
                    f.write(f"op{seg_start:<7} {c:40s} {seg_chain[-150:]}\n")
                seg_chain = chain
                seg_counts = {}
                seg_start = k
            key = gid + str(list(params))
            seg_counts[key] = seg_counts.get(key, 0) + 1
        if seg_chain is not None:
            c = " ".join(f"{g}:{n}" for g, n in seg_counts.items())
            f.write(f"op{seg_start:<7} {c:40s} {seg_chain[-150:]}\n")
    with open("/tmp/op_stream.txt", "w") as f:
        for row, slot, gid, params, chain in ops:
            f.write(f"{row:6d}.{slot:<2d} {gid:26s} {list(params)!s:24s} "
                    f"{chain[-130:]}\n")
    print(f"wrote /tmp/op_segments.txt + /tmp/op_stream.txt "
          f"({len(ops)} ops)", flush=True)
    import pickle
    with open("/tmp/event_stream.pkl", "wb") as f:
        pickle.dump(events, f)
    print(f"wrote /tmp/event_stream.pkl ({len(events)} events)", flush=True)

    from collections import Counter
    counts = Counter(gid for _, gid, _, _ in records)
    with open("/tmp/gate_seq.txt", "w") as f:
        f.write(f"total gate instances: {len(records)} "
                f"(degree {outer.common.degree})\n")
        for gid, n in counts.most_common():
            f.write(f"  {n:6d}  {gid}\n")
        f.write("\n")
        for row, gid, consts, chain in records:
            c = "" if not consts else str(list(consts))
            f.write(f"{row:6d}  {gid}  {c}  {chain}\n")
    print("wrote /tmp/gate_seq.txt", flush=True)
    for gid, n in counts.most_common():
        print(f"  {n:6d}  {gid}")


if __name__ == "__main__":
    main()
