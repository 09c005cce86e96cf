"""On-chip exactness audit for the BabyBear native tier (ops/ntt_bb.py,
ops/poseidon2_bb.py) plus a BB end-to-end prove+verify on the chip.

Run on TPU (or `cpu` arg for the interpret-mode sanity pass):
  python scripts/check_onchip_bb.py [cpu] [--no-prove]

Covers prove-relevant shapes: commit/iFFT sizes with odd batch counts, the
zero-prefix LDE path, the four-step split (n > 2^16), and the Poseidon2
column-batch permutation at Merkle-leaf batch sizes.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from plonky2_goldibear_tpu.field import bb
from plonky2_goldibear_tpu.field import fft as fftm

if "cpu" in sys.argv[1:]:
    # no TPU: run the Pallas kernels in interpret mode
    from plonky2_goldibear_tpu.ops import poseidon_gl as _pk

    _pk._INTERPRET = True

FAILS = []
RESULTS = {"checks": {}}


def check(name, got, want):
    g = np.asarray(got)
    w = np.asarray(want)
    ok = bool((g == w).all())
    RESULTS["checks"][name] = "pass" if ok else "FAIL"
    print(("PASS " if ok else "FAIL ") + name, flush=True)
    if not ok:
        FAILS.append(name)
        bad = np.argwhere(g != w)
        print("  first bad idx:", bad[:4].tolist(), flush=True)


def main():
    rng = np.random.default_rng(21)
    print("backend:", jax.default_backend(), flush=True)

    import plonky2_goldibear_tpu.ops.ntt_bb as NTTB

    for b, n, r in [(41, 1024, 0), (167, 1024, 0), (84, 1024, 0),
                    (41, 8192, 3), (167, 8192, 3), (2, 256, 0),
                    (3, 512, 0), (1, 1 << 17, 0)]:
        if r:
            small = rng.integers(0, bb.P, size=(b, n >> r), dtype=np.uint64)
            x = np.concatenate(
                [small, np.zeros((b, n - (n >> r)), dtype=np.uint64)],
                axis=1)
        else:
            x = rng.integers(0, bb.P, size=(b, n), dtype=np.uint64)
        g = bb.from_ints(x)
        got = jax.jit(lambda v, r=r: NTTB.fft(v, zero_prefix_log=r))(g)
        want = jax.jit(lambda v, r=r: fftm._fft_jnp(bb, v, None, r))(g)
        check(f"bb fft b{b} n{n} zp{r}", got, want)

    # structured zero-heavy input (the GL lazy-sub bug class trigger)
    x = rng.integers(0, bb.P, size=(8, 1024), dtype=np.uint64)
    x[:, ::2] = 0
    g = bb.from_ints(x)
    check("bb fft zero-heavy", jax.jit(NTTB.fft)(g),
          jax.jit(lambda v: fftm._fft_jnp(bb, v))(g))

    from plonky2_goldibear_tpu.hash import poseidon2_bb as H2
    import plonky2_goldibear_tpu.ops.poseidon2_bb as K2

    for batch in (128, 4096, 4096 + 128):
        vals = rng.integers(0, bb.P, size=(batch, H2.WIDTH), dtype=np.uint64)
        st = bb.from_ints(vals)
        got = jax.jit(K2.permute_cols)(st.T)
        os.environ["PLONKY2_TPU_DISABLE_POSEIDON"] = "1"
        try:
            want = jax.jit(H2.permute)(st).T
        finally:
            os.environ.pop("PLONKY2_TPU_DISABLE_POSEIDON", None)
        check(f"bb poseidon2 batch{batch}", got, want)
        for c in (0, batch - 1):
            host = H2.permute_host([int(v) for v in vals[c]])
            got_c = [int(v) for v in bb.to_ints(np.asarray(got)[:, c])]
            if got_c != host:
                FAILS.append(f"bb poseidon2 host batch{batch} col{c}")
                print(f"FAIL bb poseidon2 host col{c}", flush=True)

    if "--no-prove" not in sys.argv[1:]:
        from plonky2_goldibear_tpu.field.host import BABYBEAR
        from plonky2_goldibear_tpu.iop.generator import seed_randomness
        from plonky2_goldibear_tpu.iop.witness import PartialWitness
        from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
        from plonky2_goldibear_tpu.plonk.config import CircuitConfig
        from plonky2_goldibear_tpu.plonk.verifier import verify

        seed_randomness(7)
        size_log = int(os.environ.get("SIZE_LOG", "9"))
        builder = CircuitBuilder(CircuitConfig.standard_recursion_config_bb(),
                                 spec=BABYBEAR, F=bb, hasher=H2)
        x = builder.add_virtual_target()
        builder.register_public_input(x)
        cur = x
        for _ in range((1 << size_log) * 20):
            cur = builder.arithmetic(1, 1, cur, cur, cur)
        builder.register_public_input(cur)
        t0 = time.time()
        data = builder.build()
        print("bb build s:", round(time.time() - t0, 1),
              "degree_bits:", data.common.degree_bits, flush=True)
        pw = PartialWitness()
        pw.set_target(x, 3)
        t1 = time.time()
        proof = data.prove(pw)
        prove_s = round(time.time() - t1, 2)
        print("bb prove s:", prove_s, flush=True)
        RESULTS["bb_prove"] = {"degree_bits": data.common.degree_bits,
                               "prove_s_cold": prove_s}
        try:
            verify(proof, data.verifier_only, data.common, hasher=H2)
            RESULTS["bb_prove"]["verify"] = "OK"
            print("BB VERIFY OK", flush=True)
        except Exception as e:
            FAILS.append("bb e2e prove")
            RESULTS["bb_prove"]["verify"] = f"FAIL {type(e).__name__}"
            print("BB VERIFY FAIL:", type(e).__name__, str(e)[:300],
                  flush=True)
        else:
            # warm prove for an honest steady-state number
            t2 = time.time()
            data.prove(pw)
            RESULTS["bb_prove"]["prove_s_warm"] = round(time.time() - t2, 2)

    RESULTS["backend"] = jax.default_backend()
    RESULTS["device_kind"] = jax.devices()[0].device_kind
    RESULTS["status"] = "ALL PASS" if not FAILS else f"FAILURES: {FAILS}"
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "onchip_bb_r5.json")
    with open(out, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(("ALL PASS" if not FAILS else f"FAILURES: {FAILS}"), flush=True)
    sys.exit(1 if FAILS else 0)


if __name__ == "__main__":
    main()
