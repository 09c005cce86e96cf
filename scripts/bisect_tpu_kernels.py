"""Bisect the TPU-prove vanishing failure across the three ops/ kernel
dispatch points by re-running the minimal repro with each one disabled.

Usage: python scripts/bisect_tpu_kernels.py [ntt|merkle|poseidon|none|all]

Each mode is a separate prove (fresh jitted programs -> cold compiles the
first time), so run modes one at a time; results append to
/tmp/bisect_tpu.log.  `none` = all kernels enabled (baseline repro);
`all` = all kernels disabled (pure-jnp on TPU: discriminates ops/ kernels
vs XLA:TPU-backend semantics).
"""

import os
import subprocess
import sys

MODES = {
    "none": {},
    "ntt": {"PLONKY2_TPU_DISABLE_NTT": "1"},
    "merkle": {"PLONKY2_TPU_DISABLE_MERKLE": "1"},
    "poseidon": {"PLONKY2_TPU_DISABLE_POSEIDON": "1"},
    "all": {"PLONKY2_TPU_DISABLE_NTT": "1",
            "PLONKY2_TPU_DISABLE_MERKLE": "1",
            "PLONKY2_TPU_DISABLE_POSEIDON": "1"},
}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "none"
    if mode not in MODES:
        print(f"usage: bisect_tpu_kernels.py [{'|'.join(MODES)}]",
              file=sys.stderr)
        sys.exit(2)
    env = dict(os.environ)
    env.update(MODES[mode])
    env.setdefault("SIZE_LOG", "9")
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        proc = subprocess.run(
            [sys.executable, "-u", os.path.join(here, "repro_tpu_prove.py")],
            env=env, capture_output=True, text=True, timeout=3600)
        verdict = [l for l in proc.stdout.splitlines() if "VERIFY" in l]
        line = f"mode={mode} size={env['SIZE_LOG']} -> " + (
            verdict[-1] if verdict else f"no-verdict rc={proc.returncode}")
        tail = proc.stdout[-2000:]
    except subprocess.TimeoutExpired as e:
        line = f"mode={mode} size={env['SIZE_LOG']} -> timeout after {e.timeout}s"
        tail = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) \
            else (e.stdout or "")
    print(line, flush=True)
    print(tail[-2000:], flush=True)
    with open("/tmp/bisect_tpu.log", "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
