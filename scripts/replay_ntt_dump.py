"""Replay CPU-captured NTT calls (PLONKY2_TPU_NTT_DUMP) through the Pallas
kernel on TPU and diff against the jnp ground-truth outputs.

Usage:
  mkdir -p /tmp/nttdump
  SIZE_LOG=9 PLONKY2_TPU_NTT_DUMP=/tmp/nttdump python scripts/repro_tpu_prove.py cpu
  python scripts/replay_ntt_dump.py /tmp/nttdump

Each mismatch line reports the call sequence number, shape, zero_prefix_log
and the first divergent flat index with both values — the culprit call on
*real prove data* (random-input audits missed it).
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from plonky2_goldibear_tpu.field.gl import GL
from plonky2_goldibear_tpu.ops import ntt as ntt_ops


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nttdump"
    files = sorted(glob.glob(os.path.join(d, "ntt_*.npz")))
    assert files, f"no dumps in {d}"
    print("backend:", jax.default_backend(), "files:", len(files), flush=True)
    n_bad = 0
    for f in files:
        z = np.load(f)
        x = GL(jax.numpy.asarray(z["xlo"]), jax.numpy.asarray(z["xhi"]))
        r = int(z["r"])
        out = ntt_ops.fft(x, zero_prefix_log=r)
        olo = np.asarray(jax.device_get(out.lo))
        ohi = np.asarray(jax.device_get(out.hi))
        bad = (olo != z["olo"]) | (ohi != z["ohi"])
        nbad = int(bad.sum())
        if nbad:
            n_bad += 1
            idx = np.argwhere(bad)[0]
            t = tuple(int(v) for v in idx)
            got = (int(olo[t]) | (int(ohi[t]) << 32))
            want = (int(z["olo"][t]) | (int(z["ohi"][t]) << 32))
            xin = (int(z["xlo"][t]) | (int(z["xhi"][t]) << 32))
            print(f"MISMATCH {os.path.basename(f)} shape={olo.shape} r={r} "
                  f"nbad={nbad} first_idx={t} got={got} want={want} "
                  f"x_at_idx={xin}", flush=True)
        else:
            print(f"ok {os.path.basename(f)} shape={olo.shape} r={r}",
                  flush=True)
    print(f"DONE bad_calls={n_bad}/{len(files)}", flush=True)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
