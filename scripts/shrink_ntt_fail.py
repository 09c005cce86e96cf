"""Shrink the captured NTT failure (replay_ntt_dump found ntt_0000:
(84,1024) r=0, 32 bad outputs in row 83) to a minimal repro.

Usage: python scripts/shrink_ntt_fail.py [cpu] [/tmp/nttdump/ntt_0000.npz]
  cpu -> run the Pallas kernel in interpret mode on CPU: distinguishes a
         kernel-logic bug (interpret also wrong) from a Mosaic/TPU lowering
         bug (interpret matches jnp).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from plonky2_goldibear_tpu.field.gl import GL
from plonky2_goldibear_tpu.ops import poseidon_gl as PK

if "cpu" in sys.argv[1:]:
    PK._INTERPRET = True

from plonky2_goldibear_tpu.ops import ntt as ntt_ops


def run(xlo, xhi, r=0):
    x = GL(jax.numpy.asarray(xlo), jax.numpy.asarray(xhi))
    out = ntt_ops.fft(x, zero_prefix_log=r)
    return (np.asarray(jax.device_get(out.lo)),
            np.asarray(jax.device_get(out.hi)))


def main():
    path = [a for a in sys.argv[1:] if a != "cpu"]
    path = path[0] if path else "/tmp/nttdump/ntt_0000.npz"
    z = np.load(path)
    xlo, xhi, olo, ohi = z["xlo"], z["xhi"], z["olo"], z["ohi"]
    print("backend:", jax.default_backend(), "interpret:", PK._INTERPRET,
          "shape:", xlo.shape, flush=True)

    def diff(tag, rows):
        glo, ghi = run(xlo[rows], xhi[rows])
        bad = (glo != olo[rows]) | (ghi != ohi[rows])
        nb = int(bad.sum())
        locs = np.argwhere(bad)
        print(f"{tag}: shape={glo.shape} nbad={nb} "
              f"bad_rows={sorted(set(int(r) for r, _ in locs))[:8]} "
              f"bad_cols_row_last={[int(c) for r, c in locs if r == locs[-1][0]][:40] if nb else []}",
              flush=True)
        return nb

    diff("full-84", slice(None))
    diff("last4-(80:84)", slice(80, 84))
    diff("last1-(83:84)", slice(83, 84))
    diff("first4-(0:4)", slice(0, 4))
    # row 83 replicated to batch 4 (same tile geometry as last tile)
    rep = np.broadcast_to(xlo[83], (4, xlo.shape[1])).copy()
    reph = np.broadcast_to(xhi[83], (4, xhi.shape[1])).copy()
    glo, ghi = run(rep, reph)
    bad = (glo != np.broadcast_to(olo[83], glo.shape)) | \
          (ghi != np.broadcast_to(ohi[83], ghi.shape))
    print(f"row83x4: nbad={int(bad.sum())} "
          f"per_row={[int(b.sum()) for b in bad]}", flush=True)


if __name__ == "__main__":
    main()
