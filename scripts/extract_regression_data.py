"""Extract the reference's committed regression test data (serialized
CommonCircuitData / VerifierOnlyCircuitData / proof bytes of the GL
recursive verifier) into binary files for compatibility tests.
Source: /root/reference/plonky2/src/recursion/regression_test_data.rs"""
import re

SRC = "/root/reference/plonky2/src/recursion/regression_test_data.rs"
text = open(SRC).read()

for name, out in [
    ("RECURSIVE_VERIFIER_GL_COMMON_DATA", "gl_regression_common.bin"),
    ("RECURSIVE_VERIFIER_GL_VERIFIER_DATA", "gl_regression_verifier.bin"),
    ("RECURSIVE_VERIFIER_GL_PROOF", "gl_regression_proof.bin"),
]:
    m = re.search(re.escape(name) + r":\s*\[u8;\s*(\d+)\]\s*=\s*\[(.*?)\];",
                  text, re.S)
    assert m, name
    n = int(m.group(1))
    vals = bytes(int(x) for x in re.findall(r"\d+", m.group(2)))
    assert len(vals) == n, (name, len(vals), n)
    with open(f"/root/repo/tests/data/{out}", "wb") as f:
        f.write(vals)
    print(out, n)
