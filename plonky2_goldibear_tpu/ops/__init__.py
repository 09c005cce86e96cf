"""Pallas TPU kernels for the proving hot paths.

Modules here are the [NATIVE] tier of the framework (SURVEY.md §2 flags):
fused on-chip kernels that keep working state in VMEM instead of
round-tripping HBM between every permutation round / NTT stage.  Each kernel
has a pure-jnp twin elsewhere in the package which defines the semantics;
kernels are tested bit-exact against those twins and against the reference's
known-answer vectors.
"""
