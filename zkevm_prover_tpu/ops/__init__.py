"""L0 primitives: Goldilocks field, cubic extension, NTT/LDE, Poseidon, Merkle.

TPU-native replacements for the reference's native crypto layer
(SURVEY.md §2.1): the AVX2/AVX512/asm paths become vectorized JAX ops and
Pallas kernels.
"""
