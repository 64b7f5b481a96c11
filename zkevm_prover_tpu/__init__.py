"""zkevm_prover_tpu — a TPU-native zkEVM proving framework.

A from-scratch re-design of the capabilities of the reference C++ zkEVM prover
(c0rv4x/zkevm-prover) for TPU hardware: the compute path is JAX/XLA/Pallas
(Goldilocks field, NTT/LDE, Poseidon, Merkle trees, the 5-phase eSTARK prover
and FRI), orchestrated over `jax.sharding.Mesh` device meshes instead of
OpenMP/AVX/pthreads.

The framework requires 64-bit integer support in JAX (Goldilocks elements are
uint64); importing this package enables jax_enable_x64.

Layer map (mirrors SURVEY.md §1 of the reference):
  ops/       — L0 field & hash primitives (goldilocks, gl3, ntt, poseidon,
               keccak, merkle) as JAX/Pallas kernels
  stark/     — L4 STARK engine (stark_info, expressions, fri, starks, verifier,
               setup) — reference: src/starkpil/
  parallel/  — mesh/sharding utilities, multi-chip NTT & Merkle
  executor/  — L3 arithmetization front-end (state machines)
  services/  — L7 gRPC service shells (aggregator/executor/hashdb)
  utils/     — L1 config, logging, timers
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
