"""STARK engine (L4) — TPU-native counterpart of the reference's src/starkpil.

Modules:
  expr       — constraint-expression IR + JAX compiler (replaces generated
               chelpers, src/starkpil/*/chelpers/, 244k LoC of AVX code:
               here the op DAG is traced once into one fused XLA program)
  air        — AIR (PIL-equivalent) description of a state machine
  setup      — eSTARK setup: h1h2/z/quotient/evMap/FRI-poly plans
               (the role of pil-stark's starkinfo generation)
  stark_info — parser/serializer for the reference starkinfo.json schema
  prover     — 5-phase eSTARK prover (reference: src/starkpil/starks.cpp)
  fri        — FRI commit/fold/query (reference: src/starkpil/fri/)
  proof      — proof container + JSON (reference: fri/friProof.hpp)
  verifier   — full STARK verifier (the oracle role of the JS pil-stark stack)
"""
