"""Prover orchestration (L6).

Framework counterpart of the reference's src/prover (SURVEY.md §2.5):
the Prover owns the executor and the STARK engines, runs a request queue on
a background thread (submitRequest / waitForRequestToComplete), and exposes
genBatchProof / genAggregatedProof / genFinalProof / processBatch.
"""

from .input import ProofInput, PublicInputs
from .prover import Prover, ProverRequest

__all__ = ["Prover", "ProverRequest", "ProofInput", "PublicInputs"]
