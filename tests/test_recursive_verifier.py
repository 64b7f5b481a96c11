"""Recursive proof compression: a STARK verified inside an R1CS circuit.

The miniature end-to-end of docs/RECURSION.md route 2: a BN128-scheme
STARK proof (the recursiveF shape) is verified entirely in-circuit —
transcript replay, Merkle openings, quotient identity, FRI folds, final
low-degree — and the circuit proves under Groth16.
"""

import os

import numpy as np
import pytest

from zkevm_prover_tpu.snark import stark_verifier_circuit as svc
from zkevm_prover_tpu.stark.prover import StarkProver
from zkevm_prover_tpu.stark.setup import StarkSetup

_cache: dict = {}


def _proof():
    if "p" not in _cache:
        from tests.test_stark_e2e import fib_air, fib_trace

        setup = StarkSetup(fib_air(), n_queries=3, fri_fold_bits=2,
                           hash_type="BN128")
        prover = StarkProver(setup)
        proof = prover.prove(fib_trace())
        from zkevm_prover_tpu.stark.verifier import verify

        assert verify(setup, prover.verkey, proof)
        _cache["p"] = (setup, prover.verkey, proof)
    return _cache["p"]


def test_verifier_circuit_satisfied():
    setup, verkey, proof = _proof()
    r1cs, w, pubs = svc.build(setup, verkey, proof)
    assert r1cs.is_satisfied(w)
    _cache["circuit"] = (r1cs, w, pubs)
    print(f"verifier circuit: {len(r1cs.constraints)} constraints, "
          f"{r1cs.n_signals} signals")


def test_verifier_circuit_rejects_forged_eval():
    setup, verkey, proof = _proof()
    import copy

    bad = copy.deepcopy(proof)
    bad.evals[0] = (int(bad.evals[0][0]) ^ 1, int(bad.evals[0][1]),
                    int(bad.evals[0][2]))
    # the host verifier rejects it...
    from zkevm_prover_tpu.stark.verifier import VerifyError, verify

    with pytest.raises(VerifyError):
        verify(setup, verkey, bad)
    # ...and the circuit admits no witness: synthesis either fails an
    # in-gadget consistency assert or yields an unsatisfied system
    try:
        r1cs, w, pubs = svc.build(setup, verkey, bad)
    except AssertionError:
        return
    assert not r1cs.is_satisfied(w)


@pytest.mark.skipif(not os.environ.get("ZK_SLOW"),
                    reason="Groth16 over the ~full verifier circuit takes "
                           "many minutes on this host; run with ZK_SLOW=1")
def test_verifier_circuit_groth16_roundtrip():
    if "circuit" not in _cache:
        test_verifier_circuit_satisfied()
    r1cs, w, pubs = _cache["circuit"]
    from zkevm_prover_tpu.snark import (groth16_prove, groth16_setup,
                                        groth16_verify)

    g16 = groth16_setup(r1cs)
    proof = groth16_prove(g16, w)
    assert groth16_verify(g16, pubs, proof)
    bad = list(pubs)
    bad[1] = (bad[1] + 1) % svc.R
    assert not groth16_verify(g16, bad, proof)
