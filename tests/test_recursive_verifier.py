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


def _proof2():
    """A second proof of the SAME AIR shape (different trace/publics)."""
    if "p2" not in _cache:
        import numpy as np

        from tests.test_stark_e2e import N, fib_air
        from zkevm_prover_tpu.ops import goldilocks as gl

        tr = np.zeros((N, 2), dtype=np.uint64)
        x, y = 7, 11
        for i in range(N):
            tr[i] = (x, y)
            x, y = y, (x + y) % gl.P
        setup = StarkSetup(fib_air(), n_queries=3, fri_fold_bits=2,
                           hash_type="BN128")
        prover = StarkProver(setup)
        _cache["p2"] = (setup, prover.verkey, prover.prove(tr))
    return _cache["p2"]


def test_fixed_circuit_reuses_across_proofs():
    """THE fixed-circuit property: the SAME r1cs (no per-instance
    specialization) accepts the witness synthesized for a different
    proof of the same shape."""
    setup, verkey, proof = _proof()
    r1, w1, _ = svc.build(setup, verkey, proof)
    setup2, verkey2, proof2 = _proof2()
    r2, w2, pubs2 = svc.build(setup2, verkey2, proof2)
    assert len(r1.constraints) == len(r2.constraints)
    assert r1.n_signals == r2.n_signals
    assert r1.is_satisfied(w2), \
        "the fixed circuit must accept any same-shape proof's witness"


def test_join_two_proofs_with_chaining():
    """The recursive2 role: one circuit verifying two proofs, with a
    publics-chaining equality between them."""
    setup, verkey, proof = _proof()
    setup2, verkey2, proof2 = _proof2()
    # same proof twice: the chain constraint (equal publics) holds
    r1cs, w, pubs = svc.build_join(
        [(setup, verkey, proof), (setup, verkey, proof)],
        chain=[(0, 0, 1, 0)])
    assert r1cs.is_satisfied(w)
    assert pubs[0] == pubs[1] == int(verkey)
    # different publics (a0 = 1 vs 7): the chain equality must fail
    r1cs, w, _ = svc.build_join(
        [(setup, verkey, proof), (setup2, verkey2, proof2)],
        chain=[(0, 0, 1, 0)])
    assert not r1cs.is_satisfied(w)
    # without the chain, verifying two DIFFERENT proofs together is fine
    r1cs, w, _ = svc.build_join(
        [(setup, verkey, proof), (setup2, verkey2, proof2)])
    assert r1cs.is_satisfied(w)
