"""Fflonk combined-commitment SNARK (reference fflonk_prover.c.hpp role).

The reference's default final proof is fflonk (config.cpp:268 selects
final.fflonk.zkey); these tests drive snark/fflonk.py's 5-round protocol
end to end and check the proof shape (4 G1 points + 15 evaluations) and
soundness against tampering.
"""

import pytest

from zkevm_prover_tpu.ops import bn254
from zkevm_prover_tpu.snark import fflonk
from zkevm_prover_tpu.snark.fflonk import Builder

R = bn254.R


def _circuit():
    # publics: x, out;  prove out = x^3 + x + 5
    b = Builder(n_public=2)
    x, out = 1, 2
    x2 = b.mul(x, x)
    x3 = b.mul(x2, x)
    s = b.add(x3, x)
    five = b.alloc()
    b.constant(five, 5)
    s2 = b.add(s, five)
    b.assert_equal(s2, out)
    return b.build()


def _assignment(x):
    out = (x * x * x + x + 5) % R
    x2 = x * x % R
    x3 = x2 * x % R
    s = (x3 + x) % R
    return [0, x, out, x2, x3, s, 5, (s + 5) % R], out


@pytest.fixture(scope="module")
def setup():
    return fflonk.fflonk_setup(_circuit())


@pytest.fixture(scope="module")
def proof(setup):
    assignment, out = _assignment(3)
    return fflonk.fflonk_prove(setup, assignment), [3, out]


def test_prove_verify(setup, proof):
    pf, publics = proof
    assert fflonk.fflonk_verify(setup, publics, pf)


def test_proof_shape(proof):
    pf, _ = proof
    # fflonk's selling point: 4 G1 points + 15 field evaluations
    points = [k for k in pf if isinstance(pf[k], tuple)]
    assert sorted(points) == ["c1", "c2", "w1", "w2"]
    evals = [k for k in pf if k.startswith("ev_")]
    assert len(evals) == 15


def test_wrong_public_rejected(setup, proof):
    pf, publics = proof
    assert not fflonk.fflonk_verify(setup, [publics[0], publics[1] ^ 1], pf)


def test_tampered_evaluation_rejected(setup, proof):
    pf, publics = proof
    bad = dict(pf)
    bad["ev_a"] = (bad["ev_a"] + 1) % R
    assert not fflonk.fflonk_verify(setup, publics, bad)


def test_tampered_commitment_rejected(setup, proof):
    pf, publics = proof
    bad = dict(pf)
    bad["w2"] = bn254.g1_add(bad["w2"], bn254.G1_GEN)
    assert not fflonk.fflonk_verify(setup, publics, bad)


def test_unsatisfied_witness_rejected(setup):
    # a broken assignment must not yield a valid proof: the coset division
    # absorbs the non-vanishing gate into a garbage T0, and the verifier's
    # recomputed T0(xi) (from the gate equation) contradicts it
    assignment, out = _assignment(3)
    assignment[5] = (assignment[5] + 1) % R   # corrupt internal wire s
    pf = fflonk.fflonk_prove(setup, assignment)
    assert not fflonk.fflonk_verify(setup, [3, out], pf)


def test_final_proof_fflonk_backend():
    from zkevm_prover_tpu.executor import BatchActions
    from zkevm_prover_tpu.prover import ProofInput, Prover, PublicInputs

    prover = Prover(n_bits=9)
    inp = ProofInput(
        publics=PublicInputs(batch_l2_data="0x01"),
        actions=BatchActions(memory=[
            {"addr": 1, "step": 1, "wr": 1, "value": 5},
            {"addr": 1, "step": 2, "wr": 0, "value": 0},
        ]),
    )
    bp = prover.gen_batch_proof(inp)
    agg = prover.aggregate_tree([bp])
    fp = prover.gen_final_proof(agg, snark="fflonk")
    assert fp.groth16["system"] == "fflonk"
    assert prover.verify_final_proof(fp)
    fp.publics_digest ^= 1
    assert not prover.verify_final_proof(fp)


def test_different_statement_verifies_same_setup(setup):
    assignment, out = _assignment(7)
    pf = fflonk.fflonk_prove(setup, assignment)
    assert fflonk.fflonk_verify(setup, [7, out], pf)
    # and the two statements' proofs are not interchangeable
    assert not fflonk.fflonk_verify(setup, [3, out], pf)
