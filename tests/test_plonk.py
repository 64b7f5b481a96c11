"""PLONK/KZG SNARK — the Fflonk-role final-proof system."""

import pytest

from zkevm_prover_tpu.snark import plonk

R = plonk.R


_cache: dict = {}


def _setup():
    if "s" not in _cache:
        b = plonk.Builder(n_public=2)
        x = b.alloc()
        y = b.alloc()
        m = b.mul(x, y)
        s = b.add(x, y)
        b.assert_equal(m, 1)   # public 0 = x·y
        b.assert_equal(s, 2)   # public 1 = x+y
        _cache["s"] = plonk.plonk_setup(b.build())
    return _cache["s"]


def _assign(xv, yv):
    return [0, xv * yv % R, (xv + yv) % R, xv, yv, xv * yv % R,
            (xv + yv) % R]


def test_plonk_prove_verify_roundtrip():
    setup = _setup()
    proof = plonk.plonk_prove(setup, _assign(3, 5))
    assert plonk.plonk_verify(setup, [15, 8], proof)


def test_plonk_rejects_wrong_publics_and_tampering():
    setup = _setup()
    proof = plonk.plonk_prove(setup, _assign(3, 5))
    assert not plonk.plonk_verify(setup, [16, 8], proof)
    assert not plonk.plonk_verify(setup, [15, 9], proof)

    # tamper a commitment
    bad = dict(proof)
    bad["z"] = plonk.bn254.g1_add(proof["z"], plonk.bn254.G1_GEN)
    assert not plonk.plonk_verify(setup, [15, 8], bad)

    # tamper an evaluation
    bad = dict(proof)
    bad["ev_a"] = (proof["ev_a"] + 1) % R
    assert not plonk.plonk_verify(setup, [15, 8], bad)


def test_plonk_unsatisfied_witness_fails_to_prove():
    setup = _setup()
    bad = _assign(3, 5)
    bad[3] = 4  # x changed but x·y public unchanged
    with pytest.raises(AssertionError):
        plonk.plonk_prove(setup, bad)


def test_final_proof_plonk_backend():
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
    fp = prover.gen_final_proof(agg, snark="plonk")
    assert fp.groth16["system"] == "plonk"
    assert prover.verify_final_proof(fp)
    fp.publics_digest ^= 1
    assert not prover.verify_final_proof(fp)
