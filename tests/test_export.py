"""Exportable verification: FinalProof + vkey JSON round-trip.

Reference: the shipped verification keys (runtime/README.md) let third
parties verify a FinalProof under snarkjs with no prover state — here
`verify_final_proof_file(proof.json, vkey.json)` is that check.
"""

import json

from zkevm_prover_tpu.prover.input import PublicInputs
from zkevm_prover_tpu.prover.prover import AggregatedProof, Prover
from zkevm_prover_tpu.snark.export import (export_final_proof,
                                           groth16_verify_vkey,
                                           verify_final_proof_file)

_cache: dict = {}


def _final(tmp_path):
    if "fp" not in _cache:
        pp = Prover(n_bits=9, final_snark="digest")
        pub = PublicInputs(
            old_state_root="0x" + "11" * 32,
            new_state_root="0x" + "22" * 32,
            old_acc_input_hash="0x" + "00" * 32,
            new_acc_input_hash="0x" + "33" * 32,
            old_batch_num=7, new_batch_num=8, chain_id=1000)
        agg = AggregatedProof(publics=pub, children=[])
        fp = pp.gen_final_proof(agg)
        _cache["pp"], _cache["fp"] = pp, fp
    pp, fp = _cache["pp"], _cache["fp"]
    pj = tmp_path / "proof.json"
    vj = tmp_path / "verification_key.json"
    export_final_proof(pp, fp, str(pj), str(vj))
    return pj, vj


def test_final_proof_file_roundtrip(tmp_path):
    pj, vj = _final(tmp_path)
    assert verify_final_proof_file(str(pj), str(vj))


def test_tampered_public_rejected(tmp_path):
    pj, vj = _final(tmp_path)
    d = json.loads(pj.read_text())
    d["publics"]["newStateRoot"] = "0x" + "44" * 32
    pj.write_text(json.dumps(d))
    assert not verify_final_proof_file(str(pj), str(vj))


def test_tampered_proof_point_rejected(tmp_path):
    pj, vj = _final(tmp_path)
    d = json.loads(pj.read_text())
    d["pi_a"][0] = str(int(d["pi_a"][0]) + 1)
    pj.write_text(json.dumps(d))
    assert not verify_final_proof_file(str(pj), str(vj))


def test_wrong_vkey_rejected(tmp_path):
    pj, vj = _final(tmp_path)
    d = json.loads(vj.read_text())
    d["IC"][0][0] = str(int(d["IC"][0][0]) + 1)
    vj.write_text(json.dumps(d))
    assert not verify_final_proof_file(str(pj), str(vj))


def test_malformed_vkey_clean_false(tmp_path):
    pj, vj = _final(tmp_path)
    assert not groth16_verify_vkey({"protocol": "plonk"}, [], {})
    vj.write_text(json.dumps({"protocol": "groth16", "nPublic": 1}))
    assert not verify_final_proof_file(str(pj), str(vj))
