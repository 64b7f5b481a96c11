"""StarkInfo schema, proof2zkin, ECRecover, CLI entry.

Covers the remaining L-layer parity pieces: the starkinfo.json load/save
round-trip (reference stark_info.cpp), the zkin conversion shape
(proof2zkinStark.cpp), secp256k1 recovery (src/ecrecover) and the CLI
one-shot prove path (src/main.cpp file runners)."""

import json
import os
import random

from zkevm_prover_tpu.ops import ecrecover as ecr
from zkevm_prover_tpu.ops import keccak
from zkevm_prover_tpu.stark.stark_info import StarkInfo


def test_starkinfo_roundtrip(tmp_path):
    d = {
        "starkStruct": {"nBits": 10, "nBitsExt": 11, "nQueries": 8,
                        "verificationHashType": "GL",
                        "steps": [{"nBits": 11}, {"nBits": 7}]},
        "nConstants": 3, "nPublics": 1,
        "nCm1": 5, "nCm2": 2, "nCm3": 3, "nCm4": 6,
        "qDeg": 2, "qDim": 3,
        "evMap": [{"type": "cm", "id": 0, "prime": False},
                  {"type": "const", "id": 1, "prime": True}],
    }
    info = StarkInfo.load(d)
    assert info.starkStruct.nBitsExt == 11
    assert info.mapTotalN > 0
    assert info.mapOffsets["cm1_n"] == 0
    assert info.mapOffsets["cm1_2ns"] == 5 * (1 << 10)
    p = tmp_path / "x.starkinfo.json"
    info.save(str(p))
    again = StarkInfo.load(str(p))
    assert again.mapTotalN == info.mapTotalN
    assert again.evMap[1].prime is True


def test_starkinfo_from_setup():
    from zkevm_prover_tpu.stark.setup import StarkSetup
    from tests.test_stark_e2e import fib_air

    setup = StarkSetup(fib_air(), n_queries=8, fri_fold_bits=2)
    info = StarkInfo.from_setup(setup)
    assert info.starkStruct.nBits == setup.n_bits
    assert info.nCm1 == setup.section_width[1]


def test_proof2zkin_shape():
    from zkevm_prover_tpu.stark.proof2zkin import proof2zkin, publics2zkin
    from tests.test_stark_e2e import _fib_rt

    setup, prover, proof = _fib_rt()
    zkin = proof2zkin(proof)
    assert "s0_vals1" in zkin and "s0_siblings1" in zkin
    assert len(zkin["s0_vals1"]) == setup.n_queries
    assert "root1" in zkin and len(zkin["root1"]) == 4
    assert len(zkin["evals"]) == len(setup.ev_map)
    z2 = publics2zkin(zkin, proof.publics, [1, 2, 3, 4])
    assert z2["rootC"] == [1, 2, 3, 4]
    json.dumps(z2)  # serializable


def test_ecrecover_roundtrip():
    rng = random.Random(0)
    for _ in range(3):
        priv = rng.randrange(1, ecr.N)
        addr = ecr.pubkey_address(priv)
        digest = keccak.keccak256(b"message-%d" % priv)
        r, s, v = ecr.sign(digest, priv, rng.randrange(1, ecr.N))
        code, got = ecr.ecrecover(digest, r, s, v)
        assert code == ecr.ECR_NO_ERROR
        assert got == addr
        # tampered digest -> different address
        code2, got2 = ecr.ecrecover(keccak.keccak256(b"other"), r, s, v)
        assert code2 == ecr.ECR_NO_ERROR and got2 != addr


def test_ecrecover_error_codes():
    digest = keccak.keccak256(b"x")
    assert ecr.ecrecover(digest, 0, 1, 27)[0] == ecr.ECR_R_IS_ZERO
    assert ecr.ecrecover(digest, ecr.N, 1, 27)[0] == ecr.ECR_R_IS_TOO_BIG
    assert ecr.ecrecover(digest, 1, 0, 27)[0] == ecr.ECR_S_IS_ZERO
    assert ecr.ecrecover(digest, 1, ecr.N - 1, 27)[0] == ecr.ECR_S_IS_TOO_BIG
    assert ecr.ecrecover(digest, 1, 1, 99)[0] == ecr.ECR_V_INVALID


def test_cli_version_and_prove(tmp_path):
    from zkevm_prover_tpu.__main__ import main
    from zkevm_prover_tpu.prover import ProofInput, PublicInputs
    from zkevm_prover_tpu.executor import BatchActions

    assert main(["--version"]) == 0

    inp = ProofInput(
        publics=PublicInputs(batch_l2_data="0x99"),
        actions=BatchActions(memory=[
            {"addr": 1, "step": 1, "wr": 1, "value": 3},
            {"addr": 1, "step": 2, "wr": 0, "value": 0},
        ]),
    )
    in_path = tmp_path / "input.json"
    in_path.write_text(inp.to_json())
    out_dir = tmp_path / "out"
    assert main(["--prove", str(in_path), "-o", str(out_dir)]) == 0
    saved = json.loads((out_dir / "batch_proof.json").read_text())
    assert saved["publics"]["new_batch_num"] == 1
    assert "memory" in saved["proofs"]
