"""BN128 commitment stack: Poseidon-Fr, arity-16 Merkle, transcript, and the
recursiveF-shaped STARK (same engine, BN128 scheme).

Reference: StarkRecursiveF (src/starkpil/starkRecursiveF/), MerkleTreeBN128
(BN128_ARITY 16), TranscriptBN128 — the final recursion stage whose proof a
BN254 SNARK circuit verifies.
"""

import numpy as np
import pytest

from zkevm_prover_tpu.ops import merkle_bn128, poseidon_bn128 as pbn
from zkevm_prover_tpu.ops.bn254 import R
from zkevm_prover_tpu.ops.transcript_bn128 import TranscriptBN128
from zkevm_prover_tpu.stark.prover import StarkProver
from zkevm_prover_tpu.stark.proof import StarkProof
from zkevm_prover_tpu.stark.setup import StarkSetup
from zkevm_prover_tpu.stark.verifier import VerifyError, verify


def test_poseidon_bn128_basic():
    out = pbn.permute([0] * pbn.T)
    assert len(out) == pbn.T and all(0 <= v < R for v in out)
    assert out == pbn.permute([0] * pbn.T)          # deterministic
    assert out != pbn.permute([1] + [0] * (pbn.T - 1))
    h = pbn.hash16(list(range(16)))
    assert 0 <= h < R
    # pack_gl: 3 GL elements per Fr
    packed = pbn.pack_gl([1, 2, 3, 4])
    assert packed[0] == 1 | (2 << 64) | (3 << 128)
    assert packed[1] == 4


def test_merkle_bn128_commit_and_verify():
    rng = np.random.default_rng(0)
    src = rng.integers(0, pbn.GL_P, size=(64, 9), dtype=np.uint64)
    t = merkle_bn128.MerkleTreeBN128.commit(src)
    assert t.proof_length() == 2  # 64 leaves, arity 16 -> 2 levels
    for idx in (0, 17, 63):
        row, sibs = t.get_group_proof(idx)
        assert merkle_bn128.verify_group_proof(t.root(), idx, row, sibs)
    row, sibs = t.get_group_proof(5)
    row = row.copy()
    row[0] += 1
    assert not merkle_bn128.verify_group_proof(t.root(), 5, row, sibs)


def test_transcript_bn128_determinism():
    a, b = TranscriptBN128(), TranscriptBN128()
    a.put([1, 2, 3]); b.put([1, 2, 3])
    assert a.get_field3() == b.get_field3()
    assert a.get_permutations(4, 5) == b.get_permutations(4, 5)
    c = TranscriptBN128()
    c.put([1, 2, 4])
    assert c.get_field3() != TranscriptBN128().get_field3()


def test_recursivef_shaped_stark_roundtrip():
    from tests.test_stark_e2e import fib_air, fib_trace

    setup = StarkSetup(fib_air(), n_queries=4, fri_fold_bits=2,
                       hash_type="BN128")
    prover = StarkProver(setup)
    assert isinstance(prover.verkey, int)  # single Fr root
    proof = prover.prove(fib_trace())
    assert proof.hash_type == "BN128"
    assert verify(setup, prover.verkey, proof)
    # JSON round-trip with big Fr roots/siblings
    again = StarkProof.from_json(proof.to_json())
    assert verify(setup, prover.verkey, again)
    # tampered BN128 sibling is rejected
    bad = StarkProof.from_json(proof.to_json())
    bad.fri[0].queries[0][0].siblings[0][0] += 1
    with pytest.raises(VerifyError):
        verify(setup, prover.verkey, bad)
