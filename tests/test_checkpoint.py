"""Commit-pols checkpoint / resume (reference: config.zkevmCmPols mmap,
zkevmCmPolsAfterExecutor save, and the STARK-only resume of
test/prover/main.cpp)."""

import numpy as np
import pytest

from zkevm_prover_tpu.executor import BatchActions
from zkevm_prover_tpu.prover import ProofInput, Prover, PublicInputs
from zkevm_prover_tpu.prover import checkpoint


def _input():
    return ProofInput(
        publics=PublicInputs(batch_l2_data="0x02"),
        actions=BatchActions(
            memory=[{"addr": 1, "step": 1, "wr": 1, "value": 5},
                    {"addr": 1, "step": 2, "wr": 0, "value": 0}],
        ),
    )


def test_save_load_roundtrip(tmp_path):
    path = str(tmp_path / "batch.commit")
    traces = {"memory": np.arange(32, dtype=np.uint64).reshape(4, 8),
              "binary": np.ones((8, 3), dtype=np.uint64)}
    checkpoint.save_commit_pols(path, traces, publics={"chain_id": 7},
                                meta={"counters": {"memory": 2}})
    loaded, hdr = checkpoint.load_commit_pols(path)
    assert sorted(loaded) == ["binary", "memory"]
    for k in traces:
        np.testing.assert_array_equal(np.asarray(loaded[k]), traces[k])
    assert hdr["publics"]["chain_id"] == 7
    assert hdr["meta"]["counters"]["memory"] == 2
    # mmap mode gives read-only zero-copy views
    assert isinstance(loaded["memory"], np.memmap)


def test_truncated_file_rejected(tmp_path):
    path = str(tmp_path / "bad.commit")
    traces = {"memory": np.zeros((64, 8), dtype=np.uint64)}
    checkpoint.save_commit_pols(path, traces)
    with open(path, "r+b") as f:
        f.truncate(4096 + 64)  # cut into the section
    with pytest.raises(ValueError, match="truncated"):
        checkpoint.load_commit_pols(path)


def test_not_a_checkpoint_rejected(tmp_path):
    path = str(tmp_path / "junk")
    with open(path, "wb") as f:
        f.write(b"{}" + b"\x00" * 4094)
    with pytest.raises(ValueError, match="not a commit-pols"):
        checkpoint.load_commit_pols(path)


def test_resume_proves_identically(tmp_path):
    """gen_batch_proof(save_cm_pols=...) then resume on a FRESH prover:
    the resumed proofs must verify and carry the same Merkle roots (the
    pipeline is deterministic given the commit pols)."""
    path = str(tmp_path / "batch.commit")
    p1 = Prover(n_bits=9)
    bp = p1.gen_batch_proof(_input(), save_cm_pols=path)
    assert p1.verify_batch_proof(bp)

    p2 = Prover(n_bits=9)
    bp2 = p2.gen_batch_proof_from_commit(path)
    assert p2.verify_batch_proof(bp2)
    assert sorted(bp2.sm_proofs) == sorted(bp.sm_proofs)
    for name in bp.sm_proofs:
        pf1 = bp.sm_proofs[name][1]
        pf2 = bp2.sm_proofs[name][1]
        assert [r.tolist() for r in pf1.roots] == \
            [r.tolist() for r in pf2.roots]
    assert bp2.publics.new_acc_input_hash == bp.publics.new_acc_input_hash
    assert bp2.counters == bp.counters
