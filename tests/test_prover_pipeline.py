"""Prover orchestration: request queue, batch -> aggregated -> final pipeline.

Mirrors the reference flow driven by the aggregator (SURVEY.md §3.2-3.4):
genBatchProof for two chained batches, genAggregatedProof with publics
chaining checks, genFinalProof Groth16 wrap, plus the processBatch fast path
and queue semantics (submitRequest/waitForRequestToComplete).
"""

import dataclasses

import pytest

from zkevm_prover_tpu.executor import BatchActions
from zkevm_prover_tpu.prover import ProofInput, Prover, ProverRequest, PublicInputs


@pytest.fixture(scope="module")
def prover():
    # digest final mode: these tests cover queue/chaining mechanics; the
    # production default (stark-verify) is exercised end-to-end below in
    # test_final_proof_attests_starks
    return Prover(n_bits=9, final_snark="digest")


def _input(old_root="0x" + "00" * 32, old_acc="0x" + "00" * 32, num=0):
    pub = PublicInputs(old_state_root=old_root, old_acc_input_hash=old_acc,
                       old_batch_num=num, batch_l2_data="0xdead")
    actions = BatchActions(
        memory=[{"addr": 1, "step": 1, "wr": 1, "value": 5},
                {"addr": 1, "step": 2, "wr": 0, "value": 0}],
    )
    return ProofInput(publics=pub, actions=actions)


def test_process_batch_fast_path(prover):
    res = prover.process_batch(_input())
    assert res["publics"].new_batch_num == 1
    assert res["counters"]["memory"] == 2


def test_input_json_roundtrip():
    inp = _input()
    again = ProofInput.from_json(inp.to_json())
    assert again.publics == inp.publics
    assert again.actions.memory == inp.actions.memory


def test_full_pipeline_batch_agg_final(prover):
    # batch 1
    bp1 = prover.gen_batch_proof(_input())
    assert prover.verify_batch_proof(bp1)
    # batch 2 chains on batch 1
    inp2 = _input(old_root=bp1.publics.new_state_root,
                  old_acc=bp1.publics.new_acc_input_hash, num=1)
    bp2 = prover.gen_batch_proof(inp2)
    agg = prover.gen_aggregated_proof(bp1, bp2)
    assert agg.publics.old_batch_num == 0 and agg.publics.new_batch_num == 2
    assert prover.verify_aggregated_proof(agg)
    final = prover.gen_final_proof(agg)
    assert prover.verify_final_proof(final)
    # tampered publics digest must fail
    bad = dataclasses.replace(final, publics_digest=final.publics_digest + 1)
    assert not prover.verify_final_proof(bad)


def test_aggregation_rejects_broken_chain(prover):
    bp1 = prover.gen_batch_proof(_input())
    bp_wrong = prover.gen_batch_proof(_input(num=7))  # batch numbers skip
    with pytest.raises(ValueError, match="chain"):
        prover.gen_aggregated_proof(bp1, bp_wrong)


def test_request_queue(prover):
    req = ProverRequest("processBatch", _input())
    uid = prover.submit_request(req)
    res = prover.wait_for_request(uid, timeout=30)
    assert res["publics"].new_batch_num == 1

    bad = ProverRequest("nonsense", None)
    prover.submit_request(bad)
    with pytest.raises(RuntimeError, match="unknown request type"):
        prover.wait_for_request(bad.uuid, timeout=30)


def test_blake2b_vector():
    """Device Blake2b-256 vs hashlib across block-boundary sizes, plus
    the batched single-block path (reference Blake2b256_Test shape)."""
    import hashlib

    from zkevm_prover_tpu.ops import blake

    assert blake.blake2b_256_test()
    for n in (0, 1, 3, 55, 127, 128, 129, 255, 256, 300):
        data = (bytes(range(min(n, 256))) + bytes(max(0, n - 256)))[:n]
        assert blake.blake2b_256(data) == hashlib.blake2b(
            data, digest_size=32).digest(), f"mismatch at len {n}"
    msgs = [b"", b"abc", bytes(range(128))]
    outs = blake.blake2b_256_many(msgs)
    for m, o in zip(msgs, outs):
        assert o == hashlib.blake2b(m, digest_size=32).digest()


def test_aggregate_tree_four_batches(prover):
    bps = []
    root = "0x" + "00" * 32
    acc = "0x" + "00" * 32
    for i in range(4):
        bp = prover.gen_batch_proof(_input(old_root=root, old_acc=acc, num=i))
        root, acc = bp.publics.new_state_root, bp.publics.new_acc_input_hash
        bps.append(bp)
    agg = prover.aggregate_tree(bps)
    assert agg.publics.old_batch_num == 0
    assert agg.publics.new_batch_num == 4
    assert prover.verify_aggregated_proof(agg)
    final = prover.gen_final_proof(agg)
    assert prover.verify_final_proof(final)


def test_recursive_f_reproof_and_join_circuit():
    """The recursion pipeline up to (but not including) the Groth16 wrap:
    each batch's STARKs re-proven under the BN128 scheme (recursiveF
    role) and BOTH batches verified inside ONE fixed join circuit — the
    recursive2 shape (reference prover.cpp:676-800)."""
    from zkevm_prover_tpu.snark import stark_verifier_circuit as svc
    from zkevm_prover_tpu.stark.verifier import verify as stark_verify

    small = Prover(n_bits={"memory": 6}, n_queries=3)
    bp1 = small.gen_batch_proof(_input())
    inp2 = _input(old_root=bp1.publics.new_state_root,
                  old_acc=bp1.publics.new_acc_input_hash, num=1)
    bp2 = small.gen_batch_proof(inp2)
    agg = small.gen_aggregated_proof(bp1, bp2)

    rec1 = small.compress_proof(bp1)
    rec2 = small.compress_proof(bp2)
    assert set(rec1) == {"memory"} and set(rec2) == {"memory"}
    for rec in (rec1, rec2):
        prover, proof = rec["memory"]
        assert proof.hash_type == "BN128"
        assert stark_verify(prover.setup, prover.verkey, proof)

    items = [(rec1["memory"][0].setup, int(rec1["memory"][0].verkey),
              rec1["memory"][1]),
             (rec2["memory"][0].setup, int(rec2["memory"][0].verkey),
              rec2["memory"][1])]
    r1cs, w, pubs = svc.build_join(items)
    assert r1cs.is_satisfied(w)
    assert pubs[0] == pubs[1] == int(rec1["memory"][0].verkey)
    # a forged child proof admits no witness in the SAME circuit
    import copy

    bad = copy.deepcopy(items[1][2])
    bad.evals[0] = (int(bad.evals[0][0]) ^ 1, int(bad.evals[0][1]),
                    int(bad.evals[0][2]))
    try:
        r2, w2, _ = svc.build_join([items[0], (items[1][0], items[1][1],
                                               bad)])
    except AssertionError:
        return
    assert not r2.is_satisfied(w2)
    _rec_cache["small"] = (small, agg)


_rec_cache: dict = {}


@pytest.mark.skipif(
    not __import__("os").environ.get("ZK_SLOW"),
    reason="Groth16 over the two-proof join circuit: minutes; ZK_SLOW=1")
def test_final_proof_attests_starks():
    """Aggregate two batch proofs into ONE constant-size final proof
    whose circuit VERIFIES both leaf STARKs."""
    if "small" not in _rec_cache:
        test_recursive_f_reproof_and_join_circuit()
    small, agg = _rec_cache["small"]
    fp = small.gen_final_proof(agg, snark="stark-verify")
    assert fp.groth16["system"] == "groth16-stark"
    assert small.verify_final_proof(fp)
    # tampering with the attested verkey publics must fail
    bad = dataclasses.replace(
        fp, stark_publics=[fp.stark_publics[0] + 1] + fp.stark_publics[1:])
    assert not small.verify_final_proof(bad)
