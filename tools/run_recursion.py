"""Evidence the COMPLETE recursive aggregation pipeline once, end to end:

  4 ROM-path batch proofs (the fork_9 e2e chain input_executor_0..3)
    -> wrap_batch_recursive (recursive1)      [prover.cpp:612-660]
    -> aggregate_recursive binary tree (recursive2, 2 levels)
                                              [prover.cpp:676-800]
    -> gen_final_proof_recursive (recursiveF BN128 STARK + Groth16)
                                              [prover.cpp:827-940]
    -> export_final_proof -> verify from files alone.

Writes artifacts/recursion_e2e/{final_proof.json, vkey.json, meta.json};
tests/test_recursive.py's artifact test verifies the committed files in
the default suite.

    python tools/run_recursion.py [--bits 14] [--batches 4] [--rec-bits 16]
                                  [--out artifacts/recursion_e2e]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

E2E_DIR = "/root/reference/testvectors/e2e/fork_9"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=14)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--rec-bits", type=int, default=16)
    ap.add_argument("--out", default=None)
    ap.add_argument("--queries", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/zkevm_prover_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from zkevm_prover_tpu.prover.input import ProofInput
    from zkevm_prover_tpu.prover.prover import Prover
    from zkevm_prover_tpu.snark.export import (export_final_proof,
                                               verify_final_proof_file)

    out = args.out or os.path.join(os.path.dirname(__file__), "..",
                                   "artifacts", "recursion_e2e")
    os.makedirs(out, exist_ok=True)
    timings = {}

    pv = Prover(rom_bits=args.bits, n_queries=args.queries)
    nodes = []
    for i in range(args.batches):
        inp = ProofInput.from_file(
            os.path.join(E2E_DIR, f"input_executor_{i}.json"))
        t0 = time.time()
        bp = pv.gen_batch_proof(inp)
        timings[f"batch_{i}_prove_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        node = pv.wrap_batch_recursive(bp, rec_bits=args.rec_bits)
        timings[f"recursive1_{i}_s"] = round(time.time() - t0, 1)
        assert pv.verify_recursive(node), f"recursive1 node {i} invalid"
        nodes.append(node)
        print(json.dumps({"stage": f"r1_{i}", **timings}), flush=True)

    t0 = time.time()
    root = pv.aggregate_recursive(nodes, rec_bits=args.rec_bits)
    timings["recursive2_tree_s"] = round(time.time() - t0, 1)
    assert pv.verify_recursive(root), "recursive2 root invalid"
    print(json.dumps({"stage": "r2", **timings}), flush=True)

    t0 = time.time()
    fp = pv.gen_final_proof_recursive(root)
    timings["recursiveF_final_s"] = round(time.time() - t0, 1)
    assert pv.verify_final_proof_recursive(fp), "final proof invalid"

    t0 = time.time()
    proof_path = os.path.join(out, "final_proof.json")
    vkey_path = os.path.join(out, "vkey.json")
    export_final_proof(pv, fp, proof_path, vkey_path)
    ok = verify_final_proof_file(proof_path, vkey_path)
    timings["export_verify_s"] = round(time.time() - t0, 1)
    assert ok, "exported final proof failed file-only verification"

    meta = {
        "batches": args.batches, "bits": args.bits,
        "rec_bits": args.rec_bits,
        "chain": {
            "oldStateRoot": nodes[0].publics.old_state_root,
            "newStateRoot": root.publics.new_state_root,
            "oldBatchNum": nodes[0].publics.old_batch_num,
            "newBatchNum": root.publics.new_batch_num,
        },
        "timings_s": timings,
    }
    with open(os.path.join(out, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps({"ok": True, "out": out, **timings}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
