"""Produce the committed spine-proof artifact: ONE combined-AIR batch proof
of a reference e2e vector (reference Prover::genBatchProof shape,
prover.cpp:392-612).

    python tools/run_spine.py [--bits 14] [--vector .../input_executor_0.json]
                              [--out artifacts/spine_fork9_2e14]
                              [--platform cpu|tpu]

Writes proof.json (StarkProof), meta.json (verkey, publics, include set,
timings, domain). tests/test_spine_e2e.py verifies the artifact in the
default suite; ZK_SLOW=1 re-proves from scratch.

At --bits >= 16 the Binary SM joins the combined AIR; at >= 18 the
production keccak/sha256 gate pipelines join (one 24-round keccak slot =
155,286 rows, reference keccak_f_executor.hpp:47-48).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=14)
    ap.add_argument("--vector", default="/root/reference/testvectors/e2e/"
                    "fork_9/input_executor_0.json")
    ap.add_argument("--out", default=None)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--queries", type=int, default=8)
    ap.add_argument("--include", default=None,
                    help="comma-separated SM include set (default: "
                    "combined.default_include(bits)); 'keccak' pulls the "
                    "full 24-round gate pipeline (needs bits >= 18)")
    ap.add_argument("--mesh", type=int, default=0,
                    help="row-shard the prover over an N-device mesh "
                    "(virtual CPU devices; proof must be bit-identical "
                    "to the single-chip artifact)")
    args = ap.parse_args()

    if args.mesh:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.mesh}").strip()
    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/zkevm_prover_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from zkevm_prover_tpu.prover.input import ProofInput
    from zkevm_prover_tpu.prover.prover import Prover
    from zkevm_prover_tpu.stark.verifier import verify

    out = args.out or os.path.join(
        os.path.dirname(__file__), "..", "artifacts",
        f"spine_fork9_2e{args.bits}")
    os.makedirs(out, exist_ok=True)

    t0 = time.time()
    mesh = None
    if args.mesh:
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:args.mesh]), ("row",))
    include = tuple(args.include.split(",")) if args.include else None
    pv = Prover(rom_bits=args.bits, n_queries=args.queries, mesh=mesh,
                rom_include=include)
    inp = ProofInput.from_file(args.vector)
    t_setup = time.time() - t0

    t0 = time.time()
    bp = pv.gen_batch_proof(inp)
    t_prove = time.time() - t0
    prover, proof = bp.sm_proofs["batch"]

    # persist the proof BEFORE verifying: a verifier-side failure must
    # not discard hours of proving work
    with open(os.path.join(out, "proof.json"), "w") as f:
        f.write(proof.to_json())

    t0 = time.time()
    ok = verify(prover.setup, prover.verkey, proof)
    t_verify = time.time() - t0
    assert ok, "spine proof failed verification"
    assert bp.publics.new_state_root == inp.publics.new_state_root, \
        "newStateRoot mismatch vs vector"
    air = prover.setup.air
    meta = {
        "vector": args.vector,
        "n_bits": args.bits,
        "n_queries": args.queries,
        "include": sorted(getattr(air, "_spans", {})),
        "columns": air.n_cm1,
        "constants": air.n_constants,
        "verkey": [int(x) for x in np.asarray(prover.verkey).ravel()],
        "publics": {
            "oldStateRoot": bp.publics.old_state_root,
            "newStateRoot": bp.publics.new_state_root,
            "newAccInputHash": bp.publics.new_acc_input_hash,
            "oldBatchNum": bp.publics.old_batch_num,
            "newBatchNum": bp.publics.new_batch_num,
        },
        "counters": {k: int(v) for k, v in bp.counters.items()},
        "platform": args.platform,
        "mesh": args.mesh,
        "timings_s": {"setup": round(t_setup, 2),
                      "prove": round(t_prove, 2),
                      "verify": round(t_verify, 2)},
    }
    with open(os.path.join(out, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta["timings_s"] | {"out": out, "ok": True}))


if __name__ == "__main__":
    main()
