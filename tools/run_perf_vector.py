"""Execute / prove the reference performance workloads.

The reference ships 4 real workloads in testvectors/performance/ (fork 5)
and testvectors/performance_fork7/ (fork 7): balance transfers, ERC-20
transfers/transferFroms, NFT mints — its own throughput benchmarks
(SURVEY.md §4.4). This driver runs one through the TPU framework:

  execute   ROM interpretation in process-batch mode (the reference
            Executor::processBatch fast path) — reports newStateRoot
            vs the vector, steps, counters, wall-clock.
  check     full-trace mode + combined batch AIR constraint check
            (numpy quick checker).
  prove     Prover.gen_batch_proof — ONE combined-AIR STARK of the
            batch (reference genBatchProof, prover.cpp:392-612).

--txs K truncates the batch to its first K transactions (the RLP stream
is re-framed host-side; 0x0b changeL2Block markers are kept) so a real
workload PREFIX fits smaller domains: ~40k ROM steps per ERC-20 transfer
means ~6 txs at 2^18, ~25 at 2^20. The truncated batch has no reference
root; the artifact records ours (internally bound by the SMT walk from
the vector's genesis db).

Usage:
  python tools/run_perf_vector.py --vector erc20_transfer-197 --fork 7 \
      [--txs 6] [--bits 18] [--mode execute|check|prove] [--platform cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PERF5 = "/root/reference/testvectors/performance"
PERF7 = "/root/reference/testvectors/performance_fork7"


def split_batch_l2_data(data: bytes) -> list:
    """Split batchL2Data into entries: ("block", 9 raw bytes) for 0x0b
    changeL2Block markers (deltaTimestamp u32 || indexL1InfoTree u32),
    ("tx", raw bytes) for RLP tx || r(32) s(32) v(1) effectivePct(1)."""
    out = []
    i = 0
    while i < len(data):
        b = data[i]
        if b == 0x0B:
            out.append(("block", data[i:i + 9]))
            i += 9
            continue
        if b < 0xC0:
            raise ValueError(f"not an RLP list at byte {i}: {b:#x}")
        if b < 0xF8:
            ln, h = b - 0xC0, 1
        else:
            lb = b - 0xF7
            ln = int.from_bytes(data[i + 1:i + 1 + lb], "big")
            h = 1 + lb
        tx = data[i:i + h + ln + 66]
        if len(tx) != h + ln + 66:
            raise ValueError(f"truncated tx at byte {i}")
        out.append(("tx", tx))
        i += h + ln + 66
    return out


def truncate_txs(data: bytes, k: int) -> bytes:
    entries = split_batch_l2_data(data)
    out, ntx = b"", 0
    for kind, raw in entries:
        if kind == "tx":
            if ntx >= k:
                break
            ntx += 1
        out += raw
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vector", default="erc20_transfer-197")
    ap.add_argument("--fork", type=int, default=7, choices=[5, 7])
    ap.add_argument("--txs", type=int, default=0,
                    help="truncate to first K txs (0 = full batch)")
    ap.add_argument("--bits", type=int, default=23)
    ap.add_argument("--mode", default="execute",
                    choices=["execute", "check", "prove"])
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--skip-blockinfo", action="store_true",
                    help="set skipWriteBlockInfoRoot (the reference input "
                    "flag): zero the etrog blockInfoRoot SSTORE — the "
                    "decisive probe for whether a fork_7 expected root "
                    "predates the block-info machinery")
    ap.add_argument("--no-counters", action="store_true",
                    help="run with bNoCounters semantics (inSTEP=0, no "
                         "counter advance -> OOC checks can't fire)")
    ap.add_argument("--dump-db", default=None,
                    help="execute mode: dump the final node db + root to "
                         "this JSON path for offline leaf-level state diffs")
    ap.add_argument("--queries", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from zkevm_prover_tpu.prover.input import ProofInput

    root = PERF5 if args.fork == 5 else PERF7
    path = os.path.join(root, args.vector + ".json")
    pi = ProofInput.from_file(path)
    if args.no_counters:
        pi.no_counters = True
    if args.skip_blockinfo:
        pi.skip_write_block_info_root = True
    want = pi.publics.new_state_root
    n_txs = sum(1 for kind, _ in split_batch_l2_data(
        bytes.fromhex(pi.publics.batch_l2_data[2:])) if kind == "tx")
    if args.txs:
        data = truncate_txs(
            bytes.fromhex(pi.publics.batch_l2_data[2:]), args.txs)
        pi.publics.batch_l2_data = "0x" + data.hex()
        want = None  # no reference root for a prefix
        n_txs = args.txs

    out = {
        "vector": path, "fork": args.fork, "mode": args.mode,
        "txs": n_txs, "truncated": bool(args.txs),
        "batch_bytes": len(pi.publics.batch_l2_data[2:]) // 2,
    }

    t0 = time.time()
    if args.mode == "execute":
        from zkevm_prover_tpu.executor import forks
        from zkevm_prover_tpu.executor.sm.main_sm import MainExecutor
        from zkevm_prover_tpu.hashdb.database import Database
        from zkevm_prover_tpu.hashdb.smt import Smt

        db = Database()
        pi.seed_database(db)
        rom = forks.rom_for_fork(int(pi.publics.fork_id))
        tracer = pi.make_full_tracer(rom)
        res = MainExecutor(rom, args.bits).execute(
            pi.executor_input(), smt=Smt(db), process_batch=True,
            full_tracer=tracer)
        got = 0
        for i, fe in enumerate(res.new_state_root):
            got |= int(fe) << (64 * i)
        out |= {"steps": res.last_step,
                "counters": {k: int(v) for k, v in res.counters.items() if v},
                "new_state_root": f"{got:#066x}",
                "batch_error": tracer.error,
                "invalid_batch": bool(tracer.invalid_batch),
                "execute_s": round(time.time() - t0, 1)}
        if want is not None:
            out["match"] = got == int(want, 16)
        if args.dump_db:
            with open(args.dump_db, "w") as f:
                json.dump({"root": f"{got:#066x}",
                           "nodes": db._nodes, "programs": {
                               k: v.hex() for k, v in db._programs.items()}},
                          f)
    elif args.mode == "check":
        from zkevm_prover_tpu.executor import combined, forks
        from zkevm_prover_tpu.hashdb.database import Database
        from zkevm_prover_tpu.hashdb.smt import Smt
        from zkevm_prover_tpu.stark.prover import StarkProver
        from zkevm_prover_tpu.stark.setup import StarkSetup

        db = Database()
        pi.seed_database(db)
        rom = forks.rom_for_fork(int(pi.publics.fork_id))
        include = combined.default_include(args.bits)
        res, traces = combined.execute_batch(
            rom, args.bits, input=pi.executor_input(), smt=Smt(db),
            include=include)
        exec_s = time.time() - t0
        air = combined.build_batch_air(rom, args.bits, include=include)
        prover = StarkProver(StarkSetup(air, n_queries=args.queries,
                                        fri_fold_bits=2))
        stacked = air.stack_traces(traces)
        t0 = time.time()
        bad = prover.check_constraints(stacked, quick=True)
        out |= {"violated": bad, "columns": int(stacked.shape[1]),
                "steps": res.last_step,
                "execute_s": round(exec_s, 1),
                "check_s": round(time.time() - t0, 1)}
        assert bad == [], f"violated: {bad}"
    else:
        from zkevm_prover_tpu.prover.prover import Prover
        from zkevm_prover_tpu.stark.verifier import verify

        pv = Prover(rom_bits=args.bits, n_queries=args.queries)
        bp = pv.gen_batch_proof(pi)
        prover, proof = bp.sm_proofs["batch"]
        out |= {"prove_s": round(time.time() - t0, 1),
                "columns": prover.setup.air.n_cm1,
                "new_state_root": bp.publics.new_state_root,
                "verified": bool(verify(prover.setup, prover.verkey,
                                        proof))}
        assert out["verified"]
        if want is not None:
            out["match"] = bp.publics.new_state_root == want

    print(json.dumps(out))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
