"""CLI — the zkProver process shell.

Reference: src/main.cpp (`zkProver [-c config.json]`, main.cpp:293-845):
load config, construct the Prover, then launch servers / clients /
file-runners per the config's run-mode booleans.

Usage:
    python -m zkevm_prover_tpu -c config.json
    python -m zkevm_prover_tpu --prove input.json -o proof_dir/
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="zkevm-prover-tpu")
    ap.add_argument("-c", "--config", help="config JSON (reference schema)")
    ap.add_argument("--prove", help="one-shot: prove an input JSON file")
    ap.add_argument("-o", "--output", default="output", help="output dir")
    ap.add_argument("-v", "--version", action="store_true")
    args = ap.parse_args(argv)

    from . import __version__

    if args.version:
        print(f"zkevm-prover-tpu {__version__}")
        return 0

    from .prover import ProofInput, Prover
    from .utils import Config, zklog

    cfg = Config.load(args.config)
    errors = cfg.check()
    if errors:
        for e in errors:
            zklog.error(e)
        return 1
    zklog.set_json_logs(cfg.jsonLogs)
    cfg.print()

    prover = Prover()

    if args.prove or cfg.runFileGenBatchProof:
        path = args.prove or cfg.runFileGenBatchProof
        with open(path) as f:
            inp = ProofInput.from_json(f.read())
        zklog.info(f"genBatchProof: {path}")
        t0 = time.time()
        bp = prover.gen_batch_proof(inp)
        ok = prover.verify_batch_proof(bp)
        zklog.info(f"batch proof done in {time.time() - t0:.1f}s verified={ok}")
        os.makedirs(args.output, exist_ok=True)
        out = {
            "publics": dataclasses.asdict(bp.publics),
            "counters": bp.counters,
            "proofs": {
                name: proof.to_json()
                for name, (prv, proof) in bp.sm_proofs.items()
            },
        }
        out_path = os.path.join(args.output, "batch_proof.json")
        with open(out_path, "w") as f:
            json.dump(out, f)
        zklog.info(f"proof written to {out_path}")
        return 0 if ok else 1

    servers = []
    if cfg.runHashDBServer:
        from .services import serve_hashdb

        servers.append(serve_hashdb(cfg.hashDBServerPort))
        zklog.info(f"HashDB server on :{cfg.hashDBServerPort}")
    if cfg.runExecutorServer:
        from .services import serve_executor

        servers.append(serve_executor(cfg.executorServerPort, prover))
        zklog.info(f"Executor server on :{cfg.executorServerPort}")
    client = None
    if cfg.runAggregatorClient:
        from .services import AggregatorClient

        target = f"{cfg.aggregatorClientHost}:{cfg.aggregatorClientPort}"
        client = AggregatorClient(
            prover, target, prover_name=cfg.proverName,
            watchdog_timeout_s=cfg.aggregatorClientWatchdogTimeout / 1e6,
        ).start()
        zklog.info(f"Aggregator client dialing {target}")

    if not servers and client is None:
        zklog.warning("nothing to run (no run-mode flags set)")
        return 0

    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        zklog.info("shutting down")
        for s in servers:
            s.stop(1)
        if client:
            client.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
