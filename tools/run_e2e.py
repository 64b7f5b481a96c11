"""Attempt to run a reference e2e testvector through the Main SM interpreter.

Usage: python tools/run_e2e.py [input.json] [n_bits]

Loads the reference fork_9 rom.json, seeds the SMT database from the
vector's db/contractsBytecode, and runs the ROM in process-batch mode
(early exit at finalizeExecution).  Prints the reached step count and
compares new_state_root against the vector's newStateRoot.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from zkevm_prover_tpu.executor import forks
from zkevm_prover_tpu.executor.sm.main_sm import MainExecutor, ExecutorError
from zkevm_prover_tpu.hashdb.database import Database
from zkevm_prover_tpu.hashdb.smt import Smt
from zkevm_prover_tpu.prover.input import ProofInput, scalar_to_fe4


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/testvectors/e2e/fork_9/input_executor_0.json"
    n_bits = int(sys.argv[2]) if len(sys.argv) > 2 else 23

    pi = ProofInput.from_file(path)
    db = Database()
    pi.seed_database(db)
    smt = Smt(db)
    print(f"input: {path}")
    print(f"db nodes: {len(db)}  l1InfoTree: {len(pi.l1_info_tree)} "
          f"batchL2Data: {len(pi.publics.batch_l2_data) // 2 - 1} bytes")

    rom = forks.rom_for_fork(int(pi.publics.fork_id))
    print(f"rom (fork {pi.publics.fork_id}): {len(rom)} lines, "
          f"finalizeExecution at {rom.labels.get('finalizeExecution')}")

    ex = MainExecutor(rom, n_bits)
    hist = None
    if os.environ.get("E2E_DEBUG"):
        import collections
        hist = collections.deque(maxlen=int(os.environ.get("E2E_HIST", "40")))

        def on_step(step, zk_pc, ln, ctx):
            hist.append((step, zk_pc, (ln.line_str or "").strip()))
        ex.on_step = on_step
    t0 = time.time()
    try:
        res = ex.execute(pi.executor_input(), smt=smt, process_batch=True)
    except ExecutorError as e:
        print(f"FAILED after {time.time() - t0:.1f}s: {e}")
        if hist:
            print("last steps:")
            for step, pc, s in hist:
                print(f"  {step:7d} {pc:6d} {s[:100]}")
        raise SystemExit(1)
    dt = time.time() - t0
    got = 0
    if res.new_state_root is not None:
        for i, fe in enumerate(res.new_state_root):
            got |= int(fe) << (64 * i)
    want = int(pi.publics.new_state_root, 16)
    print(f"finished in {dt:.1f}s: last_step={res.last_step} "
          f"({res.last_step / dt:.0f} steps/s)")
    print(f"counters: {res.counters}")
    print(f"newStateRoot got  = {got:#066x}")
    print(f"newStateRoot want = {want:#066x}")
    print("MATCH" if got == want else "MISMATCH")
    raise SystemExit(0 if got == want else 2)


if __name__ == "__main__":
    main()
