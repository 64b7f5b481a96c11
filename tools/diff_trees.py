"""Diff the SMT leaves our batch-0 execution produced against the expected
tree (reconstructed from batch-1's input db, which carries the node
preimages of the expected newStateRoot).

Usage: python tools/diff_trees.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from zkevm_prover_tpu.executor.rom import Rom
from zkevm_prover_tpu.executor.sm.main_sm import MainExecutor
from zkevm_prover_tpu.hashdb.database import Database
from zkevm_prover_tpu.hashdb.smt import Smt
from zkevm_prover_tpu.prover.input import ProofInput, scalar_to_fe4

E2E = "/root/reference/testvectors/e2e/fork_9"


def walk(db, root, path=()):
    """Yield (path_bits, rkey, value_scalar) for every leaf under root."""
    if tuple(root) == (0, 0, 0, 0):
        return
    node = db.read(root)
    if node is None:
        yield (path, None, None)  # unresolvable — missing preimage
        return
    if node[8] == 1:  # leaf
        value_hash = tuple(node[4:8])
        leaf = db.read(value_hash)
        val = 0
        if leaf is not None:
            for i, fe in enumerate(leaf[:8]):
                val |= int(fe) << (32 * i)
        yield (path, tuple(node[0:4]), val)
        return
    yield from walk(db, tuple(node[0:4]), path + (0,))
    yield from walk(db, tuple(node[4:8]), path + (1,))


def main():
    # ours: run batch 0
    pi0 = ProofInput.from_file(f"{E2E}/input_executor_0.json")
    db = Database()
    pi0.seed_database(db)
    smt = Smt(db)
    rom = Rom.from_json("/root/reference/src/main_sm/fork_9/scripts/rom.json")
    res = MainExecutor(rom, 23).execute(pi0.executor_input(), smt=smt,
                                        process_batch=True)
    got_root = tuple(res.new_state_root)

    # expected: batch 1's db holds the expected tree's nodes
    pi1 = ProofInput.from_file(f"{E2E}/input_executor_1.json")
    edb = Database()
    pi1.seed_database(edb)
    want_root = scalar_to_fe4(int(pi1.publics.old_state_root, 16))

    ours = {}
    for path, rkey, val in walk(db, got_root):
        ours[(path, rkey)] = val
    theirs = {}
    for path, rkey, val in walk(edb, want_root):
        theirs[(path, rkey)] = val

    print(f"ours: {len(ours)} leaves, expected: {len(theirs)} leaves")
    for k in sorted(set(ours) | set(theirs)):
        o, t = ours.get(k), theirs.get(k)
        if o != t:
            path, rkey = k
            print(f"path={''.join(map(str, path))} rkey={rkey}")
            print(f"  ours     = {o:#x}" if o is not None else "  ours     = absent")
            print(f"  expected = {t:#x}" if t is not None else "  expected = absent")


if __name__ == "__main__":
    main()
