"""Sharded combined-AIR proof at scale on the 8-way virtual mesh:
bit-identity vs single-chip, wall-clock reported.

The driver's dryrun (__graft_entry__.dryrun_multichip) validates the
sharded prover at small shapes on every round; this tool runs the SAME
mesh path at >= 2^16 over the full combined batch AIR (the spine's AIR:
Main + co-SMs with in-circuit bindings) and asserts the 8-way proof is
bit-identical to the single-chip proof. Results go to MULTICHIP_SCALE.json.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/run_multichip_scale.py [--n-bits 16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-bits", type=int, default=16)
    ap.add_argument("--out", default="MULTICHIP_SCALE.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from zkevm_prover_tpu.executor import combined, forks
    from zkevm_prover_tpu.hashdb.database import Database
    from zkevm_prover_tpu.parallel import mesh as meshmod
    from zkevm_prover_tpu.prover.input import ProofInput
    from zkevm_prover_tpu.stark.prover import StarkProver
    from zkevm_prover_tpu.stark.setup import StarkSetup
    from zkevm_prover_tpu.stark.verifier import verify
    from zkevm_prover_tpu.hashdb.smt import Smt

    e2e = "/root/reference/testvectors/e2e/fork_9/input_executor_0.json"
    inp = ProofInput.from_file(e2e)

    db = Database()
    inp.seed_database(db)
    smt = Smt(db)
    rom = forks.rom_for_fork(int(inp.publics.fork_id))
    include = combined.default_include(args.n_bits)

    t0 = time.time()
    res, traces = combined.execute_batch(
        rom, args.n_bits, input=inp.executor_input(), smt=smt,
        include=include)
    exec_s = time.time() - t0

    air = combined.build_batch_air(rom, args.n_bits, include=include)
    stacked = air.stack_traces(traces)

    # single-chip
    setup = StarkSetup(air, n_queries=8, fri_fold_bits=2)
    t0 = time.time()
    p1 = StarkProver(setup)
    proof1 = p1.prove(stacked)
    single_s = time.time() - t0
    assert verify(setup, p1.verkey, proof1)

    # 8-way mesh, same setup
    devices = jax.devices()[:8]
    mesh = meshmod.make_mesh(devices)
    t0 = time.time()
    p8 = StarkProver(setup, mesh=mesh)
    proof8 = p8.prove(stacked)
    mesh_s = time.time() - t0
    assert verify(setup, p8.verkey, proof8)

    # bit-identity: serialized proofs match exactly
    import pickle

    b1, b8 = pickle.dumps(proof1.__dict__), pickle.dumps(proof8.__dict__)
    identical = b1 == b8
    if not identical:
        # compare field by field for the report
        same_roots = all(
            (np.asarray(a) == np.asarray(b)).all()
            for a, b in zip(proof1.roots, proof8.roots))
    else:
        same_roots = True

    out = {
        "n_bits": args.n_bits,
        "n_cols": int(stacked.shape[1]),
        "include": list(include),
        "n_devices": 8,
        "executor_s": round(exec_s, 1),
        "single_chip_prove_s": round(single_s, 1),
        "mesh8_prove_s": round(mesh_s, 1),
        "bit_identical": bool(identical),
        "roots_match": bool(same_roots),
        "verified": True,
    }
    print(json.dumps(out))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    assert identical, "8-way proof differs from single-chip"
    return 0


if __name__ == "__main__":
    sys.exit(main())
