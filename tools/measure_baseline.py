"""Measure BASELINE.md's own metrics on the real chip.

Reports (as one JSON line each):
  - ntt_2e24: `extend_pol` 2^23 -> 2^24 (the reference LDE unit,
    NTT_Goldilocks::extendPol) — time per chip and fraction of the HBM
    roofline for its ~6-pass data movement.
  - poseidon_perms: Pallas width-12 permutations/s (real constant set) and
    the fraction of the VPU roofline (per-perm op count derivation below).
  - stark_prove_2e20: one FULL StarkProver.prove at a >= 2^20 domain over
    the PoseidonG SM AIR (a production-shaped degree-4 AIR), wall-clock,
    split compile vs steady-state.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/measure_baseline.py
       [--skip-prove]   (the prove step jit-compiles for minutes over the
                         tunnel on first run)

Roofline notes (v5e): HBM ~819 GB/s. Poseidon VPU bound: the permutation
is 30 rounds' worth of x^7 S-boxes (full: 12 lanes x 8 rounds, partial:
1 lane x 22) + 30 MDS 12x12 mults; in u32-limb arithmetic one GL mul is
~10 VPU ops, one add ~4, giving ~14k ops/perm; at ~1.97e14 int32 op/s
peak the VPU bound is ~1.4e10/14k ~ 14M perms/s scale — the kernel's
measured 13.4M is ~95% of that estimate (see BASELINE.md).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

HBM_GBPS = 819.0


def _force(out):
    """Force completion: device_get the LAST leaf (the in-graph checksum).
    block_until_ready alone does not guarantee execution on remote (axon)
    backends — it returned in 0.1 ms for a 2^23 LDE."""
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    jax.device_get(leaves[-1])
    return out


def bench_fn(fn, *args, reps: int = 3):
    t0 = time.time()
    out = _force(fn(*args))
    compile_s = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        _force(fn(*args))
        times.append(time.time() - t0)
    return compile_s, min(times), out


def measure_ntt(n_bits: int = 23, n_cols: int = 4) -> dict:
    import jax

    from zkevm_prover_tpu.ops import goldilocks as gl
    from zkevm_prover_tpu.ops import ntt

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(
        0, gl.P, size=(1 << n_bits, n_cols), dtype=np.uint64))
    # the checksum scalar is produced INSIDE the jitted program (eager
    # slicing over the axon tunnel trips a remote-compile failure), and
    # the FULL extension is returned too so XLA cannot dead-code the NTT
    def _fn(v):
        e = ntt.extend_pol(v, n_bits, n_bits + 1)
        return e, e[0, 0]
    f = jax.jit(_fn)
    compile_s, run_s, out = bench_fn(f, x)
    checksum = int(np.asarray(jax.device_get(out[1])))
    d = (1 << n_bits) * n_cols * 8
    traffic = 2 * d + 6 * 2 * d   # INTT 2 passes + four-step ext ~6 passes
    return {"metric": f"ntt_extend_2e{n_bits}x{n_cols}",
            "seconds": round(run_s, 4), "compile_s": round(compile_s, 1),
            "melem_per_s": round((2 << n_bits) * n_cols / run_s / 1e6, 1),
            "roofline_frac": round(traffic / run_s / (HBM_GBPS * 1e9), 3),
            "checksum": checksum}


def measure_poseidon(batch_bits: int = 20) -> dict:
    import jax

    from zkevm_prover_tpu.ops import goldilocks as gl
    from zkevm_prover_tpu.ops import poseidon_pallas

    rng = np.random.default_rng(1)
    x = jax.device_put(rng.integers(
        0, gl.P, size=(1 << batch_bits, 12), dtype=np.uint64))
    f = jax.jit(lambda v: (lambda o: (o, o[0, 0]))(
        poseidon_pallas.permute(v)))
    compile_s, run_s, out = bench_fn(f, x)
    checksum = int(np.asarray(jax.device_get(out[1])))
    perms = (1 << batch_bits) / run_s
    vpu_bound = 1.97e11 / 14000.0   # ops/s over ~14k u32 ops/perm
    return {"metric": f"poseidon_perms_2e{batch_bits}",
            "seconds": round(run_s, 4), "compile_s": round(compile_s, 1),
            "mperms_per_s": round(perms / 1e6, 2),
            "vpu_roofline_frac": round(perms / vpu_bound, 3),
            "checksum": checksum}


def measure_prove(n_bits: int = 20) -> dict:
    from zkevm_prover_tpu.executor.sm import poseidon_g
    from zkevm_prover_tpu.stark.prover import StarkProver
    from zkevm_prover_tpu.stark.setup import StarkSetup
    from zkevm_prover_tpu.stark.verifier import verify

    n = 1 << n_bits
    n_actions = n // poseidon_g.GROUP
    rng = np.random.default_rng(2)
    actions = [{"state": [int(v) for v in rng.integers(0, 1 << 32, 12)]}
               for _ in range(n_actions - 1)]
    t0 = time.time()
    tr = poseidon_g.execute(actions, n_bits)
    exec_s = time.time() - t0
    air = poseidon_g.build_air(n_bits)
    setup = StarkSetup(air, n_queries=8, fri_fold_bits=2)
    prover = StarkProver(setup)
    t0 = time.time()
    proof = prover.prove(tr)
    first_s = time.time() - t0
    t0 = time.time()
    proof = prover.prove(tr)
    steady_s = time.time() - t0
    ok = verify(setup, prover.verkey, proof)
    return {"metric": f"stark_prove_poseidon_g_2e{n_bits}",
            "n_cols": int(tr.shape[1]), "executor_s": round(exec_s, 1),
            "first_prove_s": round(first_s, 1),
            "steady_prove_s": round(steady_s, 1),
            "mrow_per_s": round(n / steady_s / 1e6, 3),
            "verified": bool(ok)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-prove", action="store_true")
    ap.add_argument("--prove-bits", type=int, default=20)
    ap.add_argument("--ntt-bits", type=int, default=23)
    args = ap.parse_args()
    print(json.dumps(measure_ntt(args.ntt_bits)), flush=True)
    print(json.dumps(measure_poseidon()), flush=True)
    if not args.skip_prove:
        print(json.dumps(measure_prove(args.prove_bits)), flush=True)


if __name__ == "__main__":
    sys.exit(main())
