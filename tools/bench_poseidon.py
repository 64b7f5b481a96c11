"""Microbenchmark the Poseidon-GL permutation kernels on the real chip.

Measures perms/s for each available implementation (pallas blocked / 2d /
1d, XLA fori path) at a few batch sizes, prints one JSON line per result.
The binding bench.py roofline is derived from the winner, so kernel work
must move THIS number (VERDICT r04 weak #2).

Usage: python tools/bench_poseidon.py [--modes blocked,mxu] [--batch 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(fn, x, reps=3):
    import jax

    jax.device_get(fn(x))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(fn(x))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="blocked,2d,1d")
    ap.add_argument("--batch", type=int, default=20, help="log2 batch")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/zkevm_prover_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from zkevm_prover_tpu.ops import goldilocks as gl
    from zkevm_prover_tpu.ops import poseidon_pallas as pp

    batch = 1 << args.batch
    rng = np.random.default_rng(1)
    x = jax.device_put(
        rng.integers(0, gl.P, size=(batch, 12), dtype=np.uint64))

    results = []
    for mode in args.modes.split(","):
        mode = mode.strip()
        try:
            old = pp.MODE
            pp.MODE = mode
            f = jax.jit(lambda v: (lambda o: o[0, 0])(pp.permute(v)))
            dt = measure(f, x)
            rate = batch / dt
            results.append({"mode": mode, "batch": batch,
                            "perms_per_s": round(rate / 1e6, 2)})
            print(json.dumps(results[-1]))
        except Exception as e:  # noqa: BLE001 - report and continue
            print(json.dumps({"mode": mode, "error": repr(e)[:200]}))
        finally:
            pp.MODE = old
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
