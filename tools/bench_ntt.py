"""Compare LDE implementations on the chip: VPU butterflies (ops/ntt) vs
MXU limb matmuls (ops/ntt_mxu), at the headline-bench shape.

Usage: python tools/bench_ntt.py [--n-bits 21] [--n-cols 64] [--impl both]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench(fn, x, reps=3):
    """Returns only a mod-p checksum of the full output — the reduction
    depends on every output element (no dead-code risk) and avoids holding
    a second full-size extension buffer for the host transfer."""
    import jax

    from zkevm_prover_tpu.ops import goldilocks as gl

    f = jax.jit(lambda v: gl.modsum(gl.modsum(fn(v), 0), 0))
    t0 = time.time()
    out = f(x)
    jax.device_get(out)
    compile_s = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        jax.device_get(f(x))
        times.append(time.time() - t0)
    return compile_s, min(times), int(np.asarray(jax.device_get(out)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-bits", type=int, default=21)
    ap.add_argument("--n-cols", type=int, default=64)
    ap.add_argument("--impl", default="both",
                    choices=["both", "vpu", "mxu"])
    args = ap.parse_args()

    import jax

    from zkevm_prover_tpu.ops import goldilocks as gl
    from zkevm_prover_tpu.ops import ntt, ntt_mxu

    nb, ne, nc = args.n_bits, args.n_bits + 1, args.n_cols
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.integers(0, gl.P, size=(1 << nb, nc), dtype=np.uint64))

    res = {}
    if args.impl in ("both", "vpu"):
        c, t, chk = bench(lambda v: ntt.extend_pol(v, nb, ne), x)
        res["vpu"] = {"compile_s": round(c, 1), "seconds": round(t, 4),
                      "melem_per_s": round((1 << ne) * nc / t / 1e6, 1),
                      "checksum": chk}
        print(json.dumps({"impl": "vpu", **res["vpu"]}), flush=True)
    if args.impl in ("both", "mxu"):
        c, t, chk = bench(lambda v: ntt_mxu.extend_pol(v, nb, ne), x)
        res["mxu"] = {"compile_s": round(c, 1), "seconds": round(t, 4),
                      "melem_per_s": round((1 << ne) * nc / t / 1e6, 1),
                      "checksum": chk}
        print(json.dumps({"impl": "mxu", **res["mxu"]}), flush=True)
    if len(res) == 2:
        assert res["vpu"]["checksum"] == res["mxu"]["checksum"], \
            "implementations disagree"
        print(json.dumps({
            "speedup_mxu_over_vpu": round(
                res["vpu"]["seconds"] / res["mxu"]["seconds"], 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
