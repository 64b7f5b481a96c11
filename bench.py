"""Headline benchmark: the STARK commit phase on one TPU chip.

Measures exactly the reference's STARK_STEP_1 hot path (Starks::genProof
phase 1, src/starkpil/starks.cpp:53-60): low-degree extension of the
committed trace (INTT 2^22 + coset NTT 2^23, 8 columns) followed by the
Poseidon Merkle tree over the extended rows (linear hash + reduction to the
root — the Pallas VMEM kernel on TPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value = extended-domain rows committed per second (N_ext / wall).
vs_baseline: the reference publishes no numbers (BASELINE.md); the
normalization constant is a documented nominal for its AVX-512 pipeline —
2^23 rows of LDE+merkelize in 4 s on a 32-core Xeon (≈ 2.1 Mrow/s) — fixed
across rounds so the trend is comparable.
"""

import json
import sys
import time

import numpy as np

REFERENCE_NOMINAL_MROW_S = 2.1  # documented normalization constant

N_BITS = 22
N_BITS_EXT = 23
N_COLS = 8


def main() -> None:
    import jax
    import jax.numpy as jnp

    from zkevm_prover_tpu.ops import goldilocks as gl
    from zkevm_prover_tpu.parallel import pipeline

    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.integers(0, gl.P, size=(1 << N_BITS, N_COLS), dtype=np.uint64)
    )

    fn = jax.jit(lambda v: pipeline.commit_step(v, N_BITS, N_BITS_EXT))
    # device_get of the root forces completion on remote (axon) backends,
    # where block_until_ready alone does not guarantee execution
    jax.device_get(fn(x))  # compile + warm

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(fn(x))
        times.append(time.perf_counter() - t0)
    best = min(times)

    mrow_s = (1 << N_BITS_EXT) / best / 1e6
    print(json.dumps({
        "metric": "stark_commit_lde_merkle_2e23x8",
        "value": round(mrow_s, 3),
        "unit": "Mrow/s",
        "vs_baseline": round(mrow_s / REFERENCE_NOMINAL_MROW_S, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
