"""Headline benchmark: Goldilocks low-degree extension (the hot op of the
STARK prover, reference NTT_Goldilocks::extendPol at src/starkpil/starks.cpp:53)
on one TPU chip: INTT 2^23 + coset scale + NTT 2^24 over 4 columns.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md); we normalize
against a documented nominal for its AVX-512 NTT path — 100 Melem/s per
socket for a 2^24-point Goldilocks NTT pass-equivalent (conservative estimate
for a 32-core AVX-512 Xeon; the reference's own measurement mechanism is only
phase timers, src/utils/timer.hpp:17-27). value/unit are measured, the
normalization constant is fixed across rounds so the trend is comparable.
"""

import json
import sys
import time

import numpy as np

REFERENCE_NOMINAL_MELEM_S = 100.0  # documented normalization constant


def main() -> None:
    import jax

    from zkevm_prover_tpu.ops import goldilocks as gl
    from zkevm_prover_tpu.ops import ntt as nttmod

    n_bits, n_bits_ext, n_cols = 23, 24, 4
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.integers(0, gl.P, size=(1 << n_bits, n_cols), dtype=np.uint64)
    )

    # return an 8-byte checksum and fetch it to host each iteration: on remote
    # backends (axon tunnel) block_until_ready alone does not guarantee the
    # computation ran — a device_get of a value that depends on every output
    # element does.
    def run(v):
        ext = nttmod.extend_pol(v, n_bits, n_bits_ext)
        return gl.modsum(gl.modsum(ext, 0), 0)

    fn = jax.jit(run)
    int(jax.device_get(fn(x)))  # compile + warm

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        int(jax.device_get(fn(x)))
        times.append(time.perf_counter() - t0)
    best = min(times)

    # work: one INTT at 2^23 + one NTT at 2^24, n_cols columns
    elems = ((1 << n_bits) + (1 << n_bits_ext)) * n_cols
    melem_s = elems / best / 1e6
    print(json.dumps({
        "metric": "lde_extend_2e23_to_2e24_4col",
        "value": round(melem_s, 3),
        "unit": "Melem/s",
        "vs_baseline": round(melem_s / REFERENCE_NOMINAL_MELEM_S, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
