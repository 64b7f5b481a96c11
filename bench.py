"""Headline benchmark: the STARK commit phase on one TPU chip.

Measures exactly the reference's STARK_STEP_1 hot path (Starks::genProof
phase 1, src/starkpil/starks.cpp:53-60): low-degree extension of the
committed trace (INTT 2^21 + coset NTT 2^22 over 64 columns — 1 GB of
trace, a production-shaped column count slice) followed by the Poseidon
Merkle tree over the extended rows (linear hash + reduction to the root —
the Pallas VMEM kernel on TPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value = extended-domain rows committed per second (N_ext / wall).
vs_baseline = fraction of the BINDING per-chip roofline — the larger of
the phase's two physical lower bounds (BASELINE.md target: >= 0.90):

  HBM bound (the LDE data movement, v5e ~819 GB/s):
    INTT N          read + write          2 passes over D bytes
    coset NTT 2N    four-step, 2 butterfly stages + transpose
                    ~3 reads + 3 writes over 2D
    Poseidon leaves read 2N rows          2D
    tree levels     ~2N/8 hashes of 8B*8  ~0.3 D
    total ~ 10.3 * D,   D = N * C * 8 bytes          (~14 ms here)

  Poseidon compute bound (dominates this phase):
    perms = 2N * ceil(C/8)  leaf sponge  +  ~2N  tree levels
    bounded by the standalone Pallas kernel rate MEASURED IN THIS RUN on
    this chip at the pipeline's own batch scale (mxu96 mode: the 12x12
    circulant MDS rides the MXU as int8 (M kron I_8) limb matmuls, the
    VPU keeps only s-boxes + 3-limb recombination; ~21M perms/s at 2^20,
    ~30M fully amortized at 2^22). The phase cannot hash faster than its
    own kernel, so perms / kernel_rate is a sound speed-of-light floor
    (~1.25 s here); the residual gap to the floor is the LDE's VPU time
    (~0.8 s standalone; the MXU limb-matmul NTT measured SLOWER than the
    VPU butterflies at this shape — artifacts/bench/ntt_2e21x64.json).

The phase is Poseidon-compute-bound: vs_baseline = binding_bound /
measured, with the HBM bound (14 ms) shown in the derivation only. The
reference repo publishes no numbers of its own (BASELINE.md:
published {}).
"""

import json
import sys
import time

import numpy as np

N_BITS = 21
N_BITS_EXT = 22
N_COLS = 64
HBM_GBPS = 819.0        # v5e single-chip HBM bandwidth
TRAFFIC_FACTOR = 10.3   # HBM passes over the trace bytes (derivation above)


def _measure_perm_rate() -> float:
    """Standalone Pallas Poseidon kernel perms/s, measured on THIS chip in
    THIS run — the compute bound must come from the same hardware as the
    phase measurement (a constant from another chip/day skews the ratio
    both ways). The checksum rides the jitted program; device_get of it
    forces completion (block_until_ready alone does not, on axon)."""
    import jax

    from zkevm_prover_tpu.ops import goldilocks as gl
    from zkevm_prover_tpu.ops import poseidon_pallas

    batch = 1 << 22   # the pipeline's own leaf-hash scale: the floor must
    #                   reflect the kernel's best (fully amortized) rate
    rng = np.random.default_rng(1)
    x = jax.device_put(
        rng.integers(0, gl.P, size=(batch, 12), dtype=np.uint64))
    f = jax.jit(lambda v: (lambda o: o[0, 0])(poseidon_pallas.permute(v)))
    jax.device_get(f(x))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(f(x))
        times.append(time.perf_counter() - t0)
    return batch / min(times)


def main() -> None:
    import jax

    from zkevm_prover_tpu.ops import goldilocks as gl
    from zkevm_prover_tpu.parallel import pipeline

    perm_rate = _measure_perm_rate()
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

    d_bytes = (1 << N_BITS) * N_COLS * 8
    t_hbm = TRAFFIC_FACTOR * d_bytes / (HBM_GBPS * 1e9)
    n_ext = 1 << N_BITS_EXT
    perms = n_ext * (-(-N_COLS // 8)) + n_ext  # leaf sponge + tree levels
    t_vpu = perms / perm_rate
    t_bound = max(t_hbm, t_vpu)  # the BINDING roofline
    mrow_s = n_ext / best / 1e6
    print(json.dumps({
        "metric": "stark_commit_lde_merkle_2e22x64",
        "value": round(mrow_s, 3),
        "unit": "Mrow/s",
        "vs_baseline": round(t_bound / best, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
