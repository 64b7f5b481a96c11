"""Batched Poseidon-Goldilocks permutation and hashing on device (JAX).

TPU-native replacement for the reference's `PoseidonGoldilocks`
(`hash_full_result`, `linear_hash`, `merkletree_avx` — absent submodule; call
sites: src/starkpil/transcript/transcript.cpp:23,46,
src/starkpil/merkleTree/merkleTreeGL.cpp:37-44). The reference batches 4/8
hashes per AVX2/AVX512 instruction; here the batch axis is the leading array
axis and the VPU vectorizes across it — the natural TPU formulation is
"hash a million rows at once".

All functions are jit-friendly; the 30-round loop is unrolled at trace time
(static), letting XLA fuse the whole permutation into one kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import goldilocks as gl
from . import poseidon_constants as pc

WIDTH = pc.WIDTH
CAPACITY = 4
RATE = 8
HASH_SIZE = 4


@functools.lru_cache(maxsize=4)
def _tables_host(source: str):
    """Host copies of (C, M) for the active constant set. Cached as NUMPY —
    never cache device arrays here: the first call may happen inside a jit
    trace, where jnp constants are tracers that must not outlive the trace."""
    C = np.array(pc.round_constants(), dtype=np.uint64).reshape(pc.N_ROUNDS, WIDTH)
    M = np.array(pc.mds_matrix(), dtype=np.uint64)
    return C, M


def _tables(source: str):
    C, M = _tables_host(source)
    return jnp.asarray(C), jnp.asarray(M)


@functools.lru_cache(maxsize=4)
def _mds_coeffs(source: str):
    """If every MDS entry is a small integer (<= 2^16 — true for the
    reference circulant, max entry 41, and the power-of-two test set), the
    coefficient matrix (host); else None — selects the fast path below."""
    _, M = _tables_host(source)
    coeffs = np.zeros_like(M, dtype=np.int64)
    for i in range(WIDTH):
        for j in range(WIDTH):
            v = int(M[i, j])
            if v == 0 or v > (1 << 16):
                return None
            coeffs[i, j] = v
    return coeffs


def _mds_small(s, coeffs):
    """MDS multiply for small-integer matrices: split each input lane into
    u32 halves, accumulate coefficient-scaled halves (max 12·2^16·2^32 <
    2^53, no u64 overflow), recombine as a 128-bit value and reduce.
    12 integer multiply-adds per output lane instead of 12 full 64x64
    field multiplies."""
    lo = s & np.uint64(0xFFFFFFFF)
    hi = s >> np.uint64(32)
    acc_lo = jnp.zeros_like(s)
    acc_hi = jnp.zeros_like(s)
    for j in range(WIDTH):
        cj = jnp.asarray(coeffs[:, j].astype(np.uint64))  # out-lane coeffs
        acc_lo = acc_lo + lo[..., j, None] * cj
        acc_hi = acc_hi + hi[..., j, None] * cj
    # total = acc_lo + acc_hi·2^32 with acc_lo, acc_hi < 2^53
    lo64 = acc_lo + (acc_hi << np.uint64(32))
    carry = (lo64 < acc_lo).astype(jnp.uint64)
    hi64 = (acc_hi >> np.uint64(32)) + carry
    return gl._reduce128(hi64, lo64)


USE_PALLAS = "auto"  # "auto" | True | False
# below this batch the XLA path wins: the kernel pads to 512 lanes and each
# new shape costs a ~15 s Mosaic compile — small Merkle levels are noise
PALLAS_MIN_BATCH = 4096


def _pallas_wanted() -> bool:
    if USE_PALLAS is True:
        return True
    if USE_PALLAS is False:
        return False
    return jax.default_backend() not in ("cpu",)


def _sbox(x):
    x3 = gl.mul(gl.square(x), x)
    return gl.mul(gl.mul(x3, x3), x)


def _modsum_last(x):
    """Mod-p sum along the last axis via a pairwise reduction tree."""
    n = x.shape[-1]
    while n > 1:
        half = n // 2
        lo = gl.add(x[..., :half], x[..., half : 2 * half])
        if n % 2:
            lo = lo.at[..., 0].set(gl.add(lo[..., 0], x[..., -1]))
        x = lo
        n = half
    return x[..., 0]


def permute(state):
    """Poseidon permutation over (..., 12) uint64 states.

    On TPU with a small-integer MDS (the reference circulant) this
    dispatches to the Pallas kernel (ops/poseidon_pallas.py: whole
    permutation in VMEM on u32 limb pairs, ~2.2x the XLA path on v5e). The
    XLA path below is the fallback (CPU, generic loaded MDS): rounds under
    lax.fori_loop (4 full / 22 partial / 4 full) — a fully unrolled graph
    compiles pathologically slowly on the CPU backend.
    """
    if (state.ndim == 2 and state.shape[0] >= PALLAS_MIN_BATCH
            and _pallas_wanted()):
        from . import poseidon_pallas as pp

        if pp.available():
            return pp.permute(state)
    C, M = _tables(pc.source())
    half = pc.ROUNDS_F // 2
    coeffs = _mds_coeffs(pc.source())

    if coeffs is not None:
        def mds(s):
            return _mds_small(s, coeffs)
    else:
        def mds(s):
            # generic MDS: out_i = sum_j M[i][j] * s_j (e.g. loaded reference
            # constants that are not powers of two)
            return _modsum_last(gl.mul(s[..., None, :], M))

    def full_round(r, s):
        return mds(_sbox(gl.add(s, C[r])))

    def partial_round(r, s):
        s = gl.add(s, C[r])
        s = s.at[..., 0].set(_sbox(s[..., 0]))
        return mds(s)

    s = jax.lax.fori_loop(0, half, full_round, state)
    s = jax.lax.fori_loop(half, half + pc.ROUNDS_P, partial_round, s)
    s = jax.lax.fori_loop(half + pc.ROUNDS_P, pc.N_ROUNDS, full_round, s)
    return s


def hash_n_to_4(inputs):
    """Single-permutation hash of (..., <=12) inputs (zero-padded)."""
    *batch, n = inputs.shape
    if n < WIDTH:
        pad = jnp.zeros((*batch, WIDTH - n), dtype=jnp.uint64)
        inputs = jnp.concatenate([inputs, pad], axis=-1)
    return permute(inputs)[..., :HASH_SIZE]


def linear_hash(rows):
    """Row-wise sponge hash: (H, W) -> (H, 4).

    Chunks of RATE elements, previous digest carried in the capacity. Rows of
    width <= 4 are zero-padded copies (leaf convention of the reference's
    linear_hash for narrow sources).
    """
    h, wdt = rows.shape
    if wdt <= HASH_SIZE:
        out = jnp.zeros((h, HASH_SIZE), dtype=jnp.uint64)
        return out.at[:, :wdt].set(rows)
    digest = jnp.zeros((h, HASH_SIZE), dtype=jnp.uint64)
    for off in range(0, wdt, RATE):
        chunk = rows[:, off : off + RATE]
        if chunk.shape[1] < RATE:
            chunk = jnp.concatenate(
                [chunk, jnp.zeros((h, RATE - chunk.shape[1]), dtype=jnp.uint64)], axis=1
            )
        digest = permute(jnp.concatenate([chunk, digest], axis=1))[:, :HASH_SIZE]
    return digest


def linear_hash_fold(rows, digest):
    """Continue a row-wise sponge from `digest` over more columns.

    Same chunking as linear_hash (RATE-wide chunks, digest in capacity);
    splitting a wide hash into column blocks of a RATE multiple and
    folding block-by-block produces bit-identical digests while bounding
    each XLA program's working set (pallas custom-call buffers do not
    alias, so one fused program over W columns holds W/RATE permutation
    buffers at once)."""
    h, wdt = rows.shape
    for off in range(0, wdt, RATE):
        chunk = rows[:, off : off + RATE]
        if chunk.shape[1] < RATE:
            chunk = jnp.concatenate(
                [chunk, jnp.zeros((h, RATE - chunk.shape[1]),
                                  dtype=jnp.uint64)], axis=1)
        digest = permute(jnp.concatenate([chunk, digest], axis=1))[:, :HASH_SIZE]
    return digest


def hash_level(nodes):
    """One Merkle reduction level: (H, 4) -> (H/2, 4)."""
    h = nodes.shape[0]
    pairs = nodes.reshape(h // 2, 2 * HASH_SIZE)
    cap = jnp.zeros((h // 2, WIDTH - 2 * HASH_SIZE), dtype=jnp.uint64)
    return permute(jnp.concatenate([pairs, cap], axis=1))[:, :HASH_SIZE]
