"""SHA-256 — batched compression function on device.

TPU-native counterpart of the reference's scalar SHA256 (tools/sm/sha256/,
feeding the PaddingSha256/Sha256F state machines, src/sm/sha256_f/). The SM
evaluates gate-level bit-sliced compressions; here a device call compresses an
arbitrary batch of blocks at once (batch axis on the VPU lanes).

`sha256(data)` (host) hashes arbitrary bytes — oracle is hashlib.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_K = np.array([
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
], dtype=np.uint32)

IV = np.array([
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
], dtype=np.uint32)


def _rotr(v, r: int):
    return (v >> np.uint32(r)) | (v << np.uint32(32 - r))


def sha256_compress(state, words):
    """Batched compression: state (..., 8) u32, words (..., 16) u32 -> (..., 8).

    `words` are the 16 big-endian 32-bit words of one 64-byte block. Both the
    message schedule and the 64 rounds run under lax.fori_loop — fully
    unrolled graphs make XLA's CPU backend pathologically slow to compile,
    and on TPU the loop body fuses into one kernel anyway.
    """
    import jax

    k = jnp.asarray(_K)
    batch = words.shape[:-1]
    w0 = jnp.concatenate(
        [words, jnp.zeros((*batch, 48), dtype=jnp.uint32)], axis=-1
    )

    def sched(i, w):
        wm15 = jax.lax.dynamic_index_in_dim(w, i - 15, axis=-1, keepdims=False)
        wm2 = jax.lax.dynamic_index_in_dim(w, i - 2, axis=-1, keepdims=False)
        wm16 = jax.lax.dynamic_index_in_dim(w, i - 16, axis=-1, keepdims=False)
        wm7 = jax.lax.dynamic_index_in_dim(w, i - 7, axis=-1, keepdims=False)
        s0 = _rotr(wm15, 7) ^ _rotr(wm15, 18) ^ (wm15 >> np.uint32(3))
        s1 = _rotr(wm2, 17) ^ _rotr(wm2, 19) ^ (wm2 >> np.uint32(10))
        return jax.lax.dynamic_update_index_in_dim(
            w, wm16 + s0 + wm7 + s1, i, axis=-1
        )

    w = jax.lax.fori_loop(16, 64, sched, w0)

    def round_fn(i, st8):
        a, b, c, d, e, f, g, h = [st8[..., j] for j in range(8)]
        wi = jax.lax.dynamic_index_in_dim(w, i, axis=-1, keepdims=False)
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + k[i] + wi
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        return jnp.stack([t1 + t2, a, b, c, d + t1, e, f, g], axis=-1)

    out = jax.lax.fori_loop(0, 64, round_fn, state.astype(jnp.uint32))
    return out + state


def sha256_blocks(blocks):
    """Digest a batch of pre-padded single-block messages on device.

    blocks: (B, 64) uint8 (already SHA-256-padded). Returns (B, 32) uint8.
    """
    b = jnp.asarray(blocks)
    n = b.shape[0]
    by = b.reshape(n, 16, 4).astype(jnp.uint32)
    words = (
        (by[..., 0] << np.uint32(24)) | (by[..., 1] << np.uint32(16))
        | (by[..., 2] << np.uint32(8)) | by[..., 3]
    )
    state = jnp.broadcast_to(jnp.asarray(IV), (n, 8))
    out = sha256_compress(state, words)
    parts = [
        ((out >> np.uint32(24 - 8 * i)) & np.uint32(0xFF)).astype(jnp.uint8)
        for i in range(4)
    ]
    return jnp.stack(parts, axis=-1).reshape(n, 32)


def sha256(data: bytes) -> bytes:
    """Host SHA-256 of arbitrary bytes (reference: tools/sm/sha256 SHA256())."""
    import hashlib

    return hashlib.sha256(data).digest()
