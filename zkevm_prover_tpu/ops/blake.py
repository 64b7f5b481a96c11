"""Blake2b-256 on device — batched compression in XLA uint64 lanes.

Reference: tools/sm/blake/blake.cpp (Blake2b_256 over a gate list,
Blake2b256_Test known-vector self-test in the unit runner). TPU-native
redesign: the 12-round compression runs as vectorized uint64 ops over a
batch of states/blocks (one lax.fori_loop over rounds, the G quarter-
rounds unrolled per the SIGMA schedule), instead of replaying a gate
script. The sponge framing (parameter block, counter, finalization flag)
stays on host — it is a handful of integer ops per message.
"""

from __future__ import annotations

import functools

import numpy as np

IV = np.array([
    0x6A09E667F3BCC908, 0xBB67AE8584CAA73B, 0x3C6EF372FE94F82B,
    0xA54FF53A5F1D36F1, 0x510E527FADE682D1, 0x9B05688C2B3E6C1F,
    0x1F83D9ABFB41BD6B, 0x5BE0CD19137E2179], dtype=np.uint64)

SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
]


@functools.lru_cache(maxsize=1)
def _compress_jit():
    import jax
    import jax.numpy as jnp

    sigma = jnp.asarray(np.array(SIGMA, dtype=np.int32))

    def rotr(x, r):
        return (x >> jnp.uint64(r)) | (x << jnp.uint64(64 - r))

    def compress(h, m, t, last):
        """h (B,8), m (B,16), t (B,), last (B,) -> new h (B,8)."""
        ivb = jnp.asarray(IV)
        v = jnp.concatenate(
            [h, jnp.broadcast_to(ivb, h.shape[:-1] + (8,))], axis=-1)
        v = v.at[..., 12].set(v[..., 12] ^ t)
        flag = jnp.where(last, jnp.uint64(0xFFFFFFFFFFFFFFFF),
                         jnp.uint64(0))
        v = v.at[..., 14].set(v[..., 14] ^ flag)

        def g(v, a, b, c, d, x, y):
            va = v[..., a] + v[..., b] + x
            vd = rotr(v[..., d] ^ va, 32)
            vc = v[..., c] + vd
            vb = rotr(v[..., b] ^ vc, 24)
            va = va + vb + y
            vd = rotr(vd ^ va, 16)
            vc = vc + vd
            vb = rotr(vb ^ vc, 63)
            return v.at[..., a].set(va).at[..., b].set(vb) \
                    .at[..., c].set(vc).at[..., d].set(vd)

        def rnd(r, v):
            s = sigma[r % 10]

            def mx(i):
                return jnp.take_along_axis(
                    m, jnp.broadcast_to(s[i], m.shape[:-1])[..., None],
                    axis=-1)[..., 0]

            v = g(v, 0, 4, 8, 12, mx(0), mx(1))
            v = g(v, 1, 5, 9, 13, mx(2), mx(3))
            v = g(v, 2, 6, 10, 14, mx(4), mx(5))
            v = g(v, 3, 7, 11, 15, mx(6), mx(7))
            v = g(v, 0, 5, 10, 15, mx(8), mx(9))
            v = g(v, 1, 6, 11, 12, mx(10), mx(11))
            v = g(v, 2, 7, 8, 13, mx(12), mx(13))
            v = g(v, 3, 4, 9, 14, mx(14), mx(15))
            return v

        v = jax.lax.fori_loop(0, 12, rnd, v)
        return h ^ v[..., :8] ^ v[..., 8:]

    return jax.jit(compress)


def blake2b_compress(h, m, t, last):
    """Batched device compression: (B,8) x (B,16) x (B,) x (B,)."""
    import jax.numpy as jnp

    return _compress_jit()(
        jnp.asarray(h, dtype=jnp.uint64), jnp.asarray(m, dtype=jnp.uint64),
        jnp.asarray(t, dtype=jnp.uint64),
        jnp.asarray(last, dtype=jnp.bool_))


def blake2b_256(data: bytes) -> bytes:
    """Blake2b with a 32-byte digest — every compression on device."""
    import jax

    h = IV.copy()
    h[0] ^= np.uint64(0x01010000 ^ 32)  # param block: digest 32, fanout 1
    data = bytes(data)
    blocks = [data[i:i + 128] for i in range(0, len(data), 128)] or [b""]
    state = h[None, :]
    n = len(data)
    for bi, blk in enumerate(blocks):
        last = bi == len(blocks) - 1
        t = n if last else (bi + 1) * 128
        padded = blk + b"\0" * (128 - len(blk))
        m = np.frombuffer(padded, dtype="<u8")[None, :]
        state = blake2b_compress(state, m, np.array([t], np.uint64),
                                 np.array([last]))
    out = np.asarray(jax.device_get(state))[0]
    return b"".join(int(w).to_bytes(8, "little") for w in out)[:32]


def blake2b_256_many(msgs: list[bytes]) -> list[bytes]:
    """Batch single-block messages (<= 128 B) in ONE device dispatch."""
    import jax

    assert all(len(m) <= 128 for m in msgs)
    if not msgs:
        return []
    h = IV.copy()
    h[0] ^= np.uint64(0x01010000 ^ 32)
    states = np.broadcast_to(h, (len(msgs), 8)).copy()
    blocks = np.zeros((len(msgs), 16), dtype=np.uint64)
    ts = np.zeros(len(msgs), dtype=np.uint64)
    for i, msg in enumerate(msgs):
        padded = bytes(msg) + b"\0" * (128 - len(msg))
        blocks[i] = np.frombuffer(padded, dtype="<u8")
        ts[i] = len(msg)
    out = np.asarray(jax.device_get(blake2b_compress(
        states, blocks, ts, np.ones(len(msgs), bool))))
    return [b"".join(int(w).to_bytes(8, "little") for w in row)[:32]
            for row in out]


def blake2b_256_test() -> bool:
    """The reference's self-test shape: known-vector check."""
    return (
        blake2b_256(b"").hex()
        == "0e5751c026e543b2e8ab2eb06099daa1d1e5df47778f7787faab45cdf12fe3a8"
    )
