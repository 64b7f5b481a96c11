"""Blake2b-256 (reference: tools/sm/blake/, Blake2b256_Test in the unit
runner). Host implementation over hashlib; the SM consumer is the planned
gate-level pipeline."""

from __future__ import annotations

import hashlib


def blake2b_256(data: bytes) -> bytes:
    return hashlib.blake2b(data, digest_size=32).digest()


def blake2b_256_test() -> bool:
    """The reference's self-test shape: known-vector check."""
    return (
        blake2b_256(b"").hex()
        == "0e5751c026e543b2e8ab2eb06099daa1d1e5df47778f7787faab45cdf12fe3a8"
    )
