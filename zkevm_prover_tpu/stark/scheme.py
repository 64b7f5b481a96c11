"""Commitment schemes for the eSTARK engine: GL (device) and BN128 (host).

The reference's Starks uses MerkleTreeGL + the GL Poseidon transcript, while
StarkRecursiveF swaps in MerkleTreeBN128 + TranscriptBN128 so the final
proof is cheap to verify inside a BN254 SNARK circuit (starkRecursiveF.cpp:
151-170, starkInfo verificationHashType). Here the same prover runs either
scheme through this small strategy object.
"""

from __future__ import annotations

import numpy as np

from ..ops import merkle as merkle_gl
from ..ops import merkle_bn128
from ..ops import transcript as tr_gl
from ..ops.transcript_bn128 import TranscriptBN128


class GLScheme:
    name = "GL"
    Transcript = tr_gl.Transcript

    @staticmethod
    def commit(source):
        return merkle_gl.MerkleTree.commit(source)

    @staticmethod
    def root_ints(root) -> list[int]:
        # NEVER np.asarray a python-int list here: values >= 2^63 make
        # numpy silently pick float64 and TRUNCATE them — a json-loaded
        # verkey then seeds the transcript with mangled ints and every
        # derived challenge (hence every verification) diverges.
        if isinstance(root, (list, tuple)):
            return [int(v) for v in root]
        return [int(v) for v in np.ravel(np.asarray(root))]

    @staticmethod
    def verify_queries(root, queries, idxs) -> bool:
        # device-batched path verification lives in stark/verifier.py
        raise NotImplementedError  # GL uses the batched verifier

    @staticmethod
    def store_root(root):
        return np.asarray(root)


class BN128Scheme:
    name = "BN128"
    Transcript = TranscriptBN128

    @staticmethod
    def commit(source):
        return merkle_bn128.MerkleTreeBN128.commit(np.asarray(source))

    @staticmethod
    def root_ints(root) -> list[int]:
        return [int(root)]

    @staticmethod
    def verify_queries(root, queries, idxs) -> bool:
        return all(
            merkle_bn128.verify_group_proof(int(np.ravel(root)[0]) if not
                                            isinstance(root, int) else root,
                                            int(i), q.values, q.siblings)
            for q, i in zip(queries, idxs)
        )

    @staticmethod
    def store_root(root):
        return int(root)


SCHEMES = {"GL": GLScheme, "BN128": BN128Scheme}


def get(name: str):
    return SCHEMES[name]
