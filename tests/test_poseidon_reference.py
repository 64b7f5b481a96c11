"""Bit-compatibility of both Poseidon hashes with the reference.

Two layers of evidence:

  * inline pinned digests (always run) — the zero-state Poseidon-GL
    permutation matches the published Hermez/plonky2 vector, and the t=3
    BN128 Poseidon matches the canonical circomlib vector poseidon([1,2]);
  * the reference's own data as an oracle (runs when /root/reference is
    present) — every (key -> value) entry of the testvector state
    databases satisfies key == PoseidonGL(value[0:8], cap=value[8:12])
    (reference: src/hashdb/database.cpp stores nodes under their Poseidon
    hash; testvectors/e2e/fork_9/input_executor_0.json "db").
"""

import glob
import json
import os

import pytest

from zkevm_prover_tpu.ops import poseidon_bn128 as pbn
from zkevm_prover_tpu.ops import poseidon_constants as pc
from zkevm_prover_tpu.ops import refmodel as rm

REF = "/root/reference"

MASK64 = (1 << 64) - 1


def _model():
    return rm.Poseidon(pc.round_constants(), pc.mds_matrix())


def test_gl_zero_state_known_vector():
    # Standard Poseidon-GL vector (Hermez / plonky2 ALL_ROUND_CONSTANTS set).
    out = _model().permute([0] * 12)
    assert out[0] == 4330397376401421145
    assert out[:4] == [
        4330397376401421145,
        14124799381142128323,
        8742572140681234676,
        14345658006221440202,
    ]


def test_gl_counting_digest_pinned():
    assert _model().permute(list(range(12)))[:4] == [
        15442313428170673822,
        6009603122036124231,
        15276919505380083749,
        7005999589691109842,
    ]


def test_bn128_circomlib_vector():
    # circomlib: poseidon([1, 2]) with zero capacity.
    assert (
        pbn.permute([0, 1, 2])[0]
        == 7853200120776062878684798364095072458815029376092732009249414926327459813530
    )


def test_bn128_wide_digests_pinned():
    assert (
        pbn.hash16(list(range(16)))
        == 12416070427041714118890402457152010846953662431720703103496516574407903181398
    )
    assert (
        pbn.linear_hash_fr([1, 2, 3, 4, 5])
        == 6183221330272524995739186171720101788151706631170188140075976616310159254464
    )


def test_placeholder_mode_changes_digests():
    base = _model().permute([0] * 12)
    pc.load_constants("placeholder")
    try:
        assert pc.source() == "placeholder:v1"
        assert _model().permute([0] * 12) != base
    finally:
        pc.load_constants(None)
    assert _model().permute([0] * 12) == base


def _db_entries():
    """All (key, 12-value) Poseidon node entries across the testvectors."""
    pat = os.path.join(REF, "testvectors", "**", "*.json")
    for path in sorted(glob.glob(pat, recursive=True)):
        try:
            with open(path) as f:
                doc = json.load(f)
        except (json.JSONDecodeError, UnicodeDecodeError):
            continue
        if not isinstance(doc, dict):
            continue
        db = doc.get("db")
        if not isinstance(db, dict):
            continue
        for k, vals in db.items():
            if not (isinstance(k, str) and k.startswith("0x")):
                continue
            if not isinstance(vals, list) or len(vals) not in (8, 12):
                continue
            yield path, k, vals


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not present")
def test_gl_reference_db_oracle():
    m = _model()
    n = 0
    for path, k, vals in _db_entries():
        key_int = int(k, 16)
        key = [(key_int >> (64 * i)) & MASK64 for i in range(4)]
        v = [int(x, 16) for x in vals] + [0] * (12 - len(vals))
        got = m.permute(v)[:4]
        assert got == key, f"{os.path.basename(path)}: {k}"
        n += 1
    assert n >= 1000, f"oracle swept only {n} entries"
