"""PaddingKK SM — pad10*1 byte-stream structure + absorb-chain emission."""

import numpy as np
import pytest

from zkevm_prover_tpu.executor.sm import padding_kk
from zkevm_prover_tpu.ops import keccak as keccak_mod
from zkevm_prover_tpu.stark.prover import StarkProver
from zkevm_prover_tpu.stark.setup import StarkSetup

N_BITS = 11  # 2048 rows -> 15 complete 136-byte blocks

_cache: dict = {}


def _prover():
    if "p" not in _cache:
        _cache["p"] = StarkProver(StarkSetup(
            padding_kk.build_air(N_BITS), n_queries=8, fri_fold_bits=2))
    return _cache["p"]


def _msgs():
    return [
        {"data": b"hello keccak padding"},
        {"data": bytes(range(200))},          # spans two blocks
        {"data": b""},                        # empty message
        {"data": bytes([7] * 135)},           # 0x81 coincident pad byte
    ]


def test_digests_match_host_keccak():
    acts = _msgs()
    trace, kf_actions, digests = padding_kk.execute(acts, N_BITS)
    for a, d in zip(acts, digests):
        assert d == padding_kk.digest_of(a["data"])
    # 1 + 2 + 1 + 1 real blocks plus empty filler to 15
    assert len(kf_actions) == (1 << N_BITS) // padding_kk.BLOCK


def test_padding_air_satisfied():
    trace, _, _ = padding_kk.execute(_msgs(), N_BITS)
    bad = _prover().check_constraints(trace, quick=True)
    assert bad == [], f"violated constraints: {bad}"


def test_padding_air_rejects_tampering():
    trace, _, _ = padding_kk.execute(_msgs(), N_BITS)
    ci = {nm: i for i, nm in enumerate(padding_kk.COLS)}
    prover = _prover()

    # non-zero filler inside the pad region
    t = trace.copy()
    pad_rows = np.nonzero((t[:, ci["PAD"]] == 1)
                          & (t[:, ci["PADFIRST"]] == 0)
                          & (t[:, ci["BYTE"]] == 0))[0]
    t[int(pad_rows[0]), ci["BYTE"]] = np.uint64(0xFF)
    assert prover.check_constraints(t, quick=True) != []

    # padding started before the message ran out (REM still > 1)
    t = trace.copy()
    data_rows = np.nonzero((t[:, ci["PAD"]] == 0) & (t[:, ci["REM"]] > 2))[0]
    r = int(data_rows[1])
    t[r, ci["PAD"]] = 1
    t[r, ci["PADFIRST"]] = 1
    t[r, ci["BYTE"]] = np.uint64(0x01)
    t[r, ci["REM"]] = 0
    assert prover.check_constraints(t, quick=True) != []

    # wrong final pad byte (0x00 instead of 0x80)
    t = trace.copy()
    endrows = [b * padding_kk.BLOCK + padding_kk.BLOCK - 1
               for b in range((1 << N_BITS) // padding_kk.BLOCK)]
    er = [r for r in endrows if t[r, ci["LASTH"]] == 1][0]
    t[er, ci["BYTE"]] = np.uint64(0)
    assert prover.check_constraints(t, quick=True) != []
