"""Storage SM — double tree-walk replay of SMT get/set actions.

Reference surface: src/sm/storage/storage_executor.cpp (mode coverage:
update, insertFound, insertNotFound, deleteFound collapse, get found /
mismatched) and its PoseidonG/ClimbKey request emission.
"""

import numpy as np
import pytest

from zkevm_prover_tpu.executor.sm import storage
from zkevm_prover_tpu.hashdb.database import Database
from zkevm_prover_tpu.hashdb.smt import Smt
from zkevm_prover_tpu.ops import poseidon_constants as pc
from zkevm_prover_tpu.ops import refmodel as rm
from zkevm_prover_tpu.stark.prover import StarkProver
from zkevm_prover_tpu.stark.setup import StarkSetup

N_BITS = 9

# keys engineered to share low bits (forces insertFound path extension)
KEY1 = (0b1010, 3, 5, 7)
KEY2 = (0b1010, 3, 5, 23)     # same lane-0 bits for a while
KEY3 = (1, 1, 1, 1)


def _actions():
    smt = Smt(Database())
    acts = []
    r = (0, 0, 0, 0)
    for key, val in ((KEY1, 111), (KEY2, 222), (KEY3, 333), (KEY1, 444)):
        res = smt.set(r, key, val)
        acts.append({"op": "set", "root": r, "key": key, "value": val,
                     "new_root": res.new_root})
        r = res.new_root
    g = smt.get(r, KEY2)
    acts.append({"op": "get", "root": r, "key": KEY2, "value": g.value})
    miss = smt.get(r, (9, 9, 9, 9))
    acts.append({"op": "get", "root": r, "key": (9, 9, 9, 9),
                 "value": miss.value})
    res = smt.set(r, KEY2, 0)  # delete -> collapse
    acts.append({"op": "set", "root": r, "key": KEY2, "value": 0,
                 "new_root": res.new_root})
    return smt, acts


_cache: dict = {}


def _prover():
    if "p" not in _cache:
        _cache["p"] = StarkProver(StarkSetup(
            storage.build_air(N_BITS), n_queries=8, fri_fold_bits=2))
    return _cache["p"]


def test_storage_trace_satisfies_air():
    smt, acts = _actions()
    trace, emitted = storage.execute(acts, N_BITS, smt.db)
    bad = _prover().check_constraints(trace, quick=True)
    assert bad == [], f"violated constraints: {bad}"

    # every emitted Poseidon state really is a node preimage: its permutation
    # digest must be a readable node hash in the db
    pos = rm.Poseidon(pc.round_constants(), pc.mds_matrix())
    for act in emitted["poseidon_g"][:10]:
        h = tuple(pos.permute(list(act["state"]))[:4])
        assert smt.db.read(h) is not None
    assert emitted["climb_key"], "expected climb-key requests"


def test_storage_rejects_tampering():
    smt, acts = _actions()
    trace, _ = storage.execute(acts, N_BITS, smt.db)
    ci = {nm: i for i, nm in enumerate(storage.COLS)}
    prover = _prover()

    # forge a child hash: chaining into the next level breaks
    t = trace.copy()
    rows = np.nonzero((t[:-1, ci["OACT"]] == 1) & (t[:-1, ci["LAST"]] == 0)
                      & (t[1:, ci["OACT"]] == 1))[0]
    r = int(rows[0])
    side = "OR0" if t[r, ci["BIT"]] else "OL0"
    t[r, ci[side]] = (int(t[r, ci[side]]) + 1) % storage.P
    assert prover.check_constraints(t, quick=True) != []

    # claim a different key: the climb constraint breaks
    t = trace.copy()
    t[r, ci["RKEY0"]] = (int(t[r, ci["RKEY0"]]) + 1) % storage.P
    assert prover.check_constraints(t, quick=True) != []

    # break cross-action chaining on a CHAIN row
    t = trace.copy()
    chain_rows = np.nonzero(t[:, ci["CHAIN"]] == 1)[0]
    assert len(chain_rows) > 0
    t[int(chain_rows[0]), ci["NROOT0"]] = np.uint64(12345)
    assert prover.check_constraints(t, quick=True) != []


def test_storage_climb_key_binding():
    """The no-wrap leg: every climb-down step must be a ClimbKey op.

    Composed storage+climb_key AIR with the same lookup the batch AIR
    declares (executor/combined.py); a storage trace claiming a key
    transition absent from the ClimbKey table is rejected.
    """
    import jax

    from zkevm_prover_tpu.executor.sm import climb_key
    from zkevm_prover_tpu.stark import expr as ex
    from zkevm_prover_tpu.stark.compose import CombinedAIR

    # shallow divergence (path bit 0) keeps the climb count inside the
    # 2^9 ClimbKey domain (32 clocks per op at 2-bit chunks)
    smt = Smt(Database())
    kA, kB = (2, 0, 0, 0), (3, 0, 0, 0)
    acts = []
    r = (0, 0, 0, 0)
    for key, val in ((kA, 5), (kB, 6)):
        res = smt.set(r, key, val)
        acts.append({"op": "set", "root": r, "key": key, "value": val,
                     "new_root": res.new_root})
        r = res.new_root
    g = smt.get(r, kA)
    acts.append({"op": "get", "root": r, "key": kA, "value": g.value})
    st_tr, emitted = storage.execute(acts, N_BITS, smt.db)
    ck_tr = climb_key.execute(emitted["climb_key"], N_BITS)

    air = CombinedAIR("st_ck", N_BITS)
    air.add("storage", storage.build_air(N_BITS))
    air.add("climb_key", climb_key.build_air(N_BITS))
    # f side: the CURRENT row's RKEY is the post-climb key (the storage AIR
    # already pins RKEY = 2·RKEY' + BIT in-row; the ClimbKey table's ISLAST
    # row carries the post-climb key proving the climb didn't wrap p)
    f = ([air.cm("storage", f"RKEY{j}") for j in range(4)]
         + [air.cm("storage", "LEVEL"), air.cm("storage", "BIT")])
    t = ([air.cm("climb_key", f"KEY{j}") for j in range(4)]
         + [air.cm("climb_key", "LEVEL"), air.cm("climb_key", "BIT")])
    air.lookup(f, t, sel_f=1 - air.cm("storage", "LAST"),
               sel_t=air.const("climb_key", "ISLAST"))

    prover = StarkProver(StarkSetup(air, n_queries=8, fri_fold_bits=2))
    stacked = air.stack_traces({"storage": st_tr, "climb_key": ck_tr})
    with jax.disable_jit():
        bad = prover.check_constraints(stacked, quick=True)
    assert bad == [], f"violated constraints: {bad}"

    # drop one ClimbKey op: the storage climb that used it has no partner
    assert emitted["climb_key"], "test needs at least one climb"
    ck_tr2 = climb_key.execute(emitted["climb_key"][1:], N_BITS)
    stacked = air.stack_traces({"storage": st_tr, "climb_key": ck_tr2})
    with jax.disable_jit():
        assert any(str(b).startswith("plookup") for b in prover.check_constraints(stacked, quick=True))


def test_storage_values_roundtrip():
    smt, acts = _actions()
    # get on KEY2 returned the value written by the second set
    assert acts[4]["value"] == 222
    assert acts[5]["value"] == 0  # miss
    trace, _ = storage.execute(acts, N_BITS, smt.db)
    ci = {nm: i for i, nm in enumerate(storage.COLS)}
    # some leaf row carries 222 in its VLOW lane
    vlow = trace[:, ci["VLOW0"]]
    assert (vlow == 222).any()
