"""HashDB64 virtual/consolidated roots + LevelTree
(reference state_manager_64.hpp:102-159, level_tree.hpp)."""

import pytest

from zkevm_prover_tpu.hashdb64.level_tree import LevelTree
from zkevm_prover_tpu.hashdb64.page_store import PageStore
from zkevm_prover_tpu.hashdb64.state64 import StateManager64


def _key(i):
    return (i * 11 + 1, i * 7 + 3, i * 5 + 9, i)


@pytest.fixture
def sm(tmp_path):
    store = PageStore(str(tmp_path / "state64.pages"))
    yield StateManager64(store)
    store.close()


def test_level_tree_split_semantics():
    t = LevelTree()
    # keys diverging at bit 0: one key even in lane 0, one odd
    assert t.insert((0, 0, 0, 0)) == 0          # first leaf sits at root
    assert t.insert((1, 0, 0, 0)) == 1          # split at depth 1
    assert t.level((0, 0, 0, 0)) == 1           # resident pushed down too
    # a key sharing 2 path bits with (1,0,0,0): path bits are
    # key[i&3] bit (i>>2): (1,1,0,0) shares bit0(lane0)=1, differs bit1(lane1)
    assert t.insert((1, 1, 0, 0)) == 2
    assert (1, 1, 0, 0) in t and (9, 9, 9, 9) not in t
    assert len(t) == 3
    # idempotent insert
    assert t.insert((1, 1, 0, 0)) == 2
    assert len(t) == 3


def test_virtual_then_consolidated_reads(sm):
    r0 = (0, 0, 0, 0)
    sm.start_batch("b1", r0)
    sm.write("b1", _key(1), 100)
    sm.write("b1", _key(2), 200)
    r1 = (1, 1, 1, 1)
    sm.semi_flush("b1", r1)

    sm.start_batch("b2", r1)
    sm.write("b2", _key(1), 111)   # overwrite in the next batch
    r2 = (2, 2, 2, 2)
    sm.semi_flush("b2", r2)

    # virtual reads see the chain overlay
    assert sm.is_virtual(r1) and sm.is_virtual(r2)
    assert sm.read(r1, _key(1)) == 100
    assert sm.read(r2, _key(1)) == 111
    assert sm.read(r2, _key(2)) == 200     # falls through to batch 1
    assert sm.read(r2, _key(9)) is None

    # consolidate up to r2: BOTH roots become versioned
    root, flush_id = sm.consolidate_state(r2)
    assert root == r2 and flush_id == 1
    assert not sm.is_virtual(r1) and not sm.is_virtual(r2)
    assert sm.read(r1, _key(1)) == 100     # historical read at old root
    assert sm.read(r2, _key(1)) == 111
    assert sm.read(r2, _key(2)) == 200


def test_consolidate_unknown_root_raises(sm):
    with pytest.raises(KeyError):
        sm.consolidate_state((9, 9, 9, 9))


def test_consolidate_is_idempotent(sm):
    sm.start_batch("b", (0, 0, 0, 0))
    sm.write("b", _key(4), 4)
    sm.semi_flush("b", (4, 4, 4, 4))
    root, fid = sm.consolidate_state((4, 4, 4, 4))
    root2, fid2 = sm.consolidate_state((4, 4, 4, 4))
    assert root2 == root and fid2 == fid


def test_write_reports_smt_level(sm):
    sm.start_batch("b", (0, 0, 0, 0))
    assert sm.write("b", (0, 0, 0, 0), 1) == 0
    assert sm.write("b", (1, 0, 0, 0), 2) == 1
    assert sm.level((0, 0, 0, 0)) == 1
