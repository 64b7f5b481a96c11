"""Native paged KV store + Database64 backend under the SMT.

Mirrors the reference's page-manager / KV-tree tests (test/hashdb64/*,
runPageManagerTest / runKeyValueTreeTest — SURVEY.md §4.1): record CRUD,
overflow chaining, persistence across reopen, and the full SMT running on
the paged backend with identical roots to the in-memory backend.
"""

import os
import random

import pytest

from zkevm_prover_tpu.hashdb import Database, Smt
from zkevm_prover_tpu.hashdb64 import Database64, PageStore

ZERO = (0, 0, 0, 0)


def test_pagestore_crud(tmp_path):
    ps = PageStore(str(tmp_path / "kv.pages"), bucket_bits=4)
    k1 = bytes(range(32))
    assert ps.get(k1) is None
    ps.set(k1, b"hello")
    assert ps.get(k1) == b"hello"
    ps.set(k1, b"resized value!")          # size-changing update
    assert ps.get(k1) == b"resized value!"
    assert len(ps) == 1
    ps.close()


def test_pagestore_overflow_and_reopen(tmp_path):
    path = str(tmp_path / "kv.pages")
    ps = PageStore(path, bucket_bits=2)    # 4 buckets -> heavy overflow
    rng = random.Random(0)
    items = {}
    for i in range(500):
        k = rng.randbytes(32)
        v = rng.randbytes(rng.randrange(1, 100))
        ps.set(k, v)
        items[k] = v
    assert len(ps) == 500
    assert ps.page_count > 5               # overflow pages were allocated
    ps.flush()
    ps.close()
    # reopen from disk
    ps2 = PageStore(path, bucket_bits=2)
    assert len(ps2) == 500
    for k, v in items.items():
        assert ps2.get(k) == v
    ps2.close()


def test_smt_on_paged_backend_matches_memory(tmp_path):
    db64 = Database64(str(tmp_path / "state.pages"))
    smt_paged = Smt(db64)
    smt_mem = Smt(Database())
    rng = random.Random(1)
    root_p, root_m = ZERO, ZERO
    keys = []
    for i in range(40):
        k = tuple(rng.getrandbits(63) for _ in range(4))
        v = rng.getrandbits(255) + 1
        keys.append((k, v))
        root_p = smt_paged.set(root_p, k, v).new_root
        root_m = smt_mem.set(root_m, k, v).new_root
        assert root_p == root_m
    for k, v in keys:
        assert smt_paged.get(root_p, k).value == v
    # deletes collapse identically
    for k, _ in keys[:10]:
        root_p = smt_paged.set(root_p, k, 0).new_root
        root_m = smt_mem.set(root_m, k, 0).new_root
        assert root_p == root_m


def test_database64_programs(tmp_path):
    db64 = Database64(str(tmp_path / "prog.pages"))
    code = bytes(range(256)) * 3  # multi-chunk
    db64.set_program((1, 2, 3, 4), code)
    assert db64.get_program((1, 2, 3, 4)) == code
    assert db64.get_program((9, 9, 9, 9)) is None


def test_key_value_history(tmp_path):
    from zkevm_prover_tpu.hashdb64.key_value_history import KeyValueHistory
    from zkevm_prover_tpu.hashdb64.page_store import PageStore, build_library

    build_library()
    store = PageStore(str(tmp_path / "kvh.pages"))
    kvh = KeyValueHistory(store)

    k1, k2 = (1, 2, 3, 4), (5, 6, 7, 8)
    r1, r2, r3 = (11, 0, 0, 0), (22, 0, 0, 0), (33, 0, 0, 0)
    kvh.write_batch({k1: 100}, r1)
    kvh.write_batch({k1: 200, k2: 7}, r2)
    kvh.write_batch({k2: 9}, r3)

    # historical reads per root (the KeyValueTree fast path)
    assert kvh.read(r1, k1) == 100
    assert kvh.read(r1, k2) is None
    assert kvh.read(r2, k1) == 200
    assert kvh.read(r2, k2) == 7
    assert kvh.read(r3, k1) == 200
    assert kvh.read(r3, k2) == 9
    assert kvh.read((99, 0, 0, 0), k1) is None

    # persists across reopen (mmapped page file)
    store.flush()
    store.close()
    store2 = PageStore(str(tmp_path / "kvh.pages"))
    kvh2 = KeyValueHistory(store2)
    assert kvh2.read(r2, k1) == 200
    assert kvh2.current_version() == 3
    store2.close()
