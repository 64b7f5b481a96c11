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
