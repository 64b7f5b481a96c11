"""SMT insert/update/delete semantics + StateManager overlay lifecycle.

Mirrors the reference's hashdb tests (test/hashdb/*, SURVEY.md §4.2):
root determinism under permutation of operations, delete = exact inverse of
insert, leaf-split and leaf-collapse paths, overlay visibility before flush.
"""

import random

from zkevm_prover_tpu.hashdb import Database, HashDB, Smt
from zkevm_prover_tpu.hashdb import key_utils as ku

ZERO = (0, 0, 0, 0)


def _rand_key(rng):
    return tuple(rng.getrandbits(64) % ((1 << 64) - (1 << 32) + 1) for _ in range(4))


def test_split_join_roundtrip():
    rng = random.Random(0)
    for _ in range(20):
        key = _rand_key(rng)
        bits = ku.split_key(key)
        for lvl in (0, 1, 5, 32, 255):
            rkey = ku.remove_key_bits(key, lvl)
            assert ku.join_key(bits[:lvl], rkey) == key


def test_insert_get_update_delete():
    db = Database()
    smt = Smt(db)
    rng = random.Random(1)
    key1, key2 = _rand_key(rng), _rand_key(rng)

    r1 = smt.set(ZERO, key1, 100)
    assert r1.mode == "insertNotFound"
    assert smt.get(r1.new_root, key1).value == 100
    assert smt.get(r1.new_root, key2).value == 0

    r2 = smt.set(r1.new_root, key2, 200)
    assert r2.mode in ("insertFound", "insertNotFound")
    assert smt.get(r2.new_root, key1).value == 100
    assert smt.get(r2.new_root, key2).value == 200

    r3 = smt.set(r2.new_root, key1, 111)
    assert r3.mode == "update"
    assert r3.old_value == 100
    assert smt.get(r3.new_root, key1).value == 111

    # delete key1 -> tree must equal the tree with only key2
    r4 = smt.set(r3.new_root, key1, 0)
    only2 = smt.set(ZERO, key2, 200)
    assert r4.new_root == only2.new_root

    # delete key2 -> empty
    r5 = smt.set(r4.new_root, key2, 0)
    assert r5.new_root == ZERO


def test_root_independent_of_insertion_order():
    rng = random.Random(2)
    pairs = [(_rand_key(rng), rng.getrandbits(200) + 1) for _ in range(24)]

    def build(order):
        smt = Smt(Database())
        root = ZERO
        for k, v in order:
            root = smt.set(root, k, v).new_root
        return root

    r_a = build(pairs)
    shuffled = pairs[:]
    rng.shuffle(shuffled)
    r_b = build(shuffled)
    assert r_a == r_b


def test_insert_delete_random_churn():
    rng = random.Random(3)
    smt = Smt(Database())
    root = ZERO
    live = {}
    for step in range(120):
        if live and rng.random() < 0.4:
            k = rng.choice(list(live))
            res = smt.set(root, k, 0)
            assert res.old_value == live.pop(k)
        else:
            k = _rand_key(rng)
            v = rng.getrandbits(256) % (1 << 255) + 1
            res = smt.set(root, k, v)
            live[k] = v
        root = res.new_root
    for k, v in live.items():
        assert smt.get(root, k).value == v
    # drain everything -> empty root
    for k in list(live):
        root = smt.set(root, k, 0).new_root
    assert root == ZERO


def test_statemanager_overlay_and_flush():
    hdb = HashDB()
    rng = random.Random(4)
    key = _rand_key(rng)
    hdb.begin_batch("b1")
    res = hdb.set("b1", 0, ZERO, key, 42)
    # visible inside the batch overlay, not yet in the backing db
    assert hdb.get("b1", res.new_root, key).value == 42
    assert len(hdb.db) == 0
    hdb.semi_flush("b1", res.new_root)
    fid, sent = hdb.flush("b1")
    assert fid == sent == 1
    # after flush the backing db serves the tree
    assert Smt(hdb.db).get(res.new_root, key).value == 42


def test_statemanager_cancel_discards():
    hdb = HashDB()
    rng = random.Random(5)
    key = _rand_key(rng)
    hdb.begin_batch("bX")
    hdb.set("bX", 0, ZERO, key, 7)
    hdb.cancel_batch("bX")
    hdb.flush("bX")
    assert len(hdb.db) == 0


def test_program_roundtrip_and_hash():
    hdb = HashDB()
    code = bytes(range(100))
    key = hdb.hash_program(code)
    hdb.set_program("", key, code)
    assert hdb.get_program("", key) == code
    assert len(key) == 4
