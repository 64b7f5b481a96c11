"""Database caches (reference database_cache.cpp LRU +
database_associative_cache.cpp direct-indexed, main.cpp:408-417 switch)."""

from zkevm_prover_tpu.hashdb.cache import AssociativeCache, LRUCache, \
    make_cache
from zkevm_prover_tpu.hashdb.database import Database
from zkevm_prover_tpu.hashdb.smt import Smt


def _key(i):
    return (i, i * 7 + 1, i * 13 + 2, i * 31 + 3)


def test_lru_eviction_order():
    c = LRUCache(max_bytes=3 * (64 + 8 * 12))
    keys = ["%064x" % i for i in range(4)]
    for k in keys:
        c.put(k, [1] * 12)
    assert c.get(keys[0]) is None          # evicted (oldest)
    assert c.get(keys[1]) == [1] * 12
    c.put("%064x" % 9, [2] * 12)           # keys[2] is now LRU
    assert c.get(keys[2]) is None
    assert c.get(keys[1]) == [1] * 12      # refreshed above, survives


def test_lru_update_reaccounts_bytes():
    c = LRUCache(max_bytes=1 << 20)
    c.put("a" * 64, [0] * 12)
    c.put("a" * 64, [0] * 8)
    assert c._bytes == 64 + 8 * 8
    assert len(c) == 1


def test_associative_collision_is_miss_not_alias():
    c = AssociativeCache(n_bits=4)
    k1 = "%064x" % 0x10   # slot 0
    k2 = "%064x" % 0x20   # slot 0 (low 4 bits equal)
    c.put(k1, [1])
    assert c.get(k1) == [1]
    c.put(k2, [2])        # overwrites the slot
    assert c.get(k2) == [2]
    assert c.get(k1) is None   # evicted, never aliased


def test_make_cache_switch():
    assert make_cache(None) is None
    assert isinstance(make_cache("lru"), LRUCache)
    assert isinstance(make_cache("associative"), AssociativeCache)


def test_database_read_through_backend():
    backend = Database()
    for i in range(8):
        backend.write(_key(i), [i] * 12)
    backend.set_program(_key(1), b"\x60\x00")

    for kind in ("lru", "associative"):
        db = Database(backend=backend, cache=kind)
        for i in range(8):
            assert db.read(_key(i)) == [i] * 12
        # second pass served from the cache, not the backend
        before = db._cache.hits
        for i in range(8):
            assert db.read(_key(i)) == [i] * 12
        assert db._cache.hits >= before + 8
        assert db.get_program(_key(1)) == b"\x60\x00"
        assert db.get_program(_key(1)) == b"\x60\x00"
        assert db.read(_key(99)) is None


def test_smt_over_cached_backend_matches_plain():
    """The SMT must behave identically over a cache-fronted store."""
    plain = Database()
    s1 = Smt(plain)
    backend = Database()
    cached = Database(backend=backend, cache="lru")
    s2 = Smt(cached)
    root1 = [0, 0, 0, 0]
    root2 = [0, 0, 0, 0]
    for i in range(6):
        root1 = s1.set(root1, _key(i), 1000 + i).new_root
        root2 = s2.set(root2, _key(i), 1000 + i).new_root
    assert [int(x) for x in root1] == [int(x) for x in root2]
    assert s2.get(root2, _key(3)).value == 1003
