"""WAL replay tests (hnsw_insert_wal.test semantics: operations after the
last checkpoint — or a database never checkpointed at all — are restored
from the log on restart; reference WAL target hnsw_index.cpp:534-554)."""

import struct

import numpy as np
import pytest

from duckdb_vss_tpu.sql import expr as E
from duckdb_vss_tpu.sql.engine import (
    Database,
    checkpoint_database,
    open_database,
)
from duckdb_vss_tpu.utils.wal import WriteAheadLog


def _mkdb(path, n=80, dims=8, seed=3):
    rng = np.random.default_rng(seed)
    db = Database(path=str(path))
    db.set("hnsw_enable_experimental_persistence", True)
    t = db.create_table("items", {"id": "BIGINT", "vec": ("FLOAT", dims)})
    vecs = rng.normal(size=(n, dims)).astype(np.float32)
    t.insert({"id": np.arange(n), "vec": list(vecs)})
    db.create_hnsw_index("idx", "items", "vec")
    return db, t, vecs


def test_wal_restore_without_checkpoint(tmp_path):
    db, t, vecs = _mkdb(tmp_path / "db")
    t.delete(rowids=[1, 2])
    db.wal.close()

    db2 = open_database(str(tmp_path / "db"))
    t2 = db2.table("items")
    assert t2.row_count == 78
    assert "idx" in db2.indexes
    assert len(db2.indexes["idx"].index) == 78
    e = E.fn("array_distance", E.col("vec"), E.const(vecs[10]))
    res = t2.select("id").order_by(e).limit(1).execute()
    assert res["id"][0] == 10


def test_wal_replay_on_top_of_checkpoint(tmp_path):
    db, t, vecs = _mkdb(tmp_path / "db")
    checkpoint_database(db)  # truncates the WAL
    assert list(db.wal.replay()) == []
    # post-checkpoint operations live only in the WAL
    nv = np.full(8, 7.0, np.float32)
    t.insert([{"id": 900, "vec": nv}])
    t.delete(rowids=[0])
    db.wal.close()

    db2 = open_database(str(tmp_path / "db"))
    t2 = db2.table("items")
    assert t2.row_count == 80  # 80 - 1 + 1
    res = t2.select("id").order_by(
        E.fn("array_distance", E.col("vec"), E.const(nv))).limit(1).execute()
    assert res["id"][0] == 900
    assert len(db2.indexes["idx"].index) == 80


def test_wal_torn_tail_is_ignored(tmp_path):
    wal = WriteAheadLog(str(tmp_path / "w.wal"))
    wal.append({"op": "a", "n": 1})
    wal.append({"op": "b", "n": 2})
    wal.close()
    # simulate a crash mid-append: a frame header with a truncated payload
    with open(wal.path, "ab") as f:
        f.write(struct.pack("<III", 0x44565457, 1000, 0))
        f.write(b"short")
    recs = list(wal.replay())
    assert [r["op"] for r in recs] == ["a", "b"]


def test_wal_corrupt_crc_stops_replay(tmp_path):
    wal = WriteAheadLog(str(tmp_path / "w.wal"))
    wal.append({"op": "a"})
    wal.append({"op": "b"})
    wal.close()
    data = bytearray(open(wal.path, "rb").read())
    data[-1] ^= 0xFF  # flip a byte in the last payload
    open(wal.path, "wb").write(bytes(data))
    assert [r["op"] for r in wal.replay()] == ["a"]


def test_wal_in_memory_database_has_no_wal():
    db = Database()
    assert db.wal is None
    t = db.create_table("x", {"vec": ("FLOAT", 4)})
    t.insert([{"vec": np.ones(4, np.float32)}])  # must not raise


def test_wal_ddl_replay(tmp_path):
    db, t, _ = _mkdb(tmp_path / "db")
    db.create_table("extra", {"id": "BIGINT"})
    db.drop_table("extra")
    db.drop_index("idx")
    db.wal.close()
    db2 = open_database(str(tmp_path / "db"))
    assert "extra" not in db2.tables
    assert "idx" not in db2.indexes
    assert db2.table("items").row_count == 80


def test_wal_format_is_pickle_free(tmp_path):
    """The WAL payload must be the self-describing JSON+raw-sections
    format: safe to replay (no code execution surface) and portable
    across Python versions. Round-trips nested numpy arrays exactly."""
    p = str(tmp_path / "x.wal")
    wal = WriteAheadLog(p)
    rec = {
        "op": "insert", "table": "t",
        "rows": {"id": np.arange(5, dtype=np.int64),
                 "vec": [np.ones((3,), np.float32),
                         np.array([1.5, -2.0, 3.25], np.float32)]},
        "meta": {"k": 7, "name": "x", "flag": True, "none": None,
                 "f": 1.25, "list": [1, "two", 3.0]},
    }
    wal.append(rec)
    wal.close()
    raw = open(p, "rb").read()
    assert b"pickle" not in raw
    # frame: magic + len + crc, then [u32 json_len | json | sections]
    magic, ln, crc = struct.unpack_from("<III", raw, 0)
    payload = raw[12:12 + ln]
    (jlen,) = struct.unpack_from("<I", payload, 0)
    import json
    meta = json.loads(payload[4:4 + jlen].decode())  # plain JSON
    assert meta["op"] == "insert"

    got = list(WriteAheadLog(p).replay())
    assert len(got) == 1
    g = got[0]
    np.testing.assert_array_equal(g["rows"]["id"], rec["rows"]["id"])
    np.testing.assert_array_equal(g["rows"]["vec"][1], rec["rows"]["vec"][1])
    assert g["meta"] == {"k": 7, "name": "x", "flag": True, "none": None,
                         "f": 1.25, "list": [1, "two", 3.0]}
