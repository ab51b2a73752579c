"""Database-level checkpoint/restart tests (hnsw_basic.test:33-52
CHECKPOINT + restart pattern; persistence gate hnsw_index_plan.cpp:21-30)."""

import numpy as np
import pytest

from duckdb_vss_tpu.sql import expr as E
from duckdb_vss_tpu.sql.engine import (
    Database,
    checkpoint_database,
    open_database,
)
from duckdb_vss_tpu.utils.config import BinderError


def test_checkpoint_restart_roundtrip(tmp_path):
    rng = np.random.default_rng(17)
    db = Database()
    db.set("hnsw_enable_experimental_persistence", True)
    t = db.create_table("items", {"id": "BIGINT", "name": "VARCHAR",
                                  "vec": ("FLOAT", 12)})
    vecs = rng.normal(size=(150, 12)).astype(np.float32)
    t.insert({"id": np.arange(150), "name": [f"n{i}" for i in range(150)],
              "vec": list(vecs)})
    t.insert([{"id": 999, "name": "nullvec", "vec": None}])
    db.create_hnsw_index("idx", "items", "vec")
    t.delete(rowids=[5, 6])

    q = vecs[10]
    e = E.fn("array_distance", E.col("vec"), E.const(q))
    res0 = t.select("id").order_by(e).limit(5).execute()

    d = checkpoint_database(db, str(tmp_path / "db"))
    db2 = open_database(d)
    t2 = db2.table("items")
    assert t2.row_count == 149
    res1 = t2.select("id").order_by(e).limit(5).execute()
    np.testing.assert_array_equal(res0["id"], res1["id"])
    # plan still uses the restored index
    plan = t2.select("id").order_by(e).limit(5).explain()
    assert "HNSW_INDEX_SCAN" in plan
    # VARCHAR column + NULL vector round-trip (NULL-vec rows are not in
    # the index, so check via plain scan — same visibility as reference)
    batch, _ = t2.scan()
    assert "nullvec" in batch["name"].tolist()
    assert len(db2.indexes["idx"].index) == 148  # 150 - 2 deleted, NULL skipped
    # DML keeps working after restart
    nv = rng.normal(size=12).astype(np.float32)
    t2.insert([{"id": 5000, "name": "new", "vec": nv}])
    res2 = t2.select("id").order_by(
        E.fn("array_distance", E.col("vec"), E.const(nv))).limit(1).execute()
    assert res2["id"][0] == 5000


def test_checkpoint_requires_persistence_setting(tmp_path):
    db = Database()
    t = db.create_table("x", {"vec": ("FLOAT", 4)})
    t.insert([{"vec": np.ones(4, np.float32)}])
    db.create_hnsw_index("i", "x", "vec")
    with pytest.raises(BinderError, match="persistence"):
        checkpoint_database(db, str(tmp_path / "db2"))


def test_checkpoint_in_memory_requires_dir():
    db = Database()
    with pytest.raises(BinderError):
        checkpoint_database(db)
