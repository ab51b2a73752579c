"""SQL-layer tests mirroring the reference's sqllogictests:
plan-shape assertions (EXPLAIN regex), option validation errors
(hnsw_options.test), metric matching (hnsw_metrics.test), top-k scan
(hnsw_basic.test), min_by rewrite (hnsw_topk.test), lateral join
(hnsw_lateral_join.test), CRUD + compaction (hnsw_crud.test)."""

import re

import numpy as np
import pytest

from duckdb_vss_tpu.sql.engine import Database, knn_join, explain_knn_join
from duckdb_vss_tpu.sql import expr as E
from duckdb_vss_tpu.utils.config import BinderError


def make_db(n=500, d=16, seed=0, with_index=True, metric="l2sq"):
    rng = np.random.default_rng(seed)
    db = Database()
    t = db.create_table("items", {"id": "BIGINT", "vec": ("FLOAT", d)})
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    t.insert({"id": np.arange(n), "vec": list(vecs)})
    if with_index:
        db.create_hnsw_index("idx", "items", "vec", metric=metric)
    return db, t, vecs, rng


def dist_expr(q):
    return E.fn("array_distance", E.col("vec"), E.const(q))


class TestPlans:
    def test_index_scan_plan(self):
        db, t, vecs, rng = make_db(n=300)
        q = vecs[0]
        plan = t.select("id").order_by(dist_expr(q)).limit(5).explain()
        assert re.search(r"HNSW_INDEX_SCAN", plan), plan

    def test_no_index_flat_plan(self):
        db, t, vecs, rng = make_db(n=300, with_index=False)
        plan = t.select("id").order_by(dist_expr(vecs[0])).limit(5).explain()
        assert re.search(r"FLAT_TOPN_SCAN", plan), plan
        assert "HNSW_INDEX_SCAN" not in plan

    def test_metric_mismatch_no_index_scan(self):
        # l2sq index cannot serve cosine queries (hnsw_metrics.test:23-36)
        db, t, vecs, rng = make_db(n=300, metric="l2sq")
        e = E.fn("array_cosine_distance", E.col("vec"), E.const(vecs[0]))
        plan = t.select("id").order_by(e).limit(5).explain()
        assert "HNSW_INDEX_SCAN" not in plan

    def test_cosine_canonicalization_matches_index(self):
        # 1.0 - array_cosine_similarity -> array_cosine_distance (E11)
        db, t, vecs, rng = make_db(n=300, metric="cosine")
        e = 1.0 - E.fn("array_cosine_similarity", E.col("vec"),
                       E.const(vecs[0]))
        # Expr.__rsub__ builds BinaryOp(1.0 - fn)
        plan = t.select("id").order_by(e).limit(5).explain()
        assert re.search(r"HNSW_INDEX_SCAN", plan), plan

    def test_filter_pull_up(self):
        db, t, vecs, rng = make_db(n=300)
        qb = (t.select("id").where(E.col("id") < 100)
              .order_by(dist_expr(vecs[0])).limit(5))
        plan = qb.explain()
        # FILTER must sit above the index scan (pull-up, E8)
        assert plan.index("FILTER") < plan.index("HNSW_INDEX_SCAN")

    def test_desc_order_not_rewritten(self):
        db, t, vecs, rng = make_db(n=300)
        plan = (t.select("id").order_by(dist_expr(vecs[0]), desc=True)
                .limit(5).explain())
        assert "HNSW_INDEX_SCAN" not in plan


class TestResults:
    def test_topk_matches_brute_force(self):
        db, t, vecs, rng = make_db(n=400)
        q = rng.normal(size=16).astype(np.float32)
        res = (t.select("id", dist_expr(q).alias("d"))
               .order_by(dist_expr(q)).limit(10).execute())
        # brute force ground truth
        d = np.sqrt(((vecs - q) ** 2).sum(1))
        want = set(np.argsort(d)[:10].tolist())
        got = set(res["id"].tolist())
        assert len(got & want) >= 9  # approximate tolerance
        # emitted distance column matches array_distance semantics
        np.testing.assert_allclose(
            res["d"], np.sort(d[list(res["id"])]), rtol=1e-4)

    def test_flat_path_exact(self):
        db, t, vecs, rng = make_db(n=400, with_index=False)
        q = rng.normal(size=16).astype(np.float32)
        res = t.select("id").order_by(dist_expr(q)).limit(10).execute()
        d = np.sqrt(((vecs - q) ** 2).sum(1))
        np.testing.assert_array_equal(
            np.sort(res["id"]), np.sort(np.argsort(d, kind="stable")[:10]))

    def test_filter_applies(self):
        db, t, vecs, rng = make_db(n=400)
        q = vecs[0]
        res = (t.select("id").where(E.col("id") >= 100)
               .order_by(dist_expr(q)).limit(50).execute())
        assert (res["id"] >= 100).all()

    def test_ef_search_setting(self):
        db, t, vecs, rng = make_db(n=400)
        db.set("hnsw_ef_search", 200)
        q = rng.normal(size=16).astype(np.float32)
        res = t.select("id").order_by(dist_expr(q)).limit(10).execute()
        assert len(res["id"]) == 10
        with pytest.raises(BinderError):
            db.set("unknown_setting", 1)

    def test_min_by_rewrite(self):
        db, t, vecs, rng = make_db(n=400)
        q = rng.normal(size=16).astype(np.float32)
        got = t.select().min_by("id", dist_expr(q), 5)
        d = np.sqrt(((vecs - q) ** 2).sum(1))
        want = np.argsort(d)[:5].tolist()
        assert len(set(got) & set(want)) >= 4


class TestDML:
    def test_insert_updates_index(self):
        db, t, vecs, rng = make_db(n=200)
        nv = rng.normal(size=16).astype(np.float32)
        t.insert([{"id": 999, "vec": nv}])
        res = t.select("id", "rowid").order_by(dist_expr(nv)).limit(1).execute()
        assert res["id"][0] == 999

    def test_null_vectors_skipped(self):
        db, t, vecs, rng = make_db(n=100)
        t.insert([{"id": 1000, "vec": None}])
        assert len(db.indexes["idx"].index) == 100  # NULL not indexed
        res = t.select("id").order_by(dist_expr(vecs[0])).limit(100).execute()
        assert 1000 not in res["id"].tolist()

    def test_delete_then_compact(self):
        db, t, vecs, rng = make_db(n=300)
        q = vecs[5]
        res0 = t.select("rowid").order_by(dist_expr(q)).limit(1).execute()
        assert res0["rowid"][0] == 5
        t.delete(rowids=[5])
        res1 = t.select("rowid").order_by(dist_expr(q)).limit(5).execute()
        assert 5 not in res1["rowid"].tolist()
        db.pragma_hnsw_compact_index("idx")
        res2 = t.select("rowid").order_by(dist_expr(q)).limit(5).execute()
        assert set(res2["rowid"].tolist()) == set(res1["rowid"].tolist())

    def test_update_semantics(self):
        db, t, vecs, rng = make_db(n=100)
        far = (vecs[0] + 100.0).astype(np.float32)
        t.update([0], [{"id": 0, "vec": far}])
        res = t.select("id").order_by(dist_expr(far)).limit(1).execute()
        assert res["id"][0] == 0

    def test_pragma_info(self):
        db, t, vecs, rng = make_db(n=150)
        info = db.pragma_hnsw_index_info()
        assert len(info) == 1
        assert info[0]["index_name"] == "idx"
        assert info[0]["count"] == 150
        assert info[0]["levels"]


class TestOptions:
    def test_invalid_metric(self):
        db, t, vecs, rng = make_db(n=50, with_index=False)
        with pytest.raises(BinderError, match="Unknown metric"):
            db.create_hnsw_index("i2", "items", "vec", metric="manhattan")

    @pytest.mark.parametrize("opt,val", [
        ("m", 1), ("m0", 0), ("ef_construction", 0), ("ef_search", -1)])
    def test_invalid_numeric_options(self, opt, val):
        db, t, vecs, rng = make_db(n=50, with_index=False)
        with pytest.raises(BinderError):
            db.create_hnsw_index("i2", "items", "vec", **{opt: val})

    def test_unknown_option(self):
        db, t, vecs, rng = make_db(n=50, with_index=False)
        with pytest.raises(BinderError, match="Unknown option"):
            db.create_hnsw_index("i2", "items", "vec", bogus=3)

    def test_non_vector_column(self):
        db, t, vecs, rng = make_db(n=50, with_index=False)
        with pytest.raises(BinderError):
            db.create_hnsw_index("i2", "items", "id")

    def test_persistence_gate(self):
        db = Database(path="/tmp/dvt_test_db")
        t = db.create_table("x", {"vec": ("FLOAT", 8)})
        with pytest.raises(BinderError, match="experimental_persistence"):
            db.create_hnsw_index("i", "x", "vec")
        db.set("hnsw_enable_experimental_persistence", True)
        db.create_hnsw_index("i", "x", "vec")


class TestJoins:
    def test_knn_join_index_vs_brute(self):
        rng = np.random.default_rng(4)
        db = Database()
        a = db.create_table("a", {"aid": "BIGINT", "v": ("FLOAT", 8)})
        b = db.create_table("b", {"bid": "BIGINT", "v": ("FLOAT", 8)})
        av = rng.normal(size=(20, 8)).astype(np.float32)
        bv = rng.normal(size=(200, 8)).astype(np.float32)
        a.insert({"aid": np.arange(20), "v": list(av)})
        b.insert({"bid": np.arange(200), "v": list(bv)})
        brute = knn_join(db, a, b, "v", "v", 3, use_index=False)
        db.create_hnsw_index("bidx", "b", "v")
        indexed = knn_join(db, a, b, "v", "v", 3)
        # differential: indexed vs brute-force (lateral_join.test pattern)
        bkeys = set(zip(brute["left_aid"].tolist(),
                        brute["right_bid"].tolist()))
        ikeys = set(zip(indexed["left_aid"].tolist(),
                        indexed["right_bid"].tolist()))
        assert len(bkeys & ikeys) / len(bkeys) >= 0.9
        # row_num is 1-based per outer row
        assert indexed["row_num"].min() == 1
        assert indexed["row_num"].max() <= 3
        plan = explain_knn_join(db, a, b, "v", "v", 3)
        assert "HNSW_INDEX_JOIN" in plan

    def test_knn_join_null_outer_probes_as_zero(self):
        """NULL outer rows still emit k matches, probed as the zero
        vector — the reference's join operator reads raw (zeroed) array
        storage without a validity check
        (hnsw_optimize_join.cpp:126-145; hnsw_lateral_join.test:60-75
        pins 3 output groups with a NULL outer row present)."""
        rng = np.random.default_rng(5)
        db = Database()
        a = db.create_table("a", {"aid": "BIGINT", "v": ("FLOAT", 4)})
        b = db.create_table("b", {"bid": "BIGINT", "v": ("FLOAT", 4)})
        a.insert([{"aid": 0, "v": np.ones(4, np.float32)},
                  {"aid": 1, "v": None}])
        b.insert({"bid": np.arange(10),
                  "v": list(rng.normal(size=(10, 4)).astype(np.float32))})
        out = knn_join(db, a, b, "v", "v", 2, use_index=False)
        assert set(out["left_aid"].tolist()) == {0, 1}
        # the NULL probe's matches are the nearest rows to the origin
        null_rows = out["right_bid"][out["left_aid"] == 1]
        bb, _ = b.scan()
        want = np.argsort((bb["v"] ** 2).sum(1))[:2]
        assert set(null_rows.tolist()) == set(bb["bid"][want].tolist())

    def test_knn_join_k_guard(self):
        db = Database()
        a = db.create_table("a", {"v": ("FLOAT", 4)})
        b = db.create_table("b", {"v": ("FLOAT", 4)})
        with pytest.raises(BinderError):
            knn_join(db, a, b, "v", "v", 5000, use_index=False)

    def test_vss_match_macro(self):
        rng = np.random.default_rng(6)
        db = Database()
        b = db.create_table("b", {"bid": "BIGINT", "v": ("FLOAT", 8)})
        bv = rng.normal(size=(50, 8)).astype(np.float32)
        b.insert({"bid": np.arange(50), "v": list(bv)})
        out = db.vss_match(b, bv[7], "v", 1)
        assert out["right_bid"][0] == 7


class TestOperatorAliases:
    def test_distance_operator_aliases(self):
        # <-> / <=> / <#> map to the metric functions
        # (MakeFunctionMatcher, hnsw_index.cpp:632-662)
        db, t, vecs, rng = make_db(n=200, metric="l2sq")
        e = E.fn("<->", E.col("vec"), E.const(vecs[0]))
        plan = t.select("id").order_by(e).limit(3).explain()
        assert "HNSW_INDEX_SCAN" in plan
        res = t.select("id").order_by(e).limit(3).execute()
        assert res["id"][0] == 0

    def test_ip_operator(self):
        db, t, vecs, rng = make_db(n=200, metric="ip")
        e = E.fn("<#>", E.col("vec"), E.const(vecs[5]))
        plan = t.select("id").order_by(e).limit(3).explain()
        assert "HNSW_INDEX_SCAN" in plan

    def test_query_vector_either_arg_order(self):
        db, t, vecs, rng = make_db(n=200)
        e = E.fn("array_distance", E.const(vecs[3]), E.col("vec"))
        plan = t.select("id").order_by(e).limit(3).explain()
        assert "HNSW_INDEX_SCAN" in plan
        res = t.select("id").order_by(e).limit(1).execute()
        assert res["id"][0] == 3


def test_create_index_progress_two_phase():
    """Two-phase load/build progress (hnsw_index_physical_create.cpp:308-323)."""
    from duckdb_vss_tpu.sql.engine import Database
    rng = np.random.default_rng(3)
    db = Database()
    t = db.create_table("t", {"vec": ("FLOAT", 8)})
    t.insert([{"vec": v} for v in
              rng.normal(size=(300, 8)).astype(np.float32)])
    events = []
    db.create_hnsw_index("idx_p", "t", "vec",
                         on_progress=lambda ph, f: events.append((ph, f)))
    phases = [ph for ph, _ in events]
    assert phases[0] == "load" and "build" in phases
    build_fracs = [f for ph, f in events if ph == "build"]
    assert build_fracs == sorted(build_fracs) and build_fracs[-1] == 1.0
