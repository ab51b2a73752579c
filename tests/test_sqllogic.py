"""Run the reference's own sqllogictest suite against this engine.

The .test files are read in place from /root/reference/test/sql/hnsw
(never vendored); each file is one parametrized case. This is the
mechanical parity check for SURVEY.md §4.
"""

import glob
import os

import pytest

from duckdb_vss_tpu.sql.sqllogic import (
    SkipFile,
    run_sqllogic_file,
)

REF_DIR = "/root/reference/test/sql/hnsw"
REF_SLOW_DIR = "/root/reference/test/sql/slow"

# literals in these files encode DuckDB's exact setseed()/random()
# stream; their labeled indexed-vs-unindexed comparisons still run
RNG_DEPENDENT = {"hnsw_lateral_join_group.test",
                 "hnsw_lateral_join_group_large.test"}

FILES = sorted(glob.glob(os.path.join(REF_DIR, "*.test")))
SLOW_FILES = sorted(glob.glob(os.path.join(REF_SLOW_DIR, "*.test*")))


@pytest.mark.skipif(not FILES, reason="reference test suite not mounted")
@pytest.mark.parametrize("path", FILES, ids=[os.path.basename(f)
                                             for f in FILES])
def test_reference_sqllogic(path, tmp_path):
    name = os.path.basename(path)
    try:
        checked = run_sqllogic_file(
            path, str(tmp_path),
            skip_literal_blocks=name in RNG_DEPENDENT)
    except SkipFile as why:
        pytest.skip(f"unsupported require: {why}")
    assert checked >= 0


# the reclaim test asserts scale-invariant RELATIVE block counts over a
# 1M-row fixture; CI (CPU) runs it scaled down, full scale with
# DVT_SQLLOGIC_FULL=1 on the TPU. Literals are substituted consistently
# in both SQL and expected blocks (500000 is the probed row id).
SCALED = {
    "hnsw_reclaim_storage.test_slow": {"1000000": "50000",
                                       "500000": "25000"},
}


@pytest.mark.slow
@pytest.mark.skipif(not SLOW_FILES, reason="reference slow suite not mounted")
@pytest.mark.parametrize("path", SLOW_FILES, ids=[os.path.basename(f)
                                                  for f in SLOW_FILES])
def test_reference_sqllogic_slow(path, tmp_path):
    """The reference's test/sql/slow suite (1M-row storage reclamation,
    1000x1000 lateral joins) — opt-in via `pytest -m slow`."""
    name = os.path.basename(path)
    subs = (None if os.environ.get("DVT_SQLLOGIC_FULL")
            else SCALED.get(name))
    try:
        checked = run_sqllogic_file(
            path, str(tmp_path),
            skip_literal_blocks=name in RNG_DEPENDENT,
            substitutions=subs)
    except SkipFile as why:
        pytest.skip(f"unsupported require: {why}")
    assert checked >= 0
