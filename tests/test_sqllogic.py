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

# literals in these files encode DuckDB's exact setseed()/random()
# stream; their labeled indexed-vs-unindexed comparisons still run
RNG_DEPENDENT = {"hnsw_lateral_join_group.test"}

FILES = sorted(glob.glob(os.path.join(REF_DIR, "*.test")))


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
