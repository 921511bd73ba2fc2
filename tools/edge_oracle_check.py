#!/usr/bin/env python3
"""Edge-corpus oracle parity harness.

Builds a tiny documents table that stresses rule corners the sf fixtures
don't contain (empty docs, whitespace-only docs, exact and near dups
across the %4 base/delta split), then runs the standard Spark-dump +
DuckDB-oracle comparison over the dedup family. Guards the NULL-minhash
parity rule in OpsQueries.mhBandCtes (Spark concat_ws skips NULL
minhashes -> md5('') band keys; DuckDB needs the CASE to match).

Usage: python3 tools/edge_oracle_check.py [workdir]
Runs sbt, so the repo build must be green. Exit 0 iff all checks pass.
"""
import os
import subprocess
import sys

workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_edge"
corpus = os.path.join(workdir, "corpus")
dump = os.path.join(workdir, "dump")
os.makedirs(corpus, exist_ok=True)

import duckdb  # driver-side tool, like check_oracle.py

duckdb.connect().execute(
    """
COPY (SELECT * FROM (VALUES
  (0, 'alpha beta gamma delta', 'en', 'src0', 22),
  (1, '', 'en', 'src1', 0),
  (2, '   ', 'en', 'src2', 3),
  (3, '', 'en', 'src3', 0),
  (4, 'alpha beta gamma delta', 'en', 'src0', 22),
  (7, 'alpha beta gamma delt2', 'en', 'src3', 22),
  (11, '  ', 'en', 'src1', 2)
) AS t(doc_id, text, lang, source, n_chars))
TO '%s/documents.parquet' (FORMAT PARQUET)
"""
    % corpus
)

queries = "dedup_incremental,dedup_minhash,dedup_groups,dedup_keep,dedup_exact"
env = dict(os.environ, SPARK_GRAFT_CPUS="4", SPARK_GRAFT_VERIFY_ONLY=queries)
subprocess.run(
    ["sbt", "-batch", f"runMain graft.Verify {corpus} {dump}"],
    check=True,
    env=env,
    cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
)
out = subprocess.run(
    [sys.executable, os.path.join(os.path.dirname(__file__), "check_oracle.py"), corpus, dump],
    capture_output=True,
    text=True,
).stdout
print(out)
fails = [l for l in out.splitlines() if l.startswith("FAIL")]
sys.exit(1 if fails else 0)
