"""sf1 strict certificates for the oracle-replay-infeasible queries.

The r12 full-registry sf1 sweep (SF1_ORACLE_r12.log) left four queries
"engine-only": `dedup_clusters`, `dedup_keep_best`,
`triangle_counts_copurchase`, `kcore_copurchase`.  r13's richer
synthetic corpus (tools/make_sf1.py: Zipfian few-thousand-word
vocabulary) RETIRED the two near-dup certificates — with
production-shaped shingle diversity their naive oracles replay
directly at sf1 (verified strict-ok, ~9 min total, vs 2+ GB DuckDB
spills on the r12 worst-case corpus), so this tool now covers only
the two GRAPH queries, whose explosion is vocabulary-independent
(lineitem self-join CTEs re-inlined into the recursion/closure
joins).  The near-dup staging machinery is kept below for
reference/reuse behind ``--near-dup`` (e.g. against a future
adversarial corpus), but it is no longer part of the certificate
count.  Their gate oracles
are DELIBERATELY naive (no df_cap, no staging) for semantic
independence, and at sf1 DuckDB's evaluation of them explodes — not
because the arithmetic is quadratic-and-unavoidable, but because the
un-materialized CTEs get re-inlined into the recursion/self-joins:

- `kcore`'s e3 references e2 three times, e2 references e1 three
  times, so the 6M-row lineitem self-join behind e0 is re-planned up
  to 27x (the observed >70 GB spill);
- the near-dup recursive `walk` re-derives the full shingle
  self-join (~9.2e8 pair-instances at sf1) on every recursion step;
- `triangle`'s wedge and closure joins each re-inline `o`, which
  re-inlines `raw` (the lineitem self-join).

This tool re-runs the SAME oracle SQL with one change: each CTE is
materialized into a temp table (CREATE TEMP TABLE per stage), so every
stage is evaluated exactly once.  Stage texts are taken verbatim from
the gate decorators wherever they are importable constants
(SQL_CORPUS_NEAR / SQL_SHINGLES from queries/llm.py, _KCORE_ROUND /
_KCORE_STATS from queries/analytics_q.py); the two inline oracles
(near-dup pairs, triangles) are stage-split copies of the decorator
text at queries/analytics_q.py — same expressions, same predicates.
The only non-textual substitution: the recursive min-label `walk` CTE
is replaced by its iterative fixpoint (label <- min(label, min
neighbor label) until no row changes).  Both compute the identical
least fixpoint — component = min node id reachable in the undirected
graph — the recursion is just DuckDB's encoding of the same lattice
iteration, and the iterative form terminates because labels are
monotone non-increasing over a finite lattice.

Comparison machinery (strict digests, dtype-faithful fetchdf) is
imported from tools/check_oracle.py, so "ok" here means exactly what
a strict gate row means.  Measured staging cost at sf1: the shingle
pair table (the heaviest stage) builds in ~4 min / 49,623 pairs.

Usage:  python tools/sf1_hard_cert.py [/tmp/sf1]
(Generate the data first: python tools/make_sf1.py /tmp/sf1)
"""

from __future__ import annotations

import re
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import check_oracle  # noqa: E402  (tools/check_oracle.py)
from min_flink_spark.core.ckpt import release_backing  # noqa: E402
from min_flink_spark.queries.analytics_q import (  # noqa: E402
    _KCORE_ROUND,
    _KCORE_STATS,
)
from min_flink_spark.queries.llm import SQL_CORPUS_NEAR, SQL_SHINGLES  # noqa: E402
from min_flink_spark.session import get_spark  # noqa: E402
from min_flink_spark.sources import TABLES  # noqa: E402

QUERIES = (
    "triangle_counts_copurchase",
    "kcore_copurchase",
)
NEAR_DUP_QUERIES = (  # retired certificates, kept behind --near-dup
    "dedup_clusters",
    "dedup_keep_best",
)


def _connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    con.execute("SET memory_limit='48GB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


# ---------------------------------------------------------------------------
# near-dup family: shared staged prefix (corpus -> shingles -> pairs -> comp)
# ---------------------------------------------------------------------------


def stage_near_dup_components(con: duckdb.DuckDBPyConnection) -> None:
    """Materialize pairs + components once; both dedup queries read them."""
    t0 = time.time()
    # corpus/shingles: the gate oracle's own constants, staged
    con.execute(f"CREATE TEMP TABLE corpus AS {SQL_CORPUS_NEAR}")
    con.execute(
        # SQL_SHINGLES is written as two CTE bodies ("tokens AS (...),
        # shingles AS (...)"); close it over the materialized corpus.
        f"CREATE TEMP TABLE shingles AS WITH {SQL_SHINGLES} SELECT * FROM shingles"
    )
    print(f"  staged shingles in {time.time() - t0:.1f}s", flush=True)

    # pairs: verbatim stage-split of the decorator text
    # (queries/analytics_q.py `dedup_clusters`) — same join, same
    # Jaccard predicate, evaluated once instead of once per recursion.
    t0 = time.time()
    con.execute(
        """
        CREATE TEMP TABLE pairs AS
        WITH sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
          FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
        """
    )
    n_pairs = con.execute("SELECT count(*) FROM pairs").fetchone()[0]
    print(f"  staged naive pairs in {time.time() - t0:.1f}s ({n_pairs} pairs)", flush=True)

    con.execute(
        """
        CREATE TEMP TABLE edges AS
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
        """
    )
    # Iterative least-fixpoint of the recursive `walk` CTE: labels start
    # at self and monotonically drop to min-reachable-id.  Identical
    # result, no re-derivation of `edges` per recursion step.
    con.execute(
        "CREATE TEMP TABLE labels AS SELECT DISTINCT u AS node, u AS component FROM edges"
    )
    t0 = time.time()
    for it in range(1, 64):
        con.execute(
            """
            CREATE TEMP TABLE labels_next AS
            SELECT l.node,
                   least(l.component, coalesce(m.nc, l.component)) AS component
            FROM labels l LEFT JOIN (
              SELECT e.u AS node, min(l2.component) AS nc
              FROM edges e JOIN labels l2 ON l2.node = e.v
              GROUP BY e.u
            ) m ON m.node = l.node
            """
        )
        changed = con.execute(
            """
            SELECT count(*) FROM labels_next n JOIN labels l ON l.node = n.node
            WHERE n.component != l.component
            """
        ).fetchone()[0]
        con.execute("DROP TABLE labels")
        con.execute("ALTER TABLE labels_next RENAME TO labels")
        if changed == 0:
            print(f"  components converged in {it} rounds ({time.time() - t0:.1f}s)", flush=True)
            break
    else:
        raise RuntimeError("component propagation did not converge in 64 rounds")
    con.execute(
        "CREATE TEMP TABLE comp AS SELECT node, component FROM labels"
    )


DEDUP_CLUSTERS_FINAL = """
SELECT node, CAST(component AS BIGINT) AS component FROM comp
"""

# verbatim tail of the `dedup_keep_best` decorator text, reading the
# staged comp/corpus instead of the recursive walk
DEDUP_KEEP_BEST_FINAL = """
WITH labeled AS (
  SELECT c.doc_id, coalesce(k.component, c.doc_id) AS component,
         length(c.text) AS quality
  FROM corpus c LEFT JOIN comp k ON k.node = c.doc_id
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY component
                            ORDER BY quality DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY component) AS csize
  FROM labeled
)
SELECT CAST(component AS BIGINT) AS component,
       CAST(doc_id AS BIGINT) AS kept_doc,
       CAST(quality AS BIGINT) AS kept_len,
       CAST(csize AS BIGINT) AS cluster_size
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# graph family
# ---------------------------------------------------------------------------


def stage_triangles(con: duckdb.DuckDBPyConnection) -> str:
    """Stage-split of the `triangle_counts_copurchase` decorator text."""
    t0 = time.time()
    con.execute(
        """
        CREATE TEMP TABLE tri_raw AS
        SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS a,
                        greatest(a.l_partkey, b.l_partkey) AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
        """
    )
    con.execute(
        """
        CREATE TEMP TABLE tri_deg AS
        SELECT node, CAST(count(*) AS BIGINT) AS deg
        FROM (SELECT a AS node FROM tri_raw UNION ALL SELECT b FROM tri_raw)
        GROUP BY node
        """
    )
    con.execute(
        """
        CREATE TEMP TABLE tri_o AS
        SELECT CASE WHEN (da.deg, tri_raw.a) < (db.deg, tri_raw.b)
                    THEN tri_raw.a ELSE tri_raw.b END AS src,
               CASE WHEN (da.deg, tri_raw.a) < (db.deg, tri_raw.b)
                    THEN tri_raw.b ELSE tri_raw.a END AS dst,
               CASE WHEN (da.deg, tri_raw.a) < (db.deg, tri_raw.b)
                    THEN db.deg ELSE da.deg END AS ddst
        FROM tri_raw
        JOIN tri_deg da ON da.node = tri_raw.a
        JOIN tri_deg db ON db.node = tri_raw.b
        """
    )
    n_edges = con.execute("SELECT count(*) FROM tri_o").fetchone()[0]
    print(f"  staged oriented edges in {time.time() - t0:.1f}s ({n_edges} edges)", flush=True)
    # wedges + closure in one evaluation over the MATERIALIZED tri_o
    # (wedges alone can exceed memory as a stored table; as a pipeline
    # over a temp table it streams — tri_o is evaluated zero extra times)
    return """
    WITH wedges AS (
      SELECT w1.src, w1.dst AS x, w2.dst AS y
      FROM tri_o w1 JOIN tri_o w2
        ON w1.src = w2.src AND (w1.ddst, w1.dst) < (w2.ddst, w2.dst)
    ),
    tri AS (
      SELECT wedges.src, x, y
      FROM wedges JOIN tri_o o ON o.src = x AND o.dst = y
    ),
    roles AS (
      SELECT src AS node FROM tri
      UNION ALL SELECT x FROM tri
      UNION ALL SELECT y FROM tri
    )
    SELECT node AS part_id, CAST(count(*) AS BIGINT) AS n_triangles
    FROM roles GROUP BY node
    """


def stage_kcore(con: duckdb.DuckDBPyConnection) -> str:
    """Stage e0..e3 with the gate's own _KCORE_ROUND text, evaluated once each."""
    t0 = time.time()
    con.execute(
        """
        CREATE TEMP TABLE e0 AS
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
        """
    )
    print(f"  staged e0 in {time.time() - t0:.1f}s", flush=True)
    for i in (1, 2, 3):
        # _KCORE_ROUND is "e{i} AS (SELECT ...)" — reuse its body
        # verbatim. Split on the ANCHORED alias pattern, not a bare
        # "AS" (ADVICE r12: any future 'AS' earlier in the template
        # would silently corrupt the staged SQL).
        formatted = _KCORE_ROUND.format(i=i, prev=i - 1)
        parts = re.split(rf"\be{i} AS\b", formatted, maxsplit=1)
        assert len(parts) == 2, f"_KCORE_ROUND lost its 'e{i} AS' anchor"
        con.execute(f"CREATE TEMP TABLE e{i} AS {parts[1].strip()}")
    return (
        _KCORE_STATS.format(i=1)
        + " UNION ALL "
        + _KCORE_STATS.format(i=2)
        + " UNION ALL "
        + _KCORE_STATS.format(i=3)
    )


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def main() -> int:
    # ADVICE r12: set strict mode HERE, not at import — module import
    # must not flip the shared check_oracle module for the rest of a
    # pytest process (tests/test_tools_import.py imports this module).
    check_oracle.STRICT = True  # the driver's gate does not round floats
    argv = [a for a in sys.argv[1:] if a != "--near-dup"]
    near_dup = len(argv) != len(sys.argv) - 1
    sf_dir = argv[0] if argv else "/tmp/sf1"
    import importlib

    entry = importlib.import_module("__spark_entry__")
    qs = entry.queries()
    spark = get_spark(app_name="sf1-hard-cert")

    con = _connect(sf_dir)
    duck_rows: dict[str, tuple[list[str], list[tuple]]] = {}

    queries = QUERIES + (NEAR_DUP_QUERIES if near_dup else ())
    near_dup_stages = (
        [
            ("dedup_clusters", DEDUP_CLUSTERS_FINAL),
            ("dedup_keep_best", DEDUP_KEEP_BEST_FINAL),
        ]
        if near_dup
        else []
    )
    if near_dup:
        print(
            "staging near-dup components (retired certificates, --near-dup)",
            flush=True,
        )
        stage_near_dup_components(con)
    for name, final_sql in near_dup_stages:
        odf = con.execute(final_sql).fetchdf()
        duck_rows[name] = (
            list(odf.columns),
            [
                tuple(
                    None if check_oracle._is_pd_na(v) else check_oracle._from_pd(v)
                    for v in rec
                )
                for rec in odf.itertuples(index=False, name=None)
            ],
        )

    print("staging triangles", flush=True)
    t0 = time.time()
    tri_sql = stage_triangles(con)
    odf = con.execute(tri_sql).fetchdf()
    print(f"  triangle closure in {time.time() - t0:.1f}s", flush=True)
    duck_rows["triangle_counts_copurchase"] = (
        list(odf.columns),
        [
            tuple(
                None if check_oracle._is_pd_na(v) else check_oracle._from_pd(v)
                for v in rec
            )
            for rec in odf.itertuples(index=False, name=None)
        ],
    )

    print("staging kcore", flush=True)
    t0 = time.time()
    kcore_sql = stage_kcore(con)
    odf = con.execute(kcore_sql).fetchdf()
    print(f"  kcore rounds in {time.time() - t0:.1f}s", flush=True)
    duck_rows["kcore_copurchase"] = (
        list(odf.columns),
        [
            tuple(
                None if check_oracle._is_pd_na(v) else check_oracle._from_pd(v)
                for v in rec
            )
            for rec in odf.itertuples(index=False, name=None)
        ],
    )

    failures = []
    for name in queries:
        t0 = time.time()
        sdf = qs[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        release_backing(sdf)
        took = time.time() - t0
        ocols, orows = duck_rows[name]
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns {sorted(scols)} vs {sorted(ocols)}")
        elif check_oracle.digest(scols, srows) != check_oracle.digest(ocols, orows):
            problems.append("value-hash mismatch")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}  [spark {took:.1f}s]", flush=True)
        else:
            print(f"ok    {name} ({len(srows)} rows)  [spark {took:.1f}s]", flush=True)

    print(f"\n{len(queries) - len(failures)}/{len(queries)} strict-ok (staged replay) at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
