"""Count-min sketch (Cormode & Muthukrishnan 2005, public): bounded-
memory frequency estimation for heavy-hitter queries at corpus scale.

A CMS is ``depth`` hash rows x ``width`` counters; add(key) increments
one counter per row, estimate(key) = min over rows. Estimates never
undercount; overcount is bounded by n/width per row w.h.p. At 100 TB
the sketch (depth*width integers) replaces a full-cardinality groupBy
for "how often does X occur" probes: counters build in ONE map-side-
combinable aggregation, merge by elementwise +, and broadcast for
estimation — the same shape Spark's own approx sketches use, but with
a DETERMINISTIC md5 hash family so a SQL oracle can replicate every
counter exactly (catalog.pipe_heavy_hitters_cms hash-certifies the
whole sketch path: hashing, counter build, min-estimate).

Hash family: bucket_r(key) = int(md5(r || ':' || key)[:3 hex], 16)
% width — Spark computes it with conv(substring(md5(...))) (pure JVM),
DuckDB with strpos hex arithmetic; both are the same integer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEPTH = 4
WIDTH = 1024


def _bucket(r: int, key: Column, width: int) -> Column:
    h = F.md5(F.concat(F.lit(str(r)), F.lit(":"), key))
    return F.pmod(
        F.conv(F.substring(h, 1, 3), 16, 10).cast("long"), F.lit(width)
    ).cast("int")


def _rb_pairs(key: Column, depth: int, width: int) -> Column:
    """array<struct<r int, b int>> of all depth bucket coordinates for
    one key — generated per input row so the sketch builds from a
    SINGLE scan of the input (ADVICE r04: the previous depth-way union
    re-read the input ``depth`` times; at 100 TB that is depth x the
    I/O)."""
    return F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("r"),
                _bucket(r, key, width).alias("b"),
            )
            for r in range(depth)
        ]
    )


def cms_build(
    items: DataFrame, key_col: str, depth: int = DEPTH, width: int = WIDTH
) -> DataFrame:
    """One row per item occurrence in ``items`` -> sketch counters
    (r int, b int, cnt bigint); at most depth*width rows. ONE input
    scan (inline-exploded (r,b) pairs) feeding one map-side-combinable
    aggregation; no full-cardinality state."""
    return (
        items.select(F.inline(_rb_pairs(F.col(key_col), depth, width)))
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """(key, cms_est bigint): min over rows of the key's counter.
    ``sketch`` is tiny (<= depth*width rows) and broadcast; keys absent
    from every row still read a counter (CMS never undercounts, so the
    estimate is whatever collisions put there)."""
    probes = keys.select(
        F.col(key_col).alias("key"),
        F.inline(_rb_pairs(F.col(key_col), depth, width)),
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "b"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("cms_est"))
    )


def duckdb_cms_sql(
    items_sql: str,
    keys_sql: str,
    key_expr: str = "key",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> str:
    """CTE chain replicating cms_build + cms_estimate exactly:
    ends in ``cmsest`` with columns (key, cms_est BIGINT)."""

    def bucket(expr: str, r: int) -> str:
        h = f"md5('{r}:' || {expr})"
        return (
            f"((strpos('0123456789abcdef', substr({h}, 1, 1)) - 1) * 256"
            f" + (strpos('0123456789abcdef', substr({h}, 2, 1)) - 1) * 16"
            f" + strpos('0123456789abcdef', substr({h}, 3, 1)) - 1) % {width}"
        )

    occ_rows = "\n  UNION ALL\n".join(
        f"  SELECT {r} AS r, {bucket(key_expr, r)} AS b FROM cmsitems"
        for r in range(depth)
    )
    probe_rows = "\n  UNION ALL\n".join(
        f"  SELECT key, {r} AS r, {bucket('key', r)} AS b FROM cmskeys"
        for r in range(depth)
    )
    return f"""
cmsitems AS ({items_sql}),
cmskeys AS ({keys_sql}),
cmsocc AS (
{occ_rows}
),
cmssketch AS (
  SELECT r, b, CAST(count(*) AS BIGINT) AS cnt FROM cmsocc GROUP BY r, b
),
cmsprobe AS (
{probe_rows}
),
cmsest AS (
  SELECT p.key, CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS cms_est
  FROM cmsprobe p LEFT JOIN cmssketch s USING (r, b)
  GROUP BY p.key
)"""
