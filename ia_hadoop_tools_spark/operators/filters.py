"""Validating / policy filters over CDX-shaped DataFrames.

Reference semantics re-expressed as chained Catalyst filters (all push down to
the Parquet scan when applied directly after a read):

- ``cdx_filter``: hadoop/streaming/CdxFilterMap.java:25-40 — drop header lines
  and non-web captures (``dns:``, ``filedesc:``, ``warcinfo:`` keys).
- ``global_wayback_filter``: mapreduce/GlobalWaybackMergeMapper.java:38-142 —
  the global-index validation chain (noarchive drop, numeric checks with
  warc/* exemption, live-web 502/504 drop, digest truncation).
- ``prefix_semi_filter``: mapreduce/SortMergeInputFormat.java:278-311 — keep
  rows whose key starts with any of a prefix list (semi-join by prefix).
- ``access_control_filter``: pig/udf/AccessControlAllowCapture.java:14-67 —
  drop captures matching an external block-rule table (anti-join by policy).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EXCLUDED_KEY_PREFIXES = (" CDX", "dns:", "filedesc:", "warcinfo:")


def cdx_filter(df: DataFrame, key_col: str = "urlkey") -> DataFrame:
    """Drop header lines and dns:/filedesc:/warcinfo: pseudo-captures."""
    c = F.col(key_col)
    cond = None
    for p in _EXCLUDED_KEY_PREFIXES:
        clause = c.startswith(p)
        cond = clause if cond is None else (cond | clause)
    return df.filter(~cond)


def global_wayback_filter(
    df: DataFrame,
    truncate_digest: bool = True,
) -> DataFrame:
    """Validation chain for the global Wayback index merge.

    Rules (GlobalWaybackMergeMapper.java:38-142):
      1. drop noarchive captures — meta_flags contains 'A';
      2. drop rows without a numeric statuscode unless mimetype CONTAINS
         'warc/' (revisit records legitimately carry '-'; the reference
         gates on mime.contains("warc/"), GlobalWaybackMergeMapper.java:106
         — contains, not startswith, matched exactly here);
      3. drop rows without a numeric compressed_offset;
      4. drop live-web proxy errors — statuscode 502/504 from
         live-20*.arc.gz, EXCEPT warc/* mimetypes (the reference's whole
         502/504 block sits inside the non-warc branch,
         GlobalWaybackMergeMapper.java:107-109 — warc rows "ride");
      5. truncate digest to its first 3 chars (the global index stores only a
         collision-check prefix).
    """
    out = df.filter(
        ~F.coalesce(F.col("meta_flags").contains("A"), F.lit(False))
    )
    out = out.filter(
        F.col("statuscode").isNotNull() | F.col("mimetype").contains("warc/")
    )
    out = out.filter(F.col("compressed_offset").isNotNull())
    # null-safe: a NULL statuscode (legit for warc/* rows that passed rule
    # 2) must coalesce to "not a proxy error", not to NULL — an unguarded
    # NULL here propagated through the AND and ~NULL dropped the row
    out = out.filter(
        ~(
            F.coalesce(F.col("statuscode").isin(502, 504), F.lit(False))
            & ~F.coalesce(
                F.col("mimetype").contains("warc/"), F.lit(False)
            )
            & F.coalesce(F.col("filename").startswith("live-20"), F.lit(False))
            & F.coalesce(F.col("filename").endswith(".arc.gz"), F.lit(False))
        )
    )
    if truncate_digest:
        out = out.withColumn("digest", F.substring("digest", 1, 3))
    return out


def prefix_semi_filter(
    df: DataFrame, prefixes: Sequence[str], key_col: str = "urlkey"
) -> DataFrame:
    """Keep rows whose ``key_col`` starts with ANY prefix in the list.

    The prefix list is the reference's broadcast filter file (small — it memo-
    cached 100 entries); we inline it as an array literal and evaluate with
    ``F.exists`` so the whole predicate stays inside whole-stage codegen — one
    scan, no shuffle, no Python. For very large prefix sets, prefer exploding
    by distinct prefix length + broadcast semi-join.
    """
    if not prefixes:
        return df.filter(F.lit(False))
    arr = F.array(*[F.lit(p) for p in sorted(set(prefixes))])
    return df.filter(F.exists(arr, lambda p: F.col(key_col).startswith(p)))


def access_control_filter(
    df: DataFrame,
    rules: DataFrame,
    key_col: str = "urlkey",
    rule_key: str = "key_prefix",
    rule_policy: str = "policy",
    blocked_policies: Sequence[str] = ("block", "block-message"),
) -> DataFrame:
    """Drop captures whose key matches a blocked access-control rule.

    ``rules`` is a (key_prefix, policy) DataFrame — the external oracle of the
    reference becomes an explicit rules table. Blocked prefixes are broadcast
    and the drop is a left-anti prefix join (executed as a broadcast
    nested-loop anti-join — fine because policy tables are small; an equi
    variant on exact keys would broadcast-hash instead).
    """
    blocked = rules.filter(F.col(rule_policy).isin(*blocked_policies)).select(
        F.col(rule_key).alias("__block_prefix")
    )
    cond = F.col(key_col).startswith(F.col("__block_prefix"))
    return df.join(F.broadcast(blocked), on=cond, how="left_anti")
