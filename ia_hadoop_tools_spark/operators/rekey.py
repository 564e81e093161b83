"""CDX re-keying by public-suffix split (the CDXTransformer experiment).

Reference: jobs/CDXTransformer.java:54-138 — parse a 9/10-column CDX line,
drop noarchive ('A' meta flag) and bad-offset rows, then re-key each capture by
the SURT form of its URL's *registered domain* (public suffix + one label),
emitting the subdomain remainder and scheme as separate columns:

    ( pubsuffix_surt, path_query, timestamp, public_prefix, scheme,
      original_url, mimetype, statuscode, digest, redirect,
      compressed_offset, filename )

The Java version delegates host splitting to webarchive-commons
(HandyURL.getPublicSuffix/getPublicPrefix) backed by the full Mozilla
public-suffix list; this engine uses a compact built-in multi-label-suffix set
(extensible via the ``extra_suffixes`` argument) and otherwise the same rule:
registered domain = last 2 labels, or last 3 when the last 2 are a listed
multi-part suffix. Everything is built-in column expressions — no Python UDF,
the whole transform stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: last-2-label combinations that are themselves a public suffix, so the
#: registered domain takes three labels (subset of the PSL; extend as needed).
MULTI_PART_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.nz", "co.za",
)

# (?i): schemes are case-insensitive (RFC 3986 §3.1) and mixed-case
# schemes occur in real crawl data — a lowercase-only anchor silently
# dropped those rows at the size(labels) >= 2 filter
_SCHEME_RE = r"(?i)^([a-z][a-z0-9+.-]*)://"
_HOST_RE = r"(?i)^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
_PATHQUERY_RE = r"(?i)^[a-z][a-z0-9+.-]*://[^/?#]*([/?][^#]*)"


def _host_labels(url: Column) -> Column:
    # filter(...!=""): Spark's split KEEPS trailing empty strings where
    # Java's String.split drops them — a trailing-dot host ('example.com.')
    # would otherwise key as ('com','') i.e. the bogus SURT '(,com'
    return F.filter(
        F.split(F.lower(F.regexp_extract(url, _HOST_RE, 1)), r"\."),
        lambda t: t != "",
    )


def _suffix_label_count(labels: Column, suffixes: tuple[str, ...]) -> Column:
    """2, or 3 when the final two labels form a listed multi-part suffix.

    ``try_element_at`` (null, not error, out of bounds) keeps the expression
    ANSI-safe on hosts with fewer than two labels — such rows are filtered out,
    but filter/projection evaluation order is the optimizer's choice.
    """
    last2 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-2)), F.try_element_at(labels, F.lit(-1))
    )
    return F.when(
        (F.size(labels) >= 3) & last2.isin(*suffixes), F.lit(3)
    ).otherwise(F.lit(2))


def cdx_transform(
    df: DataFrame,
    url_col: str = "original_url",
    extra_suffixes: tuple[str, ...] = (),
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Re-key parsed CDX rows by public-suffix SURT (CDXTransformer.output).

    ``df`` is a parsed CDX DataFrame (operators/parse.py schema). Rows whose
    meta_flags contain 'A' (noarchive) or whose compressed_offset is null are
    dropped, matching CDXTransformer.java:66-92. Null string outputs are
    spelled '-' on the text boundary only (kept as NULL here; cdx_to_text
    handles the dash convention).
    """
    # labels are lowercased before the suffix compare — lowercase the
    # user's extra suffixes too, or mixed-case entries silently never match
    suffixes = tuple(MULTI_PART_SUFFIXES) + tuple(
        sx.lower() for sx in extra_suffixes
    )
    url = F.col(url_col)
    labels = _host_labels(url)
    n = F.size(labels)
    # dotted IPv4 hosts stay UNREVERSED (webarchive-commons hostToSURT
    # preserves IPs; splitting octets as DNS labels would group unrelated
    # hosts under the last two octets)
    host = F.array_join(labels, ".")
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    k = _suffix_label_count(labels, suffixes)
    # registered domain labels = last k; SURT = reversed, comma-joined,
    # wrapped in '(' like URLRegexTransformer.hostToSURT.
    reg = F.slice(labels, F.greatest(n - k + 1, F.lit(1)), k)
    pub_suffix_surt = F.when(
        is_ip, F.concat(F.lit("("), host)
    ).otherwise(F.concat(F.lit("("), F.array_join(F.reverse(reg), ",")))
    prefix = F.when(is_ip, F.lit(None).cast("string")).otherwise(
        F.when(n > k, F.array_join(F.slice(labels, 1, n - k), ".")).otherwise(
            F.lit(None).cast("string")
        )
    )
    path_query = F.regexp_extract(url, _PATHQUERY_RE, 1)
    path_query = F.when(path_query == "", F.lit("/")).otherwise(path_query)
    # normalized: schemes are case-insensitive, so the VALUE lowercases
    # (keeping the raw case would split groupBy('scheme') on case)
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))

    out = df
    if "meta_flags" in df.columns:
        out = out.filter(
            F.col("meta_flags").isNull() | ~F.col("meta_flags").contains("A")
        )
    if "compressed_offset" in df.columns:
        out = out.filter(F.col("compressed_offset").isNotNull())
    base = (
        "timestamp", url_col, "mimetype", "statuscode", "digest",
        "redirect", "compressed_offset", "filename",
    )
    # dedup passthrough against the base list: an overlapping name would
    # emit a duplicate column (AMBIGUOUS_REFERENCE downstream)
    keep = [c for c in base if c in df.columns] + [
        c for c in passthrough if c in df.columns and c not in base
    ]
    # column order matches the documented CDXTransformer tuple: timestamp
    # third, then the split host parts (positional text consumers rely on
    # the documented order)
    return out.filter((F.size(labels) >= 2) | is_ip).select(
        pub_suffix_surt.alias("pub_suffix_surt"),
        path_query.alias("path_query"),
        *(["timestamp"] if "timestamp" in df.columns else []),
        prefix.alias("public_prefix"),
        scheme.alias("scheme"),
        *[c for c in keep if c != "timestamp"],
    )
