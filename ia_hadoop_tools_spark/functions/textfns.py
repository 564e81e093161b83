"""Text-analysis scalar layer for the training-data pipeline operators.

All pure column expressions (regexp/array ops in codegen) — these run over
every document at 100 TB, so no Python in the loop. Each function has an exact
DuckDB SQL mirror used by the correctness oracle (see __spark_entry__.py).

Components: whitespace + BPE-ish tokenization, stopword-based language ID,
quality scoring (length/punct/stopword ratios), character shingles, and a
min-hash document fingerprint (rolling-hash winnowing, simplified).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.functions.hashfns import hash32, hash32_sql

#: BPE-ish token pattern: word pieces or single non-space symbols.
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

#: Tiny per-language stopword lists for the n-gram/stopword language heuristic.
#: Deliberately small + frozen: they are part of the operator's contract (the
#: oracle mirrors them literally).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "for", "with"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
    "de": ("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"),
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Lowercased whitespace tokens, empties removed."""
    return F.filter(F.split(F.lower(_c(col)), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish token count (letter runs / digit runs / single symbols)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_TOKEN_RE), 0))


def punct_ratio(col: Column | str) -> Column:
    """Non-alphanumeric-non-space chars / total chars (0 for empty)."""
    c = _c(col)
    n = F.length(c)
    p = F.length(F.regexp_replace(c, r"[a-zA-Z0-9\s]", ""))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(sw, t)))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    n = token_count(col)
    return F.when(
        n > 0, stopword_hits(col, lang).cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality in [0,1]:
    0.4 * saturating length term (tokens/100, capped at 1)
    + 0.3 * (1 - punct_ratio) + 0.3 * min(1, 5 * stopword_ratio_en).
    """
    ntok = token_count(col).cast("double")
    len_term = F.least(ntok / F.lit(100.0), F.lit(1.0))
    sw_term = F.least(F.lit(5.0) * stopword_ratio(col, "en"), F.lit(1.0))
    return (
        F.lit(0.4) * len_term + F.lit(0.3) * (F.lit(1.0) - punct_ratio(col)) + F.lit(0.3) * sw_term
    )


def lang_id(col: Column | str) -> Column:
    """Stopword-vote language ID: lang with most stopword hits; ties break
    alphabetically; no hits at all -> 'und'."""
    best_hits = None
    result = F.lit("und")
    # iterate in reverse-alphabetical so the final `when` chain prefers
    # alphabetically-first languages on ties
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        h = stopword_hits(col, lang)
        if best_hits is None:
            best_hits = h
            result = F.when(h > 0, F.lit(lang)).otherwise(F.lit("und"))
        else:
            result = F.when((h > 0) & (h >= best_hits), F.lit(lang)).otherwise(result)
            best_hits = F.greatest(h, best_hits)
    return result


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """All k-char shingles of the lowercased text (empty array if too short).

    ROUND-11 OPTIMIZATION (the langid ``_char_ngram_rows`` lesson, guide
    §4.1): the old ``transform(sequence(1, n-k+1), i -> c.substr(i, k))``
    re-evaluated the FULL ``lower(text)`` subtree per element (lambda
    bodies embed their own copy of every captured expression on the
    interpreted HigherOrderFunction path) and each ``substr(c, i, k)`` is
    an O(i) codepoint seek — quadratic per doc.  Here the char array is
    built once, k shifted ``slice`` views are zipped, and the per-element
    lambda only concats k 1-char fields — O(len·k) per doc.  Shingle
    values/ordering are identical (``split`` and ``substring`` share
    codepoint granularity; astral parity pinned by the langid tests)."""
    c = F.lower(_c(col))
    n = F.length(c)
    chars = F.split(c, "")
    m = n - F.lit(k - 1)
    zipped = F.arrays_zip(
        *[F.slice(chars, i + 1, m).alias(str(i)) for i in range(k)]
    )
    gen = F.transform(
        zipped, lambda s: F.concat(*[s[str(i)] for i in range(k)])
    )
    return F.when(n >= k, gen).otherwise(F.array().cast("array<string>"))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """All n-word shingles (space-joined) of the token stream.

    Zip-of-slices form for the same reason as :func:`char_shingles`: the
    old ``transform(sequence(...), i -> array_join(slice(t, i, n)))``
    re-ran the whole ``tokens()`` split+filter per shingle (O(len²) per
    doc, interpreted); here the token array materializes once per row and
    the per-element work is an n-field concat."""
    t = tokens(col)
    cnt = F.size(t)
    m = cnt - F.lit(n - 1)
    zipped = F.arrays_zip(
        *[F.slice(t, i + 1, m).alias(str(i)) for i in range(n)]
    )
    gen = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
    )
    return F.when(cnt >= n, gen).otherwise(F.array().cast("array<string>"))


def doc_fingerprint(col: Column | str, k: int = 8) -> Column:
    """Rolling-hash document fingerprint: min 32-bit hash over all k-char
    shingles (winnowing with a single global window). Equal fingerprints are
    strong near-dup candidates. Null/short docs -> null."""
    hashes = F.transform(char_shingles(col, k), lambda s: hash32(s))
    return F.array_min(hashes)


def doc_fingerprint_sql(expr: str, k: int = 8) -> str:
    """DuckDB mirror of :func:`doc_fingerprint`."""
    shingle = f"substr(lower({expr}), CAST(i AS INT), {k})"
    return (
        f"list_min(list_transform(range(1, length({expr}) - {k} + 2), "
        f"i -> {hash32_sql(shingle)}))"
    )


# --- WET-style HTML -> plain text ------------------------------------------

#: Ordered (pattern, replacement) steps shared by the Spark expression, its
#: DuckDB mirror, and the Python mirror in ``operators/extract.py``'s
#: ``wet_generate``. Patterns stick to the Java-regex/RE2 common subset
#: (inline (?is) flags, non-greedy, no backreferences). ``&amp;`` decodes
#: LAST so double-encoded entities don't double-decode.
HTML_TEXT_STEPS: tuple[tuple[str, str], ...] = (
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[^>]*>", " "),
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&amp;", "&"),
    (r"\s+", " "),
)


def html_to_text(col: Column | str) -> Column:
    """WET-style plain-text extraction from HTML markup — the text sibling
    of the WAT metadata family (CDX/WAT/WET is the standard web-archive
    derivative triple; the reference stops at WAT,
    /root/reference/src/main/java/org/archive/hadoop/jobs/WATGenerator.java:74).

    Drops script/style/comment content, strips remaining tags, decodes the
    five common entities, collapses whitespace. A pure codegen
    ``regexp_replace`` chain — no Python, scales as a narrow projection.
    """
    c = _c(col)
    for pat, rep in HTML_TEXT_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return F.trim(c)


def html_to_text_sql(expr: str) -> str:
    """DuckDB mirror of :func:`html_to_text` (RE2 'g' flag per step)."""
    for pat, rep in HTML_TEXT_STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return f"trim({expr})"


#: CCNet-style dedup normalization steps (Wenzek et al. 2020 §4.1
#: normalize text before hashing so trivial variants collapse): each a
#: (pattern, replacement) run in order AFTER lowercasing.  Explicit
#: ASCII classes only — Java regex (Spark) and RE2 (DuckDB) agree on
#: them byte-for-byte, which is what makes the oracle mirror exact.
#: Unicode NFKC/accent folding is deliberately NOT here: the two
#: engines' Unicode tables can drift, so anything locale-dependent
#: stays out of the cross-engine contract.  One residual caveat IS
#: pinned rather than hidden (tests/test_normalize_properties.py):
#: ``lower()`` itself diverges between the engines on two known
#: character classes — U+0130 (Java: ``i`` + combining dot; DuckDB
#: utf8proc: plain ``i``) and capital sigma (Java applies the
#: word-final ``ς`` contextual rule; DuckDB always emits ``σ``) — so
#: the SQL mirror is exact on text free of those classes (all Latin-1,
#: CJK, full-width, ligature, and titlecase points verified equal).
NORM_CONTROL = (r"[\x00-\x08\x0b\x0e-\x1f\x7f]", "")  # keep \t \n \f \r
NORM_DIGITS = (r"[0-9]", "0")
NORM_PUNCT = (r"[!-/:-@\[-`{-~]", "")
NORM_WS = (r"[ \t\n\f\r]+", " ")  # the WORD_SPLIT class, collapsed


def normalize_text(
    col: Column | str, digits: bool = True, punct: bool = False
) -> Column:
    """Deduplication-normalized text (CCNet rule): lowercase, strip
    control chars, digits -> ``0`` (``digits``), optionally strip ASCII
    punctuation (``punct``), collapse whitespace runs to one space,
    trim.  Pure codegen ``regexp_replace`` chain — narrow projection,
    no Python; NULL stays NULL."""
    c = F.lower(_c(col))
    steps = [NORM_CONTROL]
    if digits:
        steps.append(NORM_DIGITS)
    if punct:
        steps.append(NORM_PUNCT)
    steps.append(NORM_WS)
    for pat, rep in steps:
        c = F.regexp_replace(c, pat, rep)
    return F.trim(c)


def normalize_text_sql(
    expr: str, digits: bool = True, punct: bool = False
) -> str:
    """DuckDB mirror of :func:`normalize_text` (RE2 'g' flag per step)."""
    out = f"lower({expr})"
    steps = [NORM_CONTROL]
    if digits:
        steps.append(NORM_DIGITS)
    if punct:
        steps.append(NORM_PUNCT)
    steps.append(NORM_WS)
    for pat, rep in steps:
        # quotes only: DuckDB standard strings pass backslashes through
        # verbatim, so RE2 sees the same \xNN escapes Java does (the
        # html_to_text_sql convention)
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{rep}', 'g')"
    return f"trim({out})"
