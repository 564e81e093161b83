#!/usr/bin/env python
"""End-to-end training-data curation pipeline over the documents table:

    quality rules -> language filter -> exact + MinHash near-dup dedup ->
    benchmark decontamination -> DSIR target-likeness selection ->
    quality-score percentiles + distinct-source sketch -> packed sequences
    -> BPE tokenizer prep on the curated corpus.

Run: python examples/training_data_pipeline.py [sf_dir]
(default sf_dir: /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.operators.components import dedup_groups
    from ia_hadoop_tools_spark.operators.importance import dsir_select
    from ia_hadoop_tools_spark.operators.quality import quality_filter
    from ia_hadoop_tools_spark.operators.sketches import kmv_distinct
    from ia_hadoop_tools_spark.operators.analytics import exact_group_quantiles
    from ia_hadoop_tools_spark.operators.sampling import pack_sequences
    from ia_hadoop_tools_spark.operators.textops import (
        dedup_exact_text,
        minhash_lsh_pairs,
    )
    from ia_hadoop_tools_spark.session import get_spark, load_tables

    spark = get_spark("example-training-data")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    n0 = docs.count()

    # 0. per-source report card — the numbers to watch per ingest
    from ia_hadoop_tools_spark.operators.textops import corpus_stats

    for r in sorted(
        corpus_stats(docs).collect(), key=lambda r: str(r["source"])
    )[:3]:
        print(
            f"  {r['source']}: docs={r['n_docs']} tokens={r['n_tokens']} "
            f"dup_frac={r['dup_frac']:.3f}"
        )

    # 1. shape-based quality rules (Gopher-style)
    docs = docs.join(
        quality_filter(docs).filter("passes").select("doc_id"), "doc_id"
    )

    # 1b. linear quality classifier (GPT-3 App. A): train curated-vs-raw
    # — the English slice stands in for the curated reference — and keep
    # docs the model scores at least reference-neutral
    from ia_hadoop_tools_spark.operators.classifier import (
        nb_quality_score,
        train_nb_quality,
    )

    nb_model = train_nb_quality(
        docs.filter(F.col("lang") == "en"), docs, vocab_size=5000
    ).persist()
    docs = docs.join(
        nb_quality_score(docs, nb_model)
        .filter(F.col("nb_llr") >= 0)
        .select("doc_id"),
        "doc_id",
    )

    # 2. exact dedup (projects to id+text, so re-join the metadata), then
    # MinHash near-dup groups (keep one per cluster)
    meta = docs.drop("text")
    docs = dedup_exact_text(docs).join(meta, "doc_id")
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    docs = docs.join(
        dedup_groups(docs, pairs).filter("keep").select("doc_id"), "doc_id"
    )

    # 3. DSIR: keep the most English-target-like half
    docs = docs.join(
        dsir_select(docs, F.col("lang") == "en", 1, 2).select("doc_id"),
        "doc_id",
    )
    # the curated frame now carries five stacked filter joins and feeds
    # an ITERATIVE trainer below (BPE rounds re-plan their input every
    # round) — cut the accumulated lineage once, the engine's own loop
    # rule (components._truncate_lineage)
    docs = docs.localCheckpoint(eager=False)
    n1 = docs.count()

    # 4. corpus stats: length percentiles per language + distinct sources
    print(f"docs: {n0} -> {n1} after quality/dedup/selection")
    for r in exact_group_quantiles(
        docs, ["lang"], "n_chars", tiebreak=("doc_id",)
    ).collect():
        print(f"  {r['lang']}: p50={r['p50']} p90={r['p90']} p99={r['p99']}")
    for r in kmv_distinct(docs, ["lang"], F.col("source"), k=64).collect():
        print(f"  {r['lang']}: ~{r['est_distinct']} distinct sources")

    # 4b. embedding-space diversification (D4): k-means cells over the
    # embeddings table, drop the most prototypical 20% per cell — the
    # semantically redundant near-centroid templates
    from ia_hadoop_tools_spark.operators.similarity import (
        prototype_prune,
        train_ivf_centroids,
    )

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    cent = train_ivf_centroids(emb, num_centroids=8).select(
        F.col("__cid").alias("centroid_id"),
        F.col("__cvec").alias("centroid"),
    ).persist()
    verdicts = prototype_prune(emb, cent, keep_frac=0.8)
    print(
        f"prototype prune: keep {verdicts.filter('keep').count()}"
        f"/{verdicts.count()} embeddings"
    )
    cent.unpersist()

    # 5. tokenizer: learn BPE merges from the CURATED corpus (pair work
    # is vocabulary-bounded, so this costs the same at any corpus size
    # past the vocab shuffle), then apply them for tokenizer-TRUE
    # sequence lengths
    from ia_hadoop_tools_spark.operators.bpe import bpe_token_counts, bpe_train

    merges = [(a, b) for a, b, _ in bpe_train(docs, "text", num_merges=5)]
    print("first BPE merges:", ["".join(m) for m in merges])
    counts = bpe_token_counts(docs, merges)

    # 6. pack into fixed token-budget training sequences using the REAL
    # tokenizer's counts, not a character-length proxy (LEFT join +
    # zero-fill: bpe_token_counts emits no row for whitespace-only docs,
    # and an inner join would silently drop them from packing)
    packed = pack_sequences(
        docs.join(counts.select("doc_id", "n_tokens"), "doc_id", "left")
        .fillna(0, subset=["n_tokens"]),
        budget=2048,
        token_col="n_tokens",
    )
    print(
        f"packed training bins: {packed.select('bin').distinct().count()}"
    )

    # 7. retrieval prep: overlapping chunks for the embedding pipeline +
    # per-doc characteristic terms for corpus triage
    from ia_hadoop_tools_spark.operators.chunking import chunk_documents
    from ia_hadoop_tools_spark.operators.search import tfidf_topk

    chunks = chunk_documents(docs, chunk_tokens=64, stride=48)
    print(f"embedding chunks: {chunks.count()}")
    top = tfidf_topk(docs, k=3).filter(F.col("rank") == 1).limit(3)
    print("sample doc labels:", [(r.doc_id, r.token) for r in top.collect()])

    # 8. eval-split contamination audits BEFORE publishing: exact
    # (byte-identical text straddling splits) and near-duplicate (the
    # leakage real corpora have after exact dedup — a val doc that is a
    # 90%-Jaccard rewrite of a train doc)
    from ia_hadoop_tools_spark.operators.sampling import (
        split_leakage,
        split_leakage_near,
    )

    splits = [("train", 0.98), ("val", 0.02)]
    exact_leaks = split_leakage(docs, splits).count()
    near = split_leakage_near(docs, splits, threshold=0.5)
    near_leaks = near.count()
    near.shingle_cache.unpersist()
    print(f"split leakage: {exact_leaks} exact groups, {near_leaks} near-dup pairs")

    # 9. publish the training corpus as an atomic, replayable VERSION:
    # split -> seeded shuffle into shards -> token-budget packing, all
    # committed under the _PUBLISHED marker (same seed+epoch replays the
    # identical layout; epoch+1 is a fresh decorrelated order). The
    # manifest carries per-split counts AND pack_waste (tail-bin padding
    # fraction — the pack-efficiency number a training team watches).
    import tempfile

    from ia_hadoop_tools_spark.operators.assemble import (
        assemble_corpus,
        export_version_zipnum,
        import_corpus_zipnum,
        read_manifest,
    )

    root = tempfile.mkdtemp(prefix="corpus_versions_")
    assemble_corpus(
        docs.join(counts.select("doc_id", "n_tokens"), "doc_id", "left")
        .fillna(0, subset=["n_tokens"]),
        root,
        splits=splits,
        n_shards=4,
        seed=1,
        budget=2048,
    )
    man = read_manifest(root)
    print("published corpus version:", man["counts"])
    print("pack waste:", {s: w["fraction"] for s, w in man["pack_waste"].items()})

    # 9b. fsck the version BEFORE a training run pins it: counts vs
    # manifest, split/shard domains, dense per-shard pos, unique ids
    from ia_hadoop_tools_spark.operators.assemble import verify_corpus_version

    rep = verify_corpus_version(spark, root, id_col="doc_id")
    print("corpus-verify:", "OK" if rep["ok"] else rep["checks"])
    assert rep["ok"], rep

    # 10. interchange: the published version round-trips through the
    # reference's own ZipNum format (training-order keys => indexed
    # range scans can stream a single split)
    zn = tempfile.mkdtemp(prefix="corpus_zipnum_")
    export_version_zipnum(spark, root, zn)
    back = import_corpus_zipnum(
        spark, zn, "doc_id bigint, text string"
    ).count()
    print(f"zipnum round-trip rows: {back}")
    spark.stop()


if __name__ == "__main__":
    main()
