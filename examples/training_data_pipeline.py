#!/usr/bin/env python
"""End-to-end training-data curation pipeline over the documents table —
the single runnable artifact a new user reads first: every stage of the
curation chain, in the order a production pipeline runs them.

    corpus stats -> quality rules -> NB quality classifier -> trained
    language ID -> exact + MinHash near-dup dedup -> benchmark
    decontamination (exact + fuzzy) -> per-source cap ->
    DSIR target-likeness selection -> temperature mixing -> length/
    source report -> D4 prototype pruning -> BPE + unigram tokenizer
    prep -> sequence packing -> retrieval prep -> split-leakage audits
    -> versioned assemble (+ curriculum epoch) -> fsck -> version diff
    -> ZipNum interchange.

``STAGES`` is the pipeline's contract: tests/test_example_pipeline.py
runs :func:`run` end-to-end and asserts the executed stage sequence
matches it, so this example cannot rot as the engine grows.

Run: python examples/training_data_pipeline.py [sf_dir]
(default sf_dir: /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: the curation chain, in execution order (the test pins run() to this)
STAGES = [
    "corpus_stats",
    "quality_rules",
    "nb_quality",
    "lang_id_trained",
    "dedup",
    "decontam",
    "source_cap",
    "dsir_select",
    "temperature_mix",
    "length_report",
    "prototype_prune",
    "bpe_tokenizer",
    "unigram_tokenizer",
    "pack_sequences",
    "retrieval_prep",
    "leakage_audit",
    "assemble_version",
    "fsck",
    "curriculum_epoch",
    "corpus_diff",
    "zipnum_interchange",
]


def run(spark, sf_dir: str) -> dict:
    """Execute the whole chain at ``sf_dir``; returns {stage: metric}
    in execution order (insertion-ordered dict — the test's contract)."""
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.session import load_tables

    report: dict = {}
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    n0 = docs.count()

    # 0. per-source report card — the numbers to watch per ingest
    from ia_hadoop_tools_spark.operators.textops import corpus_stats

    stats = sorted(
        corpus_stats(docs).collect(), key=lambda r: str(r["source"])
    )
    for r in stats[:3]:
        print(
            f"  {r['source']}: docs={r['n_docs']} tokens={r['n_tokens']} "
            f"dup_frac={r['dup_frac']:.3f}"
        )
    report["corpus_stats"] = len(stats)

    # 1. shape-based quality rules (Gopher-style)
    from ia_hadoop_tools_spark.operators.quality import quality_filter

    docs = docs.join(
        quality_filter(docs).filter("passes").select("doc_id"), "doc_id"
    )
    report["quality_rules"] = docs.count()

    # 2. linear quality classifier (GPT-3 App. A): train curated-vs-raw
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
    report["nb_quality"] = docs.count()

    # 3. TRAINED language ID (CCNet/fastText-style char-trigram NB over
    # the same classifier machinery) — the state-of-practice upgrade of
    # the stopword-vote heuristic; here trained on the corpus's own
    # labels and compared against them as a fidelity check
    from ia_hadoop_tools_spark.operators.langid import lang_nb, train_lang_nb

    lid_model = train_lang_nb(docs, label_col="lang", vocab_size=2000).persist()
    preds = lang_nb(docs, lid_model)
    agree = (
        docs.join(preds, "doc_id")
        .select(F.avg((F.col("lang") == F.col("lang_pred")).cast("double")))
        .first()[0]
    )
    print(f"trained langid agrees with labels on {agree:.1%} of docs")
    lid_model.unpersist()
    report["lang_id_trained"] = round(float(agree), 4)

    # 4. exact dedup (projects to id+text, so re-join the metadata), then
    # MinHash near-dup groups (keep one per cluster)
    from ia_hadoop_tools_spark.operators.components import dedup_groups
    from ia_hadoop_tools_spark.operators.textops import (
        dedup_exact_text,
        minhash_lsh_pairs,
    )

    meta = docs.drop("text")
    docs = dedup_exact_text(docs).join(meta, "doc_id")
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    docs = docs.join(
        dedup_groups(docs, pairs).filter("keep").select("doc_id"), "doc_id"
    )
    report["dedup"] = docs.count()

    # 4b. benchmark decontamination, exact + fuzzy (GPT-3 App. C /
    # Dolma practice): the "benchmark" here is a tiny synthetic eval
    # set carved from the corpus — 8-token windows for the exact pass,
    # and the SAME items lightly truncated so the MinHash pass has
    # paraphrase-level leakage to catch that exact windows at n=8 miss
    from ia_hadoop_tools_spark.functions.textfns import tokens as _toks
    from ia_hadoop_tools_spark.operators.decontam import (
        decontaminate,
        decontaminate_fuzzy,
    )

    bench = (
        docs.filter(F.col("doc_id") % 97 == 3)
        .select(
            F.col("doc_id").alias("bench_id"),
            F.concat_ws(
                " ",
                F.slice(
                    _toks(F.col("text")),
                    1,
                    F.greatest(F.size(_toks(F.col("text"))) - 3, F.lit(3)),
                ),
            ).alias("text"),
        )
        .persist()
    )
    docs = decontaminate(docs, bench, n=8, bench_text_col="text")
    fuzzy_clean = decontaminate_fuzzy(docs, bench, threshold=0.5)
    # two stacked anti-joins plus a minhash pass on top of the dedup
    # lineage — cut it here (the dsir_select rationale below) and
    # release the stage's caches before moving on
    docs = fuzzy_clean.localCheckpoint(eager=False)
    report["decontam"] = docs.count()
    bench.unpersist()
    fuzzy_clean.shingle_cache.unpersist()

    # 5. per-source document cap (the RefinedWeb per-domain rule):
    # seeded uniform N-sample per source, so one over-crawled host
    # cannot dominate the mix
    from ia_hadoop_tools_spark.operators.sampling import cap_per_stratum

    docs = cap_per_stratum(docs, 40, seed=0)
    report["source_cap"] = docs.count()

    # 6. DSIR: keep the most English-target-like half
    from ia_hadoop_tools_spark.operators.importance import dsir_select

    docs = docs.join(
        dsir_select(docs, F.col("lang") == "en", 1, 2).select("doc_id"),
        "doc_id",
    )

    # the curated frame now carries six stacked filter joins and feeds
    # an ITERATIVE trainer below (BPE rounds re-plan their input every
    # round) — cut the accumulated lineage once, the engine's own loop
    # rule (components._truncate_lineage)
    docs = docs.localCheckpoint(eager=False)
    n1 = docs.count()
    print(f"docs: {n0} -> {n1} after quality/dedup/cap/selection")
    report["dsir_select"] = n1

    # 7. temperature mixing (XLM scheme): damp the per-language head so
    # low-resource strata keep presence — per-stratum keep fractions by
    # waterfilled p^alpha, realized by the content-addressed sampler
    from ia_hadoop_tools_spark.operators.sampling import (
        sample_stratified,
        temperature_fractions,
    )

    fracs = temperature_fractions(
        docs, alpha=0.7, target_rows=max(1, n1 * 3 // 4), strata_col="lang"
    )
    docs = sample_stratified(docs, fracs, strata_col="lang")
    docs = docs.localCheckpoint(eager=False)
    n2 = docs.count()
    print(f"temperature mix (alpha=0.7): {n1} -> {n2} docs")
    report["temperature_mix"] = n2

    # 8. corpus report: length percentiles per language + distinct sources
    from ia_hadoop_tools_spark.operators.analytics import exact_group_quantiles
    from ia_hadoop_tools_spark.operators.sketches import kmv_distinct

    for r in exact_group_quantiles(
        docs, ["lang"], "n_chars", tiebreak=("doc_id",)
    ).collect():
        print(f"  {r['lang']}: p50={r['p50']} p90={r['p90']} p99={r['p99']}")
    langs = kmv_distinct(docs, ["lang"], F.col("source"), k=64).collect()
    for r in langs:
        print(f"  {r['lang']}: ~{r['est_distinct']} distinct sources")
    report["length_report"] = len(langs)

    # 9. embedding-space diversification (D4): k-means cells over the
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
    kept = verdicts.filter("keep").count()
    print(f"prototype prune: keep {kept}/{verdicts.count()} embeddings")
    cent.unpersist()
    report["prototype_prune"] = kept

    # 10. tokenizer: learn BPE merges from the CURATED corpus (pair work
    # is vocabulary-bounded, so this costs the same at any corpus size
    # past the vocab shuffle), then apply them for tokenizer-TRUE
    # sequence lengths
    from ia_hadoop_tools_spark.operators.bpe import bpe_token_counts, bpe_train

    merges = [(a, b) for a, b, _ in bpe_train(docs, "text", num_merges=5)]
    print("first BPE merges:", ["".join(m) for m in merges])
    counts = bpe_token_counts(docs, merges)
    report["bpe_tokenizer"] = len(merges)

    # 10b. the unigram-LM twin (SentencePiece-style): train a piece
    # model by EM on the curated corpus, Viterbi-count per doc — the
    # second tokenizer family a lab compares before committing; counts
    # here feed the same packing math as the BPE path
    from ia_hadoop_tools_spark.operators.unigram import (
        train_unigram_lm,
        unigram_token_counts,
    )

    uni_model = train_unigram_lm(docs, vocab_size=64, em_iters=1)
    uni = unigram_token_counts(docs, uni_model)
    mean_uni = uni.agg(F.avg("n_tokens")).first()[0]
    print(f"unigram tokenizer: mean {mean_uni:.1f} tokens/doc at vocab 64")
    report["unigram_tokenizer"] = round(float(mean_uni), 2)

    # 11. pack into fixed token-budget training sequences using the REAL
    # tokenizer's counts, not a character-length proxy (LEFT join +
    # zero-fill: bpe_token_counts emits no row for whitespace-only docs,
    # and an inner join would silently drop them from packing)
    from ia_hadoop_tools_spark.operators.sampling import pack_sequences

    tokenized = docs.join(
        counts.select("doc_id", "n_tokens"), "doc_id", "left"
    ).fillna(0, subset=["n_tokens"])
    packed = pack_sequences(tokenized, budget=2048, token_col="n_tokens")
    n_bins = packed.select("bin").distinct().count()
    print(f"packed training bins: {n_bins}")
    report["pack_sequences"] = n_bins

    # 12. retrieval prep: overlapping chunks for the embedding pipeline +
    # per-doc characteristic terms for corpus triage
    from ia_hadoop_tools_spark.operators.chunking import chunk_documents
    from ia_hadoop_tools_spark.operators.search import tfidf_topk

    chunks = chunk_documents(docs, chunk_tokens=64, stride=48)
    n_chunks = chunks.count()
    print(f"embedding chunks: {n_chunks}")
    top = tfidf_topk(docs, k=3).filter(F.col("rank") == 1).limit(3)
    print("sample doc labels:", [(r.doc_id, r.token) for r in top.collect()])
    report["retrieval_prep"] = n_chunks

    # 13. eval-split contamination audits BEFORE publishing: exact
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
    print(
        f"split leakage: {exact_leaks} exact groups, "
        f"{near_leaks} near-dup pairs"
    )
    report["leakage_audit"] = exact_leaks + near_leaks

    # 14. publish the training corpus as an atomic, replayable VERSION:
    # split -> seeded CURRICULUM order (phase-major by language — any
    # content-derived phase works; a quality-bucket cut is the usual
    # annealing schedule) -> token-budget packing, all committed under
    # the _PUBLISHED marker. The manifest carries per-split counts AND
    # pack_waste (tail-bin padding — the number a training team watches).
    import tempfile

    from ia_hadoop_tools_spark.operators.assemble import (
        assemble_corpus,
        export_version_zipnum,
        import_corpus_zipnum,
        read_manifest,
    )

    root = tempfile.mkdtemp(prefix="corpus_versions_")
    assemble_corpus(
        tokenized, root, splits=splits, n_shards=4, seed=1,
        budget=2048, phase_col="lang",
    )
    man = read_manifest(root)
    print("published corpus version:", man["counts"])
    print(
        "pack waste:",
        {s: w["fraction"] for s, w in man["pack_waste"].items()},
    )
    report["assemble_version"] = sum(man["counts"].values())

    # 15. fsck the version BEFORE a training run pins it: counts vs
    # manifest, split/shard domains, dense per-shard pos, unique ids
    from ia_hadoop_tools_spark.operators.assemble import (
        verify_corpus_version,
    )

    rep = verify_corpus_version(spark, root, id_col="doc_id")
    print("corpus-verify:", "OK" if rep["ok"] else rep["checks"])
    assert rep["ok"], rep
    report["fsck"] = rep["ok"]

    # 16. next epoch: same inputs + params, epoch+1 — split assignment
    # stays put (content-addressed), order decorrelates, both versions
    # remain independently replayable
    assemble_corpus(
        tokenized, root, splits=splits, n_shards=4, seed=1,
        budget=2048, phase_col="lang", epoch=1,
    )
    report["curriculum_epoch"] = read_manifest(root)["epoch"]

    # 17. what changed between the two versions? An epoch-only
    # re-shuffle must diff EMPTY on content (no added/removed) and
    # NONEMPTY on order — the pre-retraining sanity check
    from ia_hadoop_tools_spark.operators.assemble import (
        corpus_diff,
        corpus_diff_summary,
        corpus_manifest_diff,
    )

    mdiff = corpus_manifest_diff(root)
    diff = corpus_diff(spark, root)
    by_status = {
        r["status"]: r["n"]
        for r in corpus_diff_summary(diff)
        .groupBy("status")
        .agg(F.sum("n_docs").alias("n"))
        .collect()
    }
    print(f"corpus diff v0->v1: params {mdiff['params_changed']}, "
          f"placement {by_status}")
    assert "added" not in by_status and "removed" not in by_status
    report["corpus_diff"] = sum(by_status.values())

    # 18. interchange: the published version round-trips through the
    # reference's own ZipNum format (training-order keys => indexed
    # range scans can stream a single split)
    zn = tempfile.mkdtemp(prefix="corpus_zipnum_")
    export_version_zipnum(spark, root, zn)
    back = import_corpus_zipnum(
        spark, zn, "doc_id bigint, text string"
    ).count()
    print(f"zipnum round-trip rows: {back}")
    report["zipnum_interchange"] = back

    nb_model.unpersist()
    return report


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from ia_hadoop_tools_spark.session import get_spark

    spark = get_spark("example-training-data")
    spark.sparkContext.setLogLevel("ERROR")
    report = run(spark, sf_dir)
    print(f"pipeline complete: {len(report)}/{len(STAGES)} stages")
    spark.stop()


if __name__ == "__main__":
    main()
