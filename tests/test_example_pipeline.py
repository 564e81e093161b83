"""The example pipeline is the engine's front door — run it end-to-end
and pin its stage sequence so it cannot rot as the engine grows (round-8
verdict task #8: the stage list is asserted, so adding a curation stage
to the engine without threading it through the example fails here)."""

from __future__ import annotations

import importlib.util
import os

_EXAMPLE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples",
    "training_data_pipeline.py",
)


def _load():
    spec = importlib.util.spec_from_file_location("example_pipeline", _EXAMPLE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


EXPECTED_STAGES = [
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


def test_stage_list_is_the_full_curation_chain():
    assert _load().STAGES == EXPECTED_STAGES


def test_example_runs_every_stage(spark, sf_dir):
    mod = _load()
    report = mod.run(spark, sf_dir)
    # executed sequence == declared sequence (insertion-ordered dict)
    assert list(report) == mod.STAGES
    # monotone filtering through the doc-count stages
    assert (
        report["quality_rules"]
        >= report["nb_quality"]
        >= report["dedup"]
        >= report["decontam"]
        >= report["source_cap"]
        >= report["dsir_select"]
        >= report["temperature_mix"]
        > 0
    )
    assert report["fsck"] is True
    assert report["corpus_diff"] > 0  # epoch re-shuffle moved something
    assert report["zipnum_interchange"] == report["assemble_version"]
