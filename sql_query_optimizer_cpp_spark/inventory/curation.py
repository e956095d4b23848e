"""Corpus-curation inventory queries over ``documents``: deterministic
stratified sampling, sequence packing, and the composite quality filter.

All three are hash-graded against full DuckDB oracles (the sampling hash
is the portable seeded md5-prefix ``hash64``, so even the sampling
decision matches bit-for-bit across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import register
from ..catalog import load_tables
from ..operators import curation as C

#: Downsample the over-represented languages, keep the tail intact —
#: the canonical rebalancing move in a multilingual training mix.
SAMPLE_RATES = {"en": 0.3, "es": 0.75}
DEFAULT_RATE = 1.0
N_SHARDS = 8
CTX = 2048
MIN_TOKENS = 20
MIN_SCORE = 0.5
ALLOWED_LANGS = ("en", "es", "de", "fr")


@register(
    "sample_stratified",
    oracle=C.stratified_sample_sql(
        "documents", "lang", SAMPLE_RATES, DEFAULT_RATE
    ),
    doc="deterministic hash-bucket stratified sample by lang (en 30%, es "
    "75%, rest 100%): map-side filter, no shuffle, reproducible across "
    "runs/engines/partitionings — rand() sampling is none of those",
    tags=("curation",),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return C.stratified_sample(
        t["documents"], "lang", SAMPLE_RATES, DEFAULT_RATE
    )


@register(
    "pack_sequences",
    oracle=C.pack_sequences_sql("documents", n_shards=N_SHARDS, ctx=CTX),
    doc="GPT-style concat-and-chop sequence packing: per-shard window "
    "cumsum assigns each doc its context bin (ctx=2048) and offset; one "
    "shuffle on shard, shard count = parallelism knob at 100 TB",
    tags=("curation",),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return C.pack_sequences(t["documents"], n_shards=N_SHARDS, ctx=CTX)


@register(
    "text_filter_pipeline",
    oracle=C.quality_filter_sql(
        "documents",
        min_tokens=MIN_TOKENS,
        min_score=MIN_SCORE,
        langs=ALLOWED_LANGS,
    ),
    doc="composite curation filter with auditable first-failing-rule "
    "reason (too_short / low_quality / lang_not_allowed / ok), composed "
    "from the text-analysis operators — pure JVM expressions",
    tags=("curation", "text"),
)
def text_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return C.quality_filter(
        t["documents"],
        min_tokens=MIN_TOKENS,
        min_score=MIN_SCORE,
        langs=ALLOWED_LANGS,
    )


PROBE_MOD = 97
MIN_SHARED = 2


@register(
    "decontaminate",
    oracle=C.decontaminate_sql(
        "documents", probe_mod=PROBE_MOD, min_shared=MIN_SHARED
    ),
    doc="benchmark decontamination: flag training docs sharing >= 2 "
    "distinct 3-gram shingles with the held-out probe split (doc_id % 97 "
    "== 0) — broadcast probe side, shingle equi-join, never a cross join",
    tags=("curation", "dedup"),
)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return C.decontaminate(
        t["documents"], probe_mod=PROBE_MOD, min_shared=MIN_SHARED
    )
