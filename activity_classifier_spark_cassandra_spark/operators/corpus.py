"""Corpus-construction operators for LLM training-data pipelines:
benchmark decontamination, training-sequence assembly, domain mixing,
quality-gate funnels, and incremental-batch dedup — over ``documents``.

These are the pipeline stages *between* raw dedup (operators/dedup.py)
and model training: decide what may enter the corpus (decontaminate,
quality funnel), decide how much of each slice enters (domain mix),
merge a new crawl batch against the standing corpus (incremental
dedup), and assemble the kept text into fixed-length training
sequences (chunk / pack).

Scale design:
- Decontamination joins the corpus against the *benchmark* shingle
  set, which is tiny (benchmarks are MBs, the corpus is TBs) — so the
  join side is broadcast and the corpus is never shuffled except for
  its own per-doc aggregation.
- Sequence chunking needs a global running token count, which is the
  classic distributed prefix-sum: range-partition by the global order
  key, aggregate one narrow per-partition total, window a cumulative
  offset over that tiny frame (≤ n_partitions rows), broadcast it
  back, and finish with a partition-local window.  No global
  single-partition window, no driver collect — the whole thing is one
  lazy plan whose widest exchange carries (doc_id, n_tok) pairs.
- Everything else is a pure projection + one keyed aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.io import load_table
from .dedup import _DOC_SHINGLES_CTE, _doc_shingle_rows, _shared
from .text import STOPWORDS, _TOKENIZE, _TOKENIZE_SPARK, _sql_in_list
from .sketches import _hash60_sql

# Benchmark membership is keyed on doc_id so the oracle can reproduce
# the split exactly: every 97th document plays the held-out benchmark.
BENCH_MOD = 97
# Fixed training-sequence length (tokens) for chunk/pack assembly.
SEQ_LEN = 512
# Range partitions for the distributed prefix sum (would be O(cluster
# cores) at 100 TB; the algorithm is identical at any count).
CHUNK_PARTITIONS = 8
# Greedy packer: docs are hash-grouped into this many independent
# packing domains — deterministic (doc_id % N), not sampling-based.
PACK_DOMAINS = 8


# ---------------------------------------------------- decontamination
def decontaminate(shingle_rows: DataFrame) -> DataFrame:
    """Benchmark-overlap decontamination over (doc_id, sh) shingle rows.

    Docs with ``doc_id % BENCH_MOD == 0`` form the held-out benchmark;
    every other (training-candidate) document is scored by how many of
    its distinct word-3-grams appear anywhere in the benchmark.  This
    is the standard pre-training decontamination gate (report overlap,
    drop high-overlap docs before training).

    The benchmark shingle set is distinct-reduced then **broadcast** —
    at 100 TB the corpus side streams through a broadcast-hash semi
    join with zero shuffle; the only exchange is the per-doc count
    aggregation, keyed on doc_id (32 B + a long per row).
    """
    # Three consumers (bench set, per-doc totals, overlap join) — share
    # one materialization of the tokenize/window/distinct subplan
    # instead of recomputing it per branch (same move as dedup._shared).
    shingle_rows = _shared(shingle_rows)
    is_bench = (F.col("doc_id") % BENCH_MOD) == 0
    bench_sh = shingle_rows.filter(is_bench).select("sh").distinct()
    train = shingle_rows.filter(~is_bench)
    totals = train.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    overlap = (
        train.join(F.broadcast(bench_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        overlap.join(totals, "doc_id")
        .select(
            "doc_id",
            "n_shingles",
            "n_overlap",
            F.round(F.col("n_overlap") / F.col("n_shingles"), 6).alias(
                "overlap_frac"
            ),
        )
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decontaminate(_doc_shingle_rows(spark, sf_dir))


DECONTAMINATE_SQL = f"""
WITH {_DOC_SHINGLES_CTE.strip()},
rows AS (
  SELECT doc_id, UNNEST(shingles) AS sh FROM doc_shingles
),
bench AS (
  SELECT DISTINCT sh FROM rows WHERE doc_id % {BENCH_MOD} = 0
),
train AS (
  SELECT * FROM rows WHERE doc_id % {BENCH_MOD} <> 0
),
totals AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM train GROUP BY doc_id
),
overlap AS (
  SELECT t.doc_id, COUNT(*) AS n_overlap
  FROM train t JOIN bench USING (sh) GROUP BY t.doc_id
)
SELECT o.doc_id, tt.n_shingles, o.n_overlap,
       ROUND(o.n_overlap * 1.0 / tt.n_shingles, 6) AS overlap_frac
FROM overlap o JOIN totals tt USING (doc_id)
"""


# ------------------------------------------------- sequence chunking
def chunk_sequences(docs: DataFrame, seq_len: int = SEQ_LEN) -> DataFrame:
    """Concatenate-and-chunk training-sequence assembly: documents in
    doc_id order are laid end-to-end on a global token tape and cut
    into fixed ``seq_len``-token sequences; each document belongs to
    the sequence where it *starts* (the standard straddle-allowed
    pretraining layout).

    ``seq_id = (tokens before this doc) DIV seq_len`` needs a global
    prefix sum, distributed as: range-partition on doc_id →
    per-partition token totals (one narrow agg) → cumulative offsets
    via a window over that ≤ CHUNK_PARTITIONS-row frame → broadcast
    the offsets back → partition-local cumulative window.  The single-
    partition window runs over n_partitions rows, never over data.
    """
    n_tok = F.size(F.expr(_TOKENIZE_SPARK)).cast("long")
    # Shared materialization: the per-partition totals branch and the
    # final window both consume the range-partitioned tape.  The persist
    # also guarantees both branches see the identical pid assignment
    # (range boundaries are deterministic anyway, but one physical copy
    # makes that a non-question) and halves the scan+tokenize work.
    t = _shared(
        docs.select("doc_id", n_tok.alias("n_tok"))
        .repartitionByRange(CHUNK_PARTITIONS, "doc_id")
        .withColumn("pid", F.spark_partition_id())
    )
    part_totals = t.groupBy("pid").agg(F.sum("n_tok").alias("part_tok"))
    w_offs = (
        Window.orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = part_totals.select(
        "pid",
        F.coalesce(F.sum("part_tok").over(w_offs), F.lit(0)).alias("offset"),
    )
    w_local = (
        Window.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tape = t.join(F.broadcast(offsets), "pid").select(
        "doc_id",
        "n_tok",
        (
            F.coalesce(F.sum("n_tok").over(w_local), F.lit(0))
            + F.col("offset")
        ).alias("cum_before"),
    )
    return (
        tape.select(
            F.expr(f"cum_before DIV {seq_len}").alias("seq_id"),
            "doc_id",
            "n_tok",
        )
        .groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
    )


def q_chunk_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_sequences(load_table(spark, sf_dir, "documents"))


CHUNK_SEQUENCES_SQL = f"""
WITH t AS (
  SELECT doc_id, LEN({_TOKENIZE}) AS n_tok FROM documents
),
tape AS (
  SELECT doc_id, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM t
)
SELECT CAST(cum_before // {SEQ_LEN} AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc_id,
       MAX(doc_id) AS last_doc_id
FROM tape GROUP BY 1
"""


# -------------------------------------------------------- domain mix
def domain_mix(docs: DataFrame) -> DataFrame:
    """Corpus composition + reweighting: per source, document/char
    share of the corpus and the sampling weight that would flatten the
    mix to uniform-per-source (the domain-reweighting step every
    pretraining mix applies — DoReMi-style weights would just replace
    the uniform target).

    One keyed agg over the scan; the share window runs over the
    aggregated frame (n_sources rows), so the post-shuffle work is
    O(domains), not O(corpus)."""
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )
    w = Window.partitionBy()
    share = F.col("n_docs") / F.sum("n_docs").over(w)
    target = F.lit(1.0) / F.count(F.lit(1)).over(w)
    return agg.select(
        "source",
        "n_docs",
        "sum_chars",
        F.round(share, 6).alias("doc_share"),
        F.round(target / share, 6).alias("mix_weight"),
    )


def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return domain_mix(load_table(spark, sf_dir, "documents"))


DOMAIN_MIX_SQL = """
WITH agg AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY source
)
SELECT source, n_docs, sum_chars,
  ROUND(n_docs * 1.0 / SUM(n_docs) OVER (), 6) AS doc_share,
  ROUND((1.0 / COUNT(*) OVER ())
        / (n_docs * 1.0 / SUM(n_docs) OVER ()), 6) AS mix_weight
FROM agg
"""


# ----------------------------------------------------- quality funnel
# Gates applied cumulatively, in order — the per-stage survivor count
# is the standard corpus-cleaning report ("N docs in, M out, here is
# where the rest went").
_FUNNEL_STAGES: list[tuple[str, str]] = [
    ("00_all", "TRUE"),
    ("01_min_length", "n_chars >= 200"),
    ("02_stopword_ratio", "stop_ratio >= 0.05"),
    ("03_punct_ratio", "punct_ratio <= 0.2"),
]


def _funnel_flags() -> tuple[Column, Column]:
    en = _sql_in_list(STOPWORDS["en"])
    n_tokens = F.size(F.expr(_TOKENIZE_SPARK))
    stop_hits = F.expr(f"size(filter({_TOKENIZE_SPARK}, x -> x IN ({en})))")
    stop_ratio = stop_hits / F.nullif(n_tokens, F.lit(0))
    punct = F.length(F.regexp_replace("text", r"[^.,!?;:]", ""))
    punct_ratio = punct / F.nullif(F.length("text"), F.lit(0))
    return stop_ratio, punct_ratio


def quality_funnel(docs: DataFrame) -> DataFrame:
    """Survivor count + surviving chars after each cumulative quality
    gate.  A single scan computes every per-doc signal in one
    projection; the funnel is 2×len(stages) conditional sums in ONE
    aggregate (no per-stage scan), unpivoted to rows afterwards."""
    stop_ratio, punct_ratio = _funnel_flags()
    flagged = docs.select(
        "n_chars",
        (F.col("n_chars") >= 200).alias("g1"),
        (stop_ratio >= 0.05).alias("g2"),
        (punct_ratio <= 0.2).alias("g3"),
    )
    conds = {
        "00_all": F.lit(True),
        "01_min_length": F.col("g1"),
        "02_stopword_ratio": F.col("g1") & F.col("g2"),
        "03_punct_ratio": F.col("g1") & F.col("g2") & F.col("g3"),
    }
    aggs = []
    for name, c in conds.items():
        safe = F.coalesce(c, F.lit(False))
        aggs.append(
            F.sum(F.when(safe, 1).otherwise(0)).alias(f"n__{name}")
        )
        aggs.append(
            F.sum(F.when(safe, F.col("n_chars")).otherwise(0)).alias(
                f"c__{name}"
            )
        )
    wide = flagged.agg(*aggs)
    stack = ", ".join(
        f"'{name}', n__{name}, c__{name}" for name in conds
    )
    return wide.select(
        F.expr(
            f"stack({len(conds)}, {stack}) AS (stage, n_docs, sum_chars)"
        )
    )


def q_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_funnel(load_table(spark, sf_dir, "documents"))


def _funnel_sql() -> str:
    en = _sql_in_list(STOPWORDS["en"])
    sigs = f"""
flagged AS (
  SELECT n_chars,
    (n_chars >= 200) AS g1,
    (LEN(LIST_FILTER({_TOKENIZE}, x -> x IN ({en})))
       / NULLIF(LEN({_TOKENIZE}), 0) >= 0.05) AS g2,
    (LENGTH(REGEXP_REPLACE(text, '[^.,!?;:]', '', 'g'))
       / NULLIF(LENGTH(text), 0) <= 0.2) AS g3
  FROM documents
)"""
    conds = {
        "00_all": "TRUE",
        "01_min_length": "COALESCE(g1, FALSE)",
        "02_stopword_ratio": "COALESCE(g1 AND g2, FALSE)",
        "03_punct_ratio": "COALESCE(g1 AND g2 AND g3, FALSE)",
    }
    selects = [
        f"SELECT '{name}' AS stage,"
        f" CAST(SUM(CASE WHEN {c} THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,"
        f" CAST(SUM(CASE WHEN {c} THEN n_chars ELSE 0 END) AS BIGINT)"
        f" AS sum_chars FROM flagged"
        for name, c in conds.items()
    ]
    return "WITH " + sigs + "\n" + "\nUNION ALL\n".join(selects)


QUALITY_FUNNEL_SQL = _funnel_sql()


# ------------------------------------------------- incremental dedup
def incremental_dedup(docs: DataFrame) -> DataFrame:
    """Merge a new crawl batch against the standing corpus: batch docs
    (doc_id % 10 < 2) are kept only if their normalized fingerprint is
    (a) unseen in the standing corpus — broadcast/shuffle ANTI join on
    the 32-byte digest — and (b) unique within the batch (keep the min
    doc_id per fingerprint).  Per-source admission report.

    At 100 TB the corpus side is a parquet fingerprint index (digest
    only — never the text), so the anti join exchanges 32 B rows; the
    in-batch dedup aggregates the (small) batch alone."""
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    fp = docs.select(
        "doc_id", "source", F.md5(norm).alias("fp")
    )
    is_batch = (F.col("doc_id") % 10) < 2
    corpus_fp = fp.filter(~is_batch).select("fp").distinct()
    batch = fp.filter(is_batch)
    unseen = batch.join(corpus_fp, "fp", "left_anti")
    kept = (
        unseen.groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_in_batch"),
        )
        .join(
            batch.select(F.col("doc_id").alias("keep_doc_id"), "source"),
            "keep_doc_id",
        )
    )
    n_batch = batch.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_batch_docs")
    )
    n_kept = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("n_in_batch") - 1).alias("n_batch_dups"),
    )
    return (
        n_batch.join(n_kept, "source", "left")
        .select(
            "source",
            "n_batch_docs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("n_batch_dups", F.lit(0)).alias("n_batch_dups"),
            (
                F.col("n_batch_docs")
                - F.coalesce("n_kept", F.lit(0))
                - F.coalesce("n_batch_dups", F.lit(0))
            ).alias("n_corpus_dups"),
        )
    )


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return incremental_dedup(load_table(spark, sf_dir, "documents"))


INCREMENTAL_DEDUP_SQL = r"""
WITH fp AS (
  SELECT doc_id, source,
         md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
  FROM documents
),
batch AS (SELECT * FROM fp WHERE doc_id % 10 < 2),
corpus AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 10 >= 2),
unseen AS (
  SELECT b.* FROM batch b ANTI JOIN corpus c USING (fp)
),
kept AS (
  SELECT fp, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_in_batch
  FROM unseen GROUP BY fp
),
kept_src AS (
  SELECT k.*, b.source FROM kept k
  JOIN batch b ON b.doc_id = k.keep_doc_id
),
nb AS (
  SELECT source, COUNT(*) AS n_batch_docs FROM batch GROUP BY source
),
nk AS (
  SELECT source, COUNT(*) AS n_kept,
         CAST(SUM(n_in_batch - 1) AS BIGINT) AS n_batch_dups
  FROM kept_src GROUP BY source
)
SELECT nb.source, nb.n_batch_docs,
       COALESCE(nk.n_kept, 0) AS n_kept,
       COALESCE(nk.n_batch_dups, 0) AS n_batch_dups,
       nb.n_batch_docs - COALESCE(nk.n_kept, 0)
         - COALESCE(nk.n_batch_dups, 0) AS n_corpus_dups
FROM nb LEFT JOIN nk USING (source)
"""


# ------------------------------------------------------ greedy packer
def pack_greedy(docs: DataFrame, capacity: int = SEQ_LEN) -> DataFrame:
    """No-straddle sequence packing: first-fit-decreasing bin packing
    of documents into ``capacity``-token bins, independently within
    deterministic hash domains (doc_id % PACK_DOMAINS).

    Packing is inherently sequential, so it cannot be a pure SQL
    window; the scalable shape is *domain-local* packing — each domain
    packs its own docs in one Arrow batch via ``applyInPandas``, and
    domains run in parallel across the cluster.  Oversize docs (n_tok
    > capacity) get a singleton bin.  Output is the per-bin summary;
    correctness is pinned by pytest invariants (no bin over capacity
    except singletons, every doc packed exactly once, FFD fill factor)
    plus the ``PACK_GREEDY_SQL`` oracle, which replays the exact same
    FFD recurrence as a DuckDB recursive CTE (one step per rank,
    list-of-remaining-capacities as the carried state).
    """
    import pandas as pd

    n_tok = F.size(F.expr(_TOKENIZE_SPARK)).cast("long")
    t = docs.select(
        "doc_id",
        n_tok.alias("n_tok"),
        (F.col("doc_id") % PACK_DOMAINS).alias("domain"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tok", "doc_id"], ascending=[False, True]
        )
        bins: list[int] = []  # remaining capacity per bin
        assign: list[int] = []
        for tok in pdf["n_tok"]:
            placed = -1
            for i, rem in enumerate(bins):
                if tok <= rem:
                    placed = i
                    break
            if placed < 0:
                bins.append(capacity)
                placed = len(bins) - 1
            bins[placed] -= min(tok, capacity)
            assign.append(placed)
        pdf = pdf.assign(bin_id=assign)
        out = (
            pdf.groupby("bin_id", as_index=False)
            .agg(
                domain=("domain", "first"),
                n_docs=("doc_id", "size"),
                bin_tokens=("n_tok", "sum"),
                min_doc_id=("doc_id", "min"),
            )
        )
        return out[
            ["domain", "bin_id", "n_docs", "bin_tokens", "min_doc_id"]
        ]

    schema = (
        "domain long, bin_id long, n_docs long, "
        "bin_tokens long, min_doc_id long"
    )
    return t.groupBy("domain").applyInPandas(_pack, schema=schema)


def q_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FFD packing registry entry; hash-checked against
    ``PACK_GREEDY_SQL`` (recursive-CTE replay of the same recurrence).
    Deterministic because domains are hash-assigned and FFD order is a
    total order (n_tok desc, doc_id)."""
    return pack_greedy(load_table(spark, sf_dir, "documents"))


# FFD is a sequential recurrence, but at sf-oracle scale DuckDB can
# replay it exactly: one recursive-CTE step per rank within each
# domain, carrying the list of per-bin remaining capacities as state.
# `list_position(list_transform(caps, c -> tok <= c), true)` is the
# first-fit probe; a miss (NULL -> 0) opens a new bin.  Semantics
# mirror pack_greedy._pack line for line, including the LEAST() clamp
# that gives oversize docs a singleton bin.
PACK_GREEDY_SQL = f"""
WITH RECURSIVE base AS (
  SELECT doc_id, CAST(LEN({_TOKENIZE}) AS BIGINT) AS n_tok,
         CAST(doc_id % {PACK_DOMAINS} AS BIGINT) AS domain
  FROM documents
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (
           PARTITION BY domain ORDER BY n_tok DESC, doc_id) AS r,
         COUNT(*) OVER (PARTITION BY domain) AS n
  FROM base
),
pack AS (
  SELECT domain, CAST(0 AS BIGINT) AS r,
         CAST([] AS BIGINT[]) AS caps, CAST([] AS BIGINT[]) AS assign
  FROM (SELECT DISTINCT domain FROM ranked)
  UNION ALL
  SELECT p.domain, p.r + 1,
    CASE WHEN COALESCE(list_position(
                list_transform(p.caps, c -> d.n_tok <= c), true), 0) > 0
      THEN list_transform(p.caps, (c, i) ->
             CASE WHEN i = list_position(
                    list_transform(p.caps, c2 -> d.n_tok <= c2), true)
                  THEN c - LEAST(d.n_tok, {SEQ_LEN}) ELSE c END)
      ELSE list_append(p.caps, {SEQ_LEN} - LEAST(d.n_tok, {SEQ_LEN}))
    END,
    list_append(p.assign,
      CASE WHEN COALESCE(list_position(
                  list_transform(p.caps, c -> d.n_tok <= c), true), 0) > 0
           THEN CAST(list_position(
                  list_transform(p.caps, c -> d.n_tok <= c), true) - 1
                  AS BIGINT)
           ELSE CAST(LEN(p.caps) AS BIGINT) END)
  FROM pack p
  JOIN ranked d ON d.domain = p.domain AND d.r = p.r + 1
),
final AS (
  SELECT p.domain, p.assign
  FROM pack p
  JOIN (SELECT DISTINCT domain, n FROM ranked) dn
    ON dn.domain = p.domain AND p.r = dn.n
),
assigned AS (
  SELECT domain, UNNEST(assign) AS bin_id,
         UNNEST(range(1, LEN(assign) + 1)) AS r
  FROM final
)
SELECT a.domain, a.bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(rk.n_tok) AS BIGINT) AS bin_tokens,
       MIN(rk.doc_id) AS min_doc_id
FROM assigned a
JOIN ranked rk ON rk.domain = a.domain AND rk.r = a.r
GROUP BY a.domain, a.bin_id
"""


# --------------------------------------- temperature domain sampling
TEMP_ALPHA = 0.5  # flattening exponent: sampled share ∝ raw_share^α
TEMP_SEED = 7


def temperature_sample(docs: DataFrame, alpha: float = TEMP_ALPHA) -> DataFrame:
    """Deterministic temperature-scaled domain downsampling — the mix
    step multilingual/multi-domain training corpora apply so dominant
    domains stop drowning the tail (sampled share ∝ raw_share^α).

    Rates never upsample: rate_d = (n_min / n_d)^(1-α) keeps the
    smallest domain whole and thins larger ones, giving exactly the
    ^α-flattened mix.  Selection is a per-row hash threshold
    (md5-portable, no RNG, no driver state): reruns, retries and
    backfills pick the SAME rows — at 100 TB resumability beats
    streaming-RNG "randomness".  One broadcast of the per-domain rate
    table against the scan; no shuffle of the corpus itself.

    Output: per-domain audit (n_docs, n_sampled, rate) — the table a
    data-mix owner signs off on.
    """
    from .sketches import _hash60

    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    n_min = counts.agg(F.min("n_docs").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "source",
        "n_docs",
        F.pow(
            F.col("n_min").cast("double") / F.col("n_docs"), 1.0 - alpha
        ).alias("rate"),
    )
    sampled = (
        docs.join(F.broadcast(rates), "source")
        .where(
            _hash60(F.col("doc_id"), TEMP_SEED)
            < F.col("rate") * F.lit(float(1 << 60))
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return (
        rates.join(sampled, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            F.round("rate", 6).alias("rate"),
        )
        .orderBy("source")
    )


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temperature_sample(load_table(spark, sf_dir, "documents"))


TEMPERATURE_SAMPLE_SQL = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
m AS (SELECT MIN(n_docs) AS n_min FROM counts),
rates AS (
  SELECT source, n_docs,
         POWER(CAST(n_min AS DOUBLE) / n_docs, {1.0 - TEMP_ALPHA}) AS rate
  FROM counts CROSS JOIN m
),
sampled AS (
  SELECT d.source, COUNT(*) AS n_sampled
  FROM documents d JOIN rates r USING (source)
  WHERE {_hash60_sql('d.doc_id', TEMP_SEED)}
        < r.rate * {float(1 << 60)}
  GROUP BY d.source
)
SELECT r.source, r.n_docs,
       COALESCE(s.n_sampled, 0) AS n_sampled,
       ROUND(r.rate, 6) AS rate
FROM rates r LEFT JOIN sampled s USING (source)
ORDER BY r.source
"""


# ------------------------------------- DSIR importance resampling
#
# Data Selection with Importance Resampling (Xie et al., NeurIPS
# 2023): score every raw document by how much more likely its hashed
# n-gram features are under a TARGET-domain bag-of-ngrams model than
# under the raw-corpus model,
#
#   log w(doc) = sum_features n_doc[b] * (ln p_target[b] - ln p_raw[b])
#
# with both models estimated over B hash buckets with add-alpha
# smoothing.  DSIR then Gumbel-top-k resamples on these weights; the
# resampling draw is RNG, so the OPERATOR's contract here is the
# deterministic part every selection run needs: the per-document log
# importance weight (ranking on it IS top-k selection).
#
# Target domain on this corpus: the non-English slice (lang <> 'en')
# — the classic low-resource upsampling setup.
#
# Scale shape (the reason DSIR is THE data-selection method at 100 TB):
# the model is B=256 integers per side, built by ONE pass over the
# hashed-bigram stream (c_raw and c_target come out of the same
# groupBy — target membership is a tag, not a second scan); the
# per-doc scoring join is a broadcast of the 256-row log-ratio table.
# The only wide exchanges are keyed on (doc_id, bucket) and doc_id.
# Features hash through the shared 60-bit md5 recipe (sketches.py) so
# DuckDB replays bucket assignment bit-exactly; per-bucket terms are
# 6-dp-rounded and summed as DECIMAL(38,18) (order-free, the
# retrieval.py trick).

DSIR_BUCKETS = 256
DSIR_ALPHA = 1.0
DSIR_SEED = 41


def _dsir_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, is_target, bucket): one row per bigram occurrence,
    hashed into DSIR_BUCKETS feature buckets."""
    docs = load_table(spark, sf_dir, "documents")
    wt = docs.select(
        "doc_id",
        (F.col("lang") != "en").alias("is_target"),
        F.expr(_TOKENIZE_SPARK).alias("toks"),
    ).filter(F.size("toks") >= 2)
    feats = wt.select(
        "doc_id",
        "is_target",
        F.explode(
            F.expr(
                "transform(slice(toks, 1, size(toks) - 1),"
                " (w, i) -> concat(w, ' ', toks[i + 1]))"
            )
        ).alias("feat"),
    )
    from .sketches import _hash60

    return feats.select(
        "doc_id",
        "is_target",
        (_hash60(F.col("feat"), DSIR_SEED) % DSIR_BUCKETS).alias("bucket"),
    )


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR log importance weight toward the non-English
    target slice: (doc_id, n_feats, log_weight).  Rank descending on
    log_weight and take the head = the DSIR-selected subset."""
    bucketed = _shared(_dsir_bucketed(spark, sf_dir))
    # ONE pass builds both models: raw count = every row, target
    # count = the tagged subset of the same rows.
    dist = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.count(F.when(F.col("is_target"), 1)).alias("c_tgt"),
    )
    # totals over the <=256-row dist frame: a single-partition window
    # on metadata, NOT a corpus-rescanning scalar subquery
    wall = Window.partitionBy(F.lit(1))
    a, b = F.lit(DSIR_ALPHA), F.lit(DSIR_BUCKETS * DSIR_ALPHA)
    ratio = dist.select(
        "bucket",
        (
            F.log((F.col("c_tgt") + a) / (F.sum("c_tgt").over(wall) + b))
            - F.log((F.col("c_raw") + a) / (F.sum("c_raw").over(wall) + b))
        ).alias("log_ratio"),
    )
    per_doc = bucketed.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    term = F.col("n") * F.col("log_ratio")
    return (
        per_doc.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_feats"),
            F.round(
                F.sum(F.round(term, 6).cast("decimal(38,18)")).cast(
                    "double"
                ),
                6,
            ).alias("log_weight"),
        )
    )


DSIR_WEIGHTS_SQL = f"""
WITH wt AS (
  SELECT doc_id, lang <> 'en' AS is_target, {_TOKENIZE} AS toks
  FROM documents
),
bucketed AS MATERIALIZED (
  SELECT doc_id, is_target,
         {_hash60_sql("toks[i] || ' ' || toks[i + 1]", DSIR_SEED)}
           % {DSIR_BUCKETS} AS bucket
  FROM wt, UNNEST(range(1, len(toks))) AS u(i)
  WHERE len(toks) >= 2
),
dist AS (
  SELECT bucket, COUNT(*) AS c_raw,
         COUNT(*) FILTER (WHERE is_target) AS c_tgt
  FROM bucketed GROUP BY bucket
),
ratio AS (
  SELECT bucket,
         LN((c_tgt + {DSIR_ALPHA}) /
            (SUM(c_tgt) OVER () + {DSIR_BUCKETS * DSIR_ALPHA}))
       - LN((c_raw + {DSIR_ALPHA}) /
            (SUM(c_raw) OVER () + {DSIR_BUCKETS * DSIR_ALPHA}))
           AS log_ratio
  FROM dist
),
per_doc AS (
  SELECT doc_id, bucket, COUNT(*) AS n
  FROM bucketed GROUP BY doc_id, bucket
)
SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_feats,
       ROUND(CAST(SUM(CAST(ROUND(n * log_ratio, 6) AS DECIMAL(38,18)))
                  AS DOUBLE), 6) AS log_weight
FROM per_doc JOIN ratio USING (bucket)
GROUP BY doc_id
"""


# ----------------------------------- quality classifier (fastText-ish)
#
# The GPT-3 / LLaMA / RefinedWeb quality gate is a LINEAR classifier
# over hashed bag-of-words features, trained to recognize
# target-domain text and then run over the whole crawl (Brown et al.
# 2020 §A; Joulin et al. 2016 fastText).  This is that operator with
# the training made ENGINE-BIT-EXACT so the DuckDB oracle can replay
# it: full-batch gradient descent with Polyak heavy-ball momentum
# (QC_BETA), QC_ITERS fixed iterations, on QC_BUCKETS hashed-unigram
# tf features.  No bias feature: the classes are ~balanced, the fast
# sigmoid is 0.5 at z = 0, and a unit-x bias feature dwarfs the
# ~1/n_toks tf features under one global LR (measured: the bias
# oscillates and the model collapses to the majority class; without
# it the same budget reaches 0.94 train accuracy).  Momentum is what
# makes 8 iterations enough on this small-margin problem — plain GD
# at the stable LR needs hundreds.  The teacher label is a stopword-density
# gate (stop-token tf >= QC_STOP_TAU) — a classic surface quality
# signal (C4 / Gopher both key on stopword counts) chosen over the
# corpus's ``lang`` column because the synthetic langs share one
# 31-token vocabulary (lang is text-independent: a 5000-iteration
# float logistic regression tops out at 0.62 on it), while the
# density gate is genuinely a function of the features, so the
# learnability pytest can assert the training loop WORKS (train
# accuracy >> majority class) rather than just that it terminates.
#
# Determinism contract (the same recipe as kmeans/BPE training):
#   - features x = ROUND(count/n_toks, 6); hashing via the shared
#     60-bit md5 recipe (sketches.py);
#   - the link is the RATIONAL fast sigmoid p = 0.5 + 0.5*z/(1+|z|)
#     (pure +,*,/,abs IEEE arithmetic — no libm exp whose final ulp
#     could differ between JVM and DuckDB inside a compounding loop);
#   - every cross-row sum is ROUND(...,9) -> DECIMAL(38,18) (exact,
#     order-free); weights re-round to 6 dp each update, IN-ENGINE
#     (Spark ROUND on one side, DuckDB ROUND on the other — never
#     Python's banker's round).
#
# Scale shape: the feature frame is built once and persisted (at
# warehouse scale: written to parquet); each GD iteration is one
# broadcast join against a (QC_BUCKETS+1)-row weight table plus two
# combinable aggregates keyed on doc_id / bucket.  Model state
# crossing the driver per iteration is QC_BUCKETS+1 doubles — the
# same bounded-metadata pattern as the k-means centroids and the BPE
# top pair.  Iterations scan the persisted features, never the raw
# corpus.

QC_BUCKETS = 1024
QC_SEED = 53
QC_ITERS = 8
QC_LR = 150.0
QC_BETA = 0.9
QC_STOPLIST = ["the", "a", "of", "and", "to"]
QC_STOP_TAU = 0.06


def _qc_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", F.expr(_TOKENIZE_SPARK).alias("toks")
    ).filter(F.size("toks") >= 1)
    stops = _sql_in_list(QC_STOPLIST)
    ratio = F.round(
        F.expr(f"size(filter(toks, x -> x IN ({stops})))")
        / F.size("toks"),
        6,
    )
    return toked.select(
        "doc_id",
        (ratio >= QC_STOP_TAU).cast("double").alias("y"),
        "toks",
    )


def _qc_wmap_literal(w_rows: list[tuple[int, float]]) -> str:
    """bucket -> weight literal map.  Only OCCUPIED buckets appear (a
    31-token vocab touches <= 31 of the QC_BUCKETS buckets; every
    other bucket's weight is identically 0 through all iterations
    since its gradient is 0), so the literal stays tiny no matter how
    large the hash space is.  repr() doubles round-trip exactly."""
    if not w_rows:
        return "map(CAST(-1 AS BIGINT), CAST(0.0 AS DOUBLE))"
    parts = ", ".join(
        f"CAST({b} AS BIGINT), CAST({w!r} AS DOUBLE)"
        for b, w in sorted(w_rows)
    )
    return f"map({parts})"


def _qc_p_expr(wmap: str) -> str:
    """Fast-sigmoid score from the per-doc feature ARRAY: a pure
    projection (no join, no per-doc shuffle).  The z sum accumulates
    ROUND(w*x, 9) terms as 1e9-SCALED LONGs inside the fold — exact
    and order-free (so the nondeterministic collect_list order of
    ``fs`` cannot change the result), and primitive: the first cut
    accumulated DECIMAL(38,18) and the per-element BigDecimal boxing
    inside the interpreted higher-order fold made the 100x probe
    superlinear (241s); |w*x| <= ~10 so the scaled terms and any
    per-doc sum sit far below 2^53."""
    term = (
        f"CAST(round(round("
        f"coalesce(element_at({wmap}, f.bucket), CAST(0.0 AS DOUBLE))"
        f" * f.x, 9) * 1000000000.0D, 0) AS LONG)"
    )
    z = (
        f"round(CAST(aggregate(fs, 0L, (acc, f) -> acc + {term})"
        f" AS DOUBLE) / 1000000000.0D, 9)"
    )
    return f"round(0.5D + 0.5D * ({z}) / (1.0D + abs({z})), 9)"


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the hashed linear quality classifier (QC_ITERS full-batch
    GD rounds) and score every document: (doc_id, y_label, score,
    predicted).

    Iteration shape: weights travel as a broadcast literal MAP (the
    k-means-centroid pattern), features live as one persisted row per
    doc carrying its sparse (bucket, x) array — so each GD round is a
    single job: score = pure projection, gradient = explode + ONE
    combinable aggregate on <= vocab-size groups, weight update folded
    into the same aggregate's select.  No joins, no per-round
    createDataFrame round-trip; the driver sees only the <= 31
    occupied weights per round."""
    base = _qc_base(spark, sf_dir)
    # y rides through both aggregations as first() — one corpus pass,
    # no label re-join (a join here re-tokenizes documents a 2nd time)
    from .sketches import _hash60

    doc_feats = _shared(
        base.select(
            "doc_id",
            "y",
            F.size("toks").alias("n_toks"),
            F.explode("toks").alias("tok"),
        )
        .select(
            "doc_id",
            "y",
            "n_toks",
            (_hash60(F.col("tok"), QC_SEED) % QC_BUCKETS).alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(
            F.round(F.count(F.lit(1)) / F.first("n_toks"), 6).alias("x"),
            F.first("y").alias("y0"),
        )
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("bucket", "x")).alias("fs"),
            F.first("y0").alias("y"),
        )
    )
    n_docs = float(doc_feats.count())  # bounded scalar, like kmeans' k

    w_rows: list[tuple[int, float]] = []
    wp_rows: list[tuple[int, float]] = []
    for _ in range(QC_ITERS):
        wmap, wpmap = _qc_wmap_literal(w_rows), _qc_wmap_literal(wp_rows)
        p = F.expr(_qc_p_expr(wmap))
        # two-step select: the scoring fold must be evaluated ONCE per
        # doc, BELOW the Generate — a single select with explode puts
        # the Project above the Generate and the fold runs once per
        # EXPLODED row (31x per doc; measured 194s -> 36s at the 100x
        # probe).  The intermediate Project survives because
        # CollapseProject does not merge across Generate.
        term = (
            doc_feats.select("fs", (p - F.col("y")).alias("d"))
            .select("d", F.explode("fs").alias("f"))
            .groupBy(F.col("f.bucket").alias("bucket"))
            .agg(
                F.sum(
                    F.round(F.col("d") * F.col("f.x"), 9).cast(
                        "decimal(38,18)"
                    )
                )
                .cast("double")
                .alias("g")
            )
        )
        wc = F.expr(
            f"coalesce(element_at({wmap}, bucket), CAST(0.0 AS DOUBLE))"
        )
        wp = F.expr(
            f"coalesce(element_at({wpmap}, bucket), CAST(0.0 AS DOUBLE))"
        )
        updated = term.select(
            "bucket",
            F.round(
                wc
                - F.lit(QC_LR) * F.col("g") / F.lit(n_docs)
                + F.lit(QC_BETA) * (wc - wp),
                6,
            ).alias("w"),
            wc.alias("wprev"),
        ).collect()
        w_rows = [(r.bucket, r.w) for r in updated]
        wp_rows = [(r.bucket, r.wprev) for r in updated]
    p_final = F.expr(_qc_p_expr(_qc_wmap_literal(w_rows)))
    return (
        doc_feats.select(
            "doc_id", F.col("y").alias("y_label"), p_final.alias("_p")
        )
        # two-step so the scoring fold is evaluated once per row;
        # predicted derives from the 6-dp SCORE (not the 9-dp p) so
        # the output is internally consistent: predicted == (score
        # >= 0.5) for every row, with no rounding gap between them
        .select(
            "doc_id",
            "y_label",
            F.round(F.col("_p"), 6).alias("score"),
            (F.round(F.col("_p"), 6) >= 0.5).alias("predicted"),
        )
    )


def _quality_classifier_sql() -> str:
    # z mirrors the Spark fold's 1e9-scaled-LONG accumulation exactly:
    # integral doubles cast to BIGINT identically in both engines
    # (DuckDB's rounding BIGINT cast == Spark's truncating one on an
    # already-ROUND(...,0) value), integer sums are order-free, and
    # the final /1e9 is the same IEEE division.  The gradient sum
    # stays DECIMAL: it aggregates over DOCS (a corpus-scale count
    # where a 1e9-scaled long could overflow), and it runs in the
    # codegen'd columnar aggregate, not the interpreted fold.
    zsum = (
        "ROUND(CAST(SUM(CAST(ROUND(ROUND(w.w * f.x, 9)"
        " * 1000000000.0, 0) AS BIGINT)) AS DOUBLE)"
        " / 1000000000.0, 9)"
    )
    gsum = (
        "CAST(SUM(CAST(ROUND((p.p - p.y) * f.x, 9) AS DECIMAL(38,18)))"
        " AS DOUBLE)"
    )
    ctes = [
        f"""base AS MATERIALIZED (
  SELECT doc_id,
         CAST(ROUND(LEN(LIST_FILTER(toks,
                x -> x IN ({_sql_in_list(QC_STOPLIST)})))
              / LEN(toks), 6) >= {QC_STOP_TAU} AS DOUBLE) AS y,
         toks
  FROM (SELECT doc_id, {_TOKENIZE} AS toks FROM documents)
  WHERE len(toks) >= 1
)""",
        f"""feats AS MATERIALIZED (
  SELECT doc_id, bucket, ROUND(COUNT(*) / ANY_VALUE(n_toks), 6) AS x
  FROM (
    SELECT doc_id, len(toks) AS n_toks,
           {_hash60_sql('tok', QC_SEED)} % {QC_BUCKETS} AS bucket
    FROM base, UNNEST(toks) AS u(tok)
  ) GROUP BY doc_id, bucket
)""",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM base)",
        f"""w0 AS (
  SELECT CAST(b AS BIGINT) AS bucket, CAST(0.0 AS DOUBLE) AS w
  FROM range(0, {QC_BUCKETS}) t(b)
)""",
        # the t=0 'previous iterate' for heavy-ball momentum
        "wm1 AS (SELECT bucket, w FROM w0)",
    ]
    for t in range(1, QC_ITERS + 1):
        prev = f"w{t - 1}"
        prev2 = f"w{t - 2}" if t >= 2 else "wm1"
        ctes.append(f"""z{t} AS MATERIALIZED (
  SELECT f.doc_id, {zsum} AS z
  FROM feats f JOIN {prev} w USING (bucket) GROUP BY f.doc_id
)""")
        ctes.append(f"""p{t} AS MATERIALIZED (
  SELECT z.doc_id, b.y,
         ROUND(0.5 + 0.5 * z.z / (1.0 + ABS(z.z)), 9) AS p
  FROM z{t} z JOIN base b USING (doc_id)
)""")
        ctes.append(f"""g{t} AS (
  SELECT f.bucket, {gsum} AS g
  FROM feats f JOIN p{t} p USING (doc_id) GROUP BY f.bucket
)""")
        ctes.append(f"""w{t} AS MATERIALIZED (
  SELECT w.bucket,
         ROUND(w.w - {QC_LR} * COALESCE(g.g, 0.0) / nn.n
               + {QC_BETA} * (w.w - w2.w), 6) AS w
  FROM {prev} w JOIN {prev2} w2 USING (bucket)
  LEFT JOIN g{t} g USING (bucket) CROSS JOIN nn
)""")
    t = QC_ITERS
    ctes.append(f"""zf AS MATERIALIZED (
  SELECT f.doc_id, {zsum} AS z
  FROM feats f JOIN w{t} w USING (bucket) GROUP BY f.doc_id
)""")
    ctes.append("""pf AS (
  SELECT z.doc_id, b.y,
         ROUND(0.5 + 0.5 * z.z / (1.0 + ABS(z.z)), 9) AS p
  FROM zf z JOIN base b USING (doc_id)
)""")
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT doc_id, y AS y_label, ROUND(p, 6) AS score,"
        "\n       ROUND(p, 6) >= 0.5 AS predicted"
        "\nFROM pf"
    )


QUALITY_CLASSIFIER_SQL = _quality_classifier_sql()


# ------------------------------------ semantic decontamination
#
# Embedding-space benchmark decontamination: n-gram overlap (the
# q_decontaminate gate above) misses PARAPHRASED benchmark leakage,
# so modern pipelines add an embedding-similarity gate (e.g. the
# phrasing-robust decontamination in Llama/Phi data reports): drop
# every training vector whose cosine to ANY held-out benchmark
# vector reaches SEM_DECON_TAU.
#
# Scale shape — the best in the whole family: benchmark eval sets are
# FIXED-SIZE (MBs) while the corpus is TBs, so the benchmark side is
# collected once (bounded metadata, same contract as the k-means
# centroid literal) and embedded in the plan as a broadcast literal;
# the query is then a pure projection over the corpus scan — ZERO
# exchange at any corpus size.  Benchmark membership mirrors the
# text-level gate (vec_id % BENCH_MOD == 0) but is additionally
# pinned to a FIXED id range (vec_id < SEM_DECON_BENCH_MAX): eval
# sets are enumerable and do not grow with the crawl, so a 100x
# corpus probe must hold the benchmark side constant — without the
# pin the % rule would inflate the broadcast literal (and per-row
# work) linearly with corpus copies.  Vectors are 6-dp-rounded so the
# literal round-trips the SQL parser exactly (oracle mirrors).

SEM_DECON_TAU = 0.2
SEM_DECON_BENCH_MAX = 1_000_000


def q_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-corpus-vector verdict against the benchmark slice:
    (vec_id, nearest_bench_id, max_cos, dropped).

    The benchmark matrix is closed over by a mapInPandas stage — still
    a pure map (zero exchange), but the per-row scoring is ONE BLAS
    matmul per Arrow batch instead of an interpreted per-(row, bench)
    zip_with fold (the fold formulation measured minutes at the 100x
    probe: ~270M lambda evaluations per run).

    Contract: zero-norm vectors (corpus or benchmark) are OUT OF
    CONTRACT — cosine is undefined on them, the engine emits NaN/inf
    and the oracle NULL-propagates differently.  Encoder outputs are
    never zero; a pipeline with synthetic zeros must filter them
    upstream."""
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    is_bench = (F.col("vec_id") % BENCH_MOD == 0) & (
        F.col("vec_id") < SEM_DECON_BENCH_MAX
    )
    bench_rows = (
        emb.filter(is_bench)
        .select(
            "vec_id",
            F.expr(
                "transform(embedding, x -> round(CAST(x AS DOUBLE), 6))"
            ).alias("e"),
        )
        .collect()
    )
    import numpy as np

    bench_rows = sorted(bench_rows, key=lambda r: r.vec_id)
    if not bench_rows:
        # Empty benchmark slice: nothing to test against — every
        # corpus vector is kept with NULL nearest/cos.  The oracle's
        # corpus-LEFT-JOIN-ranked shape produces exactly this frame
        # (previously np.stack([]) crashed here, advice r7).
        return emb.filter(~is_bench).select(
            "vec_id",
            F.lit(None).cast("long").alias("nearest_bench_id"),
            F.lit(None).cast("double").alias("max_cos"),
            F.lit(False).alias("dropped"),
        )
    bench_ids = np.array([r.vec_id for r in bench_rows], dtype=np.int64)
    B = np.stack([np.array(r.e, dtype=np.float64) for r in bench_rows])
    bn = np.sqrt((B * B).sum(axis=1))

    def _score(batches):
        for pdf in batches:
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            en = np.sqrt((E * E).sum(axis=1))
            # dot / (|e| * |b|): same expression shape as the oracle;
            # BLAS blocked summation vs the oracle's sequential fold
            # can differ by ~1 ulp — flips the 6-dp round only within
            # ~1e-16 of a boundary (accepted trade, see q_semdedup)
            C = (E @ B.T) / np.outer(en, bn)
            # half away from zero at 6 dp (ROUND semantics in both
            # engines; np.round is banker's)
            C = np.sign(C) * np.floor(np.abs(C) * 1e6 + 0.5) / 1e6
            # bench columns are id-ascending, argmax takes the FIRST
            # max -> ties break to the lowest benchmark id, matching
            # the oracle's (cos DESC, bench_id ASC) row_number
            idx = np.argmax(C, axis=1)
            mx = C[np.arange(len(C)), idx]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "nearest_bench_id": bench_ids[idx],
                    "max_cos": mx,
                    "dropped": mx >= SEM_DECON_TAU,
                }
            )

    schema = (
        "vec_id long, nearest_bench_id long, max_cos double,"
        " dropped boolean"
    )
    return emb.filter(~is_bench).select("vec_id", "embedding").mapInPandas(
        _score, schema
    )


DECONTAMINATE_SEMANTIC_SQL = f"""
WITH bench AS (
  SELECT vec_id AS bench_id,
         list_transform(CAST(embedding AS DOUBLE[]), x -> round(x, 6)) AS b
  FROM embeddings
  WHERE vec_id % {BENCH_MOD} = 0 AND vec_id < {SEM_DECON_BENCH_MAX}
),
corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings
  WHERE NOT (vec_id % {BENCH_MOD} = 0 AND vec_id < {SEM_DECON_BENCH_MAX})
),
scored AS (
  SELECT c.vec_id, b.bench_id,
    ROUND(list_dot_product(c.e, b.b)
          / (sqrt(list_dot_product(c.e, c.e))
           * sqrt(list_dot_product(b.b, b.b))), 6) AS cos
  FROM corpus c CROSS JOIN bench b
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY cos DESC, bench_id ASC) AS rn
  FROM scored
)
-- corpus LEFT JOIN: with a non-empty benchmark every corpus vector
-- has exactly one rn=1 row (identical to the former inner form);
-- with an EMPTY benchmark this degrades to all-kept NULL verdicts,
-- mirroring the engine's empty-bench guard
SELECT c.vec_id, r.bench_id AS nearest_bench_id, r.cos AS max_cos,
       COALESCE(r.cos >= {SEM_DECON_TAU}, FALSE) AS dropped
FROM corpus c
LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r ON r.vec_id = c.vec_id
"""


# --------------------------------------- DSIR Gumbel-top-k selection
#
# The sampling step q_dsir_weights stops short of: DSIR (Xie et al.
# 2023 §2) selects the training subset by GUMBEL-TOP-K over the log
# importance weights — sampling-without-replacement proportional to
# the importance distribution, as one embarrassingly-parallel pass.
# The paper's Gumbel noise is RNG; here the uniform is the shared
# seeded 60-bit hash of doc_id, which makes the draw DETERMINISTIC
# (replayable by the oracle, stable across retries/stragglers — the
# property a production selection job wants anyway: re-running a
# failed partition must not change the selected set).
#
#   u  = (hash60(doc_id) % 1e9 + 0.5) / 1e9        in (0, 1)
#   g  = -ln(-ln(u))                                standard Gumbel
#   score = log_weight + g;  take the top DSIR_TOP_K
#
# Scale shape: the scored frame is (doc_id, log_weight, g) — narrow;
# top-k is sort+limit, which Spark plans as TakeOrderedAndProject
# (partition-local heaps, only k rows reach the driver-side merge).
# No exchange wider than q_dsir_weights' own aggregates.

DSIR_TOP_K = 50
DSIR_GUMBEL_SEED = 43


def q_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR-selected subset: (doc_id, log_weight, gumbel, score)
    for the top DSIR_TOP_K docs by perturbed log weight."""
    from .sketches import _hash60

    weights = q_dsir_weights(spark, sf_dir)
    u = (
        (_hash60(F.col("doc_id"), DSIR_GUMBEL_SEED) % 1_000_000_000)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(1_000_000_000.0)
    g = F.round(-F.log(-F.log(u)), 6)
    scored = weights.select(
        "doc_id",
        "log_weight",
        g.alias("gumbel"),
        F.round(F.col("log_weight") + g, 6).alias("score"),
    )
    return scored.orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    ).limit(DSIR_TOP_K)


DSIR_SAMPLE_SQL = f"""
WITH w AS ({DSIR_WEIGHTS_SQL.strip()}),
g AS (
  SELECT doc_id, log_weight,
         ROUND(-LN(-LN(
           (({_hash60_sql('doc_id', DSIR_GUMBEL_SEED)} % 1000000000)
            + 0.5) / 1000000000.0)), 6) AS gumbel
  FROM w
)
SELECT doc_id, log_weight, gumbel,
       ROUND(log_weight + gumbel, 6) AS score
FROM g
ORDER BY score DESC, doc_id ASC
LIMIT {DSIR_TOP_K}
"""


# --------------------------------- token-budget mixture (water-filling)
#
# Corpus assembly's final arithmetic (the LLaMA/GPT "data mixture"
# table): given per-source token availability n_d and a total token
# budget T, allocate T across sources with DESIRED share proportional
# to n_d^MIX_ALPHA (temperature-flattened so small sources are
# upweighted), subject to the availability cap alloc_d <= n_d.
# Flattening pushes small sources ABOVE their availability, so the
# classic water-filling redistribution applies: cap the over-asks,
# re-split the surplus across uncapped sources by the same weights,
# repeat.  Caps can bind in up to |sources| - 1 SUCCESSIVE rounds
# (each round must cap at least one new source or the allocation has
# converged), so MIX_ROUNDS = 20 makes the water-filling EXACT for
# any mix of <= 21 sources (testdata has 20); converged rounds are
# numeric no-ops (every value re-derives identically), and the chain
# stays finite window math over the |sources|-row frame.  Beyond 21
# sources the result is a documented bounded approximation — derive
# rounds from the source count if that ever matters.
#
# Scale shape: ONE aggregate over the corpus produces the
# |sources|-row availability frame; every redistribution round is
# window arithmetic over that tiny frame (broadcast-scale, no corpus
# re-scan).  The output is the recipe the sampling pass executes.

MIX_ALPHA = 0.5
MIX_BUDGET_FRAC = 0.6
MIX_ROUNDS = 20


def q_domain_mix_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token allocation under a global budget:
    (source, n_tokens, weight, alloc_tokens, capped).

    Bench note (recorded r8): the MIX_ROUNDS 3 -> 20 exactness fix
    deliberately moved this query 0.58 -> 2.88s local at sf0.1 — the
    extra rounds are window math over the |sources|-row frame (wall
    is per-round plan overhead, not data).  Expected; don't re-flag."""
    docs = load_table(spark, sf_dir, "documents")
    avail = docs.groupBy("source").agg(
        F.sum(F.size(F.expr(_TOKENIZE_SPARK))).alias("n_tokens")
    )
    # Determinism: w = sqrt(n) — IEEE sqrt is CORRECTLY ROUNDED in
    # both engines (libm pow is not guaranteed to the last ulp), and
    # every cross-row double sum below routes through ROUND(...,6) ->
    # DECIMAL(38,18) (exact, order-free) so Spark's window iteration
    # order vs DuckDB's cannot flip a 6-dp rounding.  n_tokens sums
    # are integers: exact as-is.
    assert MIX_ALPHA == 0.5, "w = sqrt(n) relies on alpha = 1/2"
    wall = Window.partitionBy(F.lit(1))

    def _dsum(col: Column) -> Column:
        return (
            F.sum(F.round(col, 6).cast("decimal(38,18)"))
            .over(wall)
            .cast("double")
        )

    cur = avail.select(
        "source",
        "n_tokens",
        F.round(F.sqrt(F.col("n_tokens").cast("double")), 6).alias("w"),
        F.floor(
            F.sum("n_tokens").over(wall) * F.lit(MIX_BUDGET_FRAC)
        ).alias("budget"),
        F.lit(False).alias("capped"),
        F.lit(0.0).alias("alloc"),
    )
    for _ in range(MIX_ROUNDS):
        # remaining budget splits across UNCAPPED sources by weight;
        # any source whose ask exceeds availability is capped at it
        open_w = F.when(~F.col("capped"), F.col("w")).otherwise(F.lit(0.0))
        spent = _dsum(
            F.when(F.col("capped"), F.col("alloc")).otherwise(F.lit(0.0))
        )
        ask = F.round(
            (F.col("budget") - spent) * open_w / _dsum(open_w),
            6,
        )
        cur = cur.select(
            "source",
            "n_tokens",
            "w",
            "budget",
            (F.col("capped") | (ask >= F.col("n_tokens"))).alias("capped"),
            F.when(F.col("capped"), F.col("alloc"))
            .when(ask >= F.col("n_tokens"), F.col("n_tokens").cast("double"))
            .otherwise(ask)
            .alias("alloc"),
        )
    return cur.select(
        "source",
        "n_tokens",
        F.round(F.col("w"), 6).alias("weight"),
        F.round(F.col("alloc"), 6).alias("alloc_tokens"),
        "capped",
    )


def _domain_mix_budget_sql() -> str:
    ctes = [
        f"""avail AS (
  SELECT source, SUM(LEN({_TOKENIZE})) AS n_tokens
  FROM documents GROUP BY source
)""",
        f"""c0 AS (
  SELECT source, n_tokens,
         ROUND(SQRT(CAST(n_tokens AS DOUBLE)), 6) AS w,
         -- CAST both factors: DuckDB parses {MIX_BUDGET_FRAC} as
         -- DECIMAL and would do exact decimal arithmetic, which can
         -- land on the other side of a FLOOR boundary than the
         -- engine's IEEE double multiply (advice r7)
         FLOOR(CAST(SUM(n_tokens) OVER () AS DOUBLE)
               * CAST({MIX_BUDGET_FRAC} AS DOUBLE)) AS budget,
         FALSE AS capped, 0.0 AS alloc
  FROM avail
)""",
    ]
    for t in range(1, MIX_ROUNDS + 1):
        prev = f"c{t - 1}"
        ctes.append(f"""{f'c{t}'} AS (
  SELECT source, n_tokens, w, budget,
         (capped OR ask >= n_tokens) AS capped,
         CASE WHEN capped THEN alloc
              WHEN ask >= n_tokens THEN CAST(n_tokens AS DOUBLE)
              ELSE ask END AS alloc
  FROM (
    SELECT *,
      ROUND((budget
             - CAST(SUM(CAST(ROUND(
                 CASE WHEN capped THEN alloc ELSE 0.0 END, 6)
                 AS DECIMAL(38,18))) OVER () AS DOUBLE))
            * (CASE WHEN capped THEN 0.0 ELSE w END)
            / CAST(SUM(CAST(ROUND(
                CASE WHEN capped THEN 0.0 ELSE w END, 6)
                AS DECIMAL(38,18))) OVER () AS DOUBLE), 6)
        AS ask
    FROM {prev}
  )
)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,"
        f"\n       ROUND(w, 6) AS weight,"
        f"\n       ROUND(alloc, 6) AS alloc_tokens, capped"
        f"\nFROM c{MIX_ROUNDS}"
    )


DOMAIN_MIX_BUDGET_SQL = _domain_mix_budget_sql()
