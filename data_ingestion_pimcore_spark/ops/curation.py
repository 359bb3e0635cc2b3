"""Training-data curation operators: decontamination, repetition-based
quality filtering, and PII scrubbing — the corpus-hygiene passes every
LLM data pipeline runs between raw ingestion and training, alongside
dedup (ops/dedup.py) and quality scoring (ops/textops.py).

Scale notes (100 TB design intent):

* Decontamination is a semi-join through an inverted shingle index:
  the eval side collapses to DISTINCT shingle hashes (tiny — benchmark
  suites are MBs, corpora are TBs), so the join broadcasts and the
  corpus-side cost is one shingle pass + one map-side join. Never a
  cross join, never a per-pair comparison.
* The repetition filter is explode → two-level aggregate, all map-side
  partial aggregation; output is O(docs), intermediate is O(bigrams) —
  the same shape as the token-count pass it would share a scan with.
* PII scrubbing is a pure per-row projection (regexp_replace inside
  whole-stage codegen) — zero shuffle, scales embarrassingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load, spread
from .dedup import _SQL_JACCARD_EDGES, _SQL_SHINGLES
from .textops import _SQL_STOPLIST, md5_hash60, sql_md5_hash60, with_shingles

# ~1% of docs play the held-out benchmark set in the demo split.
_EVAL_MOD = 97


@register(
    "text_decontaminate",
    oracle=f"""
WITH sh AS (
  SELECT doc_id,
         unnest(list_transform({_SQL_SHINGLES},
                               s -> {sql_md5_hash60('s')})) AS s
  FROM documents
), eval_sh AS (
  SELECT DISTINCT s FROM sh WHERE doc_id % {_EVAL_MOD} = 0
), train_sh AS (
  SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % {_EVAL_MOD} != 0
)
SELECT t.doc_id, COUNT(*) AS n_shared_shingles
FROM train_sh t JOIN eval_sh e ON t.s = e.s
GROUP BY t.doc_id
""",
    doc="Benchmark decontamination: training documents sharing any "
    "word-3-gram with the held-out eval split (doc_id % 97 == 0 here; "
    "a real benchmark table in production) are flagged with their "
    "overlap count — the standard n-gram-overlap test-set-leakage "
    "check. The eval side reduces to DISTINCT shingle hashes before "
    "the join, so at 100 TB it broadcasts and the corpus side never "
    "shuffles for the probe; contaminated ids then drive an anti-join "
    "to emit the clean corpus. Shares the one-pass shingle machinery "
    "with dedup_ngram_jaccard (ops/textops.py::with_shingles).",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_shingles(load(spark, sf_dir, "documents"))
    sh = d.select(
        "doc_id",
        F.explode(F.transform("shingles", lambda s: md5_hash60(s))).alias("s"),
    )
    eval_sh = (
        sh.where(F.col("doc_id") % _EVAL_MOD == 0).select("s").distinct()
    )
    train_sh = (
        sh.where(F.col("doc_id") % _EVAL_MOD != 0)
        .select("doc_id", "s")
        .distinct()
    )
    return (
        train_sh.join(F.broadcast(eval_sh), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


@register(
    "text_repetition_filter",
    oracle="""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE doc_id % 10 = 0
), bigrams AS (
  SELECT doc_id, LEN(w) - 1 AS n_bigrams,
         unnest(list_transform(range(1, LEN(w)),
                               i -> w[i] || ' ' || w[i+1])) AS bg
  FROM words WHERE LEN(w) >= 2
), freq AS (
  SELECT doc_id, ANY_VALUE(n_bigrams) AS n_bigrams, bg,
         COUNT(*) AS cnt
  FROM bigrams GROUP BY doc_id, bg
)
SELECT doc_id, n_bigrams,
       MAX(cnt) AS top_bigram_count,
       CAST(MAX(cnt) AS DOUBLE) / n_bigrams AS top_bigram_ratio
FROM freq
GROUP BY doc_id, n_bigrams
""",
    doc="Gopher-style repetition quality signal: the fraction of a "
    "document's word-bigrams occupied by its single most frequent "
    "bigram (high ratio = boilerplate/spam; training pipelines drop "
    "above a threshold). Explode → (doc, bigram) count → per-doc max: "
    "both aggregates do map-side partial combine, intermediate volume "
    "is O(bigrams) within the scan stage's partitions, output is "
    "O(docs). The ratio divides two exact integers in double — engine-"
    "deterministic with no decimal trick.",
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 10 == 0)
        .select("doc_id", F.split("text", " ").alias("w"))
        .where(F.size("w") >= 2)
    )
    w = F.col("w")
    bigrams = d.select(
        "doc_id",
        (F.size("w") - 1).alias("n_bigrams"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(w) - 2),
                lambda i: F.concat_ws(" ", F.get(w, i), F.get(w, i + 1)),
            )
        ).alias("bg"),
    )
    freq = bigrams.groupBy("doc_id", "n_bigrams", "bg").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return freq.groupBy("doc_id", "n_bigrams").agg(
        F.max("cnt").alias("top_bigram_count"),
        (F.max("cnt").cast("double") / F.col("n_bigrams")).alias(
            "top_bigram_ratio"
        ),
    )


@register(
    "text_pii_scrub",
    oracle="""
WITH seeded AS (
  SELECT doc_id,
         string_split(text, ' ')[1] || ' contact user' || doc_id ||
         '@example.com or call ' || (doc_id * 1234567 + 1000000) AS raw
  FROM documents WHERE doc_id % 25 = 0
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(raw, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
         '[0-9]{7,}', '<NUM>', 'g') AS scrubbed,
       CAST(LEN(regexp_extract_all(raw, '[a-z0-9.]+@[a-z0-9.]+'))
         AS INT) AS n_emails,
       CAST(LEN(regexp_extract_all(
         regexp_replace(raw, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
         '[0-9]{7,}')) AS INT) AS n_longnums
FROM seeded
""",
    doc="PII scrubbing: email addresses and long digit runs replaced "
    "with typed placeholders, plus per-doc redaction counts for audit. "
    "PII is seeded deterministically into the corpus (the driver "
    "tables contain none) so the scrub provably fires; patterns stay "
    "in the RE2∩Java-regex common subset so Spark and DuckDB agree. "
    "Pure regexp_replace projection inside whole-stage codegen — zero "
    "shuffle at any scale; a production pass adds more patterns, not "
    "a different plan shape.",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") % 25 == 0)
    raw = F.concat(
        F.get(F.split("text", " "), 0),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call "),
        (F.col("doc_id") * 1234567 + 1000000).cast("string"),
    )
    seeded = d.select("doc_id", raw.alias("raw"))
    email = r"[a-z0-9.]+@[a-z0-9.]+"
    num = r"[0-9]{7,}"
    no_email = F.regexp_replace("raw", email, "<EMAIL>")
    return seeded.select(
        "doc_id",
        F.regexp_replace(no_email, num, "<NUM>").alias("scrubbed"),
        F.regexp_count("raw", F.lit(email)).alias("n_emails"),
        F.regexp_count(no_email, F.lit(num)).alias("n_longnums"),
    )


# Composite-funnel thresholds (C4/Gopher-style demo values).
_LANG_TAU = 0.05
_QUALITY_TAU = 0.5
_REP_TAU = 0.2


@register(
    "curation_pipeline",
    oracle=f"""
WITH base AS (
  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
), flags AS (
  SELECT doc_id, text,
         doc_id % {_EVAL_MOD} = 0 AS is_eval,
         CAST(LEN(list_filter(w, t -> t IN ({_SQL_STOPLIST}))) AS DOUBLE)
           / LEN(w) >= {_LANG_TAU} AS pass_lang,
         0.5 * LEAST(CAST(LEN(w) AS DOUBLE) / 100.0, 1.0)
           + 0.5 * (CAST(LEN(list_distinct(w)) AS DOUBLE) / LEN(w))
           >= {_QUALITY_TAU} AS pass_quality,
         LEN(w) < 2 OR
         CAST(list_max(list_transform(
                list_distinct(list_transform(range(1, LEN(w)),
                                             i -> w[i] || ' ' || w[i+1])),
                x -> LEN(list_filter(list_transform(range(1, LEN(w)),
                                                    i -> w[i] || ' ' || w[i+1]),
                                     y -> y = x)))) AS DOUBLE)
           / (LEN(w) - 1) <= {_REP_TAU} AS pass_repetition
  FROM base
), canon AS (
  SELECT doc_id, doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
  FROM base
), sh AS (
  SELECT doc_id,
         unnest(list_transform({_SQL_SHINGLES},
                               s -> {sql_md5_hash60('s')})) AS s
  FROM documents
), contaminated AS (
  SELECT DISTINCT t.doc_id
  FROM (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % {_EVAL_MOD} != 0) t
  JOIN (SELECT DISTINCT s FROM sh WHERE doc_id % {_EVAL_MOD} = 0) e ON t.s = e.s
)
SELECT f.doc_id, f.is_eval, f.pass_lang, f.pass_quality, f.pass_repetition,
       c.is_canonical,
       f.doc_id IN (SELECT doc_id FROM contaminated) AS is_contaminated,
       NOT f.is_eval AND f.pass_lang AND f.pass_quality AND f.pass_repetition
         AND c.is_canonical
         AND f.doc_id NOT IN (SELECT doc_id FROM contaminated) AS keep
FROM flags f JOIN canon c ON f.doc_id = c.doc_id
""",
    doc="The full pretraining-data curation funnel as ONE declarative "
    "plan over one corpus scan: language-ID gate (stopword density), "
    "composite quality score, Gopher-style repetition gate (all three "
    "pure map-side array expressions inside whole-stage codegen), "
    "exact-dup canonicalization (min doc_id per content hash — one "
    "window over a hash shuffle), and benchmark decontamination (n-gram "
    "overlap with the held-out split via a broadcast probe of DISTINCT "
    "eval shingle hashes). Per-document boolean audit columns plus the "
    "final keep verdict, so attrition per stage is one GROUP BY away. "
    "At 100 TB: three slim shuffles total (content-hash window, corpus "
    "shingle distinct, contaminated-id semi-join); every gate before "
    "them prunes map-side, and the eval side of decontamination stays "
    "broadcast-sized by construction.",
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textops import STOPWORDS, _words
    from pyspark.sql.window import Window

    # spread(): the per-doc gates below are CPU-bound array expressions
    # (the repetition gate is O(L²) per doc) — they must run at core
    # parallelism, not at the small scan's split count.
    d = spread(load(spark, sf_dir, "documents"))
    w = _words(F.col("text"))
    n_tokens = F.size(w)
    lang_ratio = (
        F.size(F.filter(w, lambda t: t.isin(*STOPWORDS))).cast("double") / n_tokens
    )
    quality = 0.5 * F.least(n_tokens.cast("double") / 100.0, F.lit(1.0)) + 0.5 * (
        F.size(F.array_distinct(w)).cast("double") / n_tokens
    )
    bg = F.transform(
        F.sequence(F.lit(0), n_tokens - 2),
        lambda i: F.concat_ws(" ", F.get(w, i), F.get(w, i + 1)),
    )
    top_bg = F.array_max(
        F.transform(
            F.array_distinct(bg),
            lambda x: F.size(F.filter(bg, lambda y: y == x)),
        )
    )
    rep_ratio = top_bg.cast("double") / (n_tokens - 1)
    flags = d.select(
        "doc_id",
        "text",
        (F.col("doc_id") % _EVAL_MOD == 0).alias("is_eval"),
        (lang_ratio >= _LANG_TAU).alias("pass_lang"),
        (quality >= _QUALITY_TAU).alias("pass_quality"),
        ((n_tokens < 2) | (rep_ratio <= _REP_TAU)).alias("pass_repetition"),
    )
    canon = flags.withColumn(
        "is_canonical",
        F.col("doc_id")
        == F.min("doc_id").over(Window.partitionBy(F.md5(F.col("text")))),
    )
    sh = with_shingles(d).select(
        "doc_id",
        F.explode(F.transform("shingles", lambda s: md5_hash60(s))).alias("s"),
    )
    eval_sh = sh.where(F.col("doc_id") % _EVAL_MOD == 0).select("s").distinct()
    contaminated = (
        sh.where(F.col("doc_id") % _EVAL_MOD != 0)
        .select("doc_id", "s")
        .distinct()
        .join(F.broadcast(eval_sh), "s")
        .select("doc_id")
        .distinct()
        .withColumn("is_contaminated", F.lit(True))
    )
    out = canon.join(contaminated, "doc_id", "left").select(
        "doc_id",
        "is_eval",
        "pass_lang",
        "pass_quality",
        "pass_repetition",
        "is_canonical",
        F.coalesce("is_contaminated", F.lit(False)).alias("is_contaminated"),
        (
            ~F.col("is_eval")
            & F.col("pass_lang")
            & F.col("pass_quality")
            & F.col("pass_repetition")
            & F.col("is_canonical")
            & ~F.coalesce("is_contaminated", F.lit(False))
        ).alias("keep"),
    )
    return out


@register(
    "curation_keep_best_per_group",
    oracle=f"""
WITH RECURSIVE {_SQL_JACCARD_EDGES},
reach(src, node) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.dst FROM reach r JOIN jedges e ON e.src = r.node
),
comp AS (
  SELECT src AS doc_id, MIN(node) AS component_id FROM reach GROUP BY src
),
ranked AS (
  SELECT c.component_id, d.doc_id, d.n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY c.component_id
           ORDER BY d.n_chars DESC, d.doc_id ASC
         ) AS rnk,
         COUNT(*) OVER (PARTITION BY c.component_id) AS n_members
  FROM comp c JOIN documents d USING (doc_id)
)
SELECT component_id, doc_id AS keep_doc_id,
       CAST(n_chars AS BIGINT) AS keep_n_chars,
       CAST(n_members AS BIGINT) AS n_members
FROM ranked WHERE rnk = 1
""",
    doc="Dedup-to-curation integration: connected components over the "
    "n-gram-Jaccard near-dup graph, then keep the LONGEST member per "
    "component (ties to the lowest doc_id) — the keep-best rule "
    "production dedup applies instead of blind keep-minimum. One "
    "window over the (tiny) component table after the O(log n) "
    "large-star/small-star CC; integer-only comparison keys so both "
    "engines rank identically.",
)
def curation_keep_best_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from .dedup import connected_components_star, dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    docs = load(spark, sf_dir, "documents")
    comp = connected_components_star(docs.select("doc_id"), pairs)
    w = Window.partitionBy("component_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    wc = Window.partitionBy("component_id")
    return (
        comp.join(docs.select("doc_id", "n_chars"), "doc_id")
        .withColumn("rnk", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(wc))
        .where(F.col("rnk") == 1)
        .select(
            "component_id",
            F.col("doc_id").alias("keep_doc_id"),
            F.col("n_chars").cast("long").alias("keep_n_chars"),
            F.col("n_members").cast("long").alias("n_members"),
        )
    )


@register(
    "curation_funnel_report",
    oracle=f"""
WITH base AS (
  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
), flags AS (
  SELECT doc_id, text,
         doc_id % {_EVAL_MOD} = 0 AS is_eval,
         CAST(LEN(list_filter(w, t -> t IN ({_SQL_STOPLIST}))) AS DOUBLE)
           / LEN(w) >= {_LANG_TAU} AS pass_lang,
         0.5 * LEAST(CAST(LEN(w) AS DOUBLE) / 100.0, 1.0)
           + 0.5 * (CAST(LEN(list_distinct(w)) AS DOUBLE) / LEN(w))
           >= {_QUALITY_TAU} AS pass_quality,
         LEN(w) < 2 OR
         CAST(list_max(list_transform(
                list_distinct(list_transform(range(1, LEN(w)),
                                             i -> w[i] || ' ' || w[i+1])),
                x -> LEN(list_filter(list_transform(range(1, LEN(w)),
                                                    i -> w[i] || ' ' || w[i+1]),
                                     y -> y = x)))) AS DOUBLE)
           / (LEN(w) - 1) <= {_REP_TAU} AS pass_repetition
  FROM base
), canon AS (
  SELECT doc_id, doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
  FROM base
), sh AS (
  SELECT doc_id,
         unnest(list_transform({_SQL_SHINGLES},
                               s -> {sql_md5_hash60('s')})) AS s
  FROM documents
), contaminated AS (
  SELECT DISTINCT t.doc_id
  FROM (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % {_EVAL_MOD} != 0) t
  JOIN (SELECT DISTINCT s FROM sh WHERE doc_id % {_EVAL_MOD} = 0) e ON t.s = e.s
), audited AS (
  SELECT f.doc_id, f.is_eval, f.pass_lang, f.pass_quality, f.pass_repetition,
         c.is_canonical,
         f.doc_id IN (SELECT doc_id FROM contaminated) AS is_contaminated,
         NOT f.is_eval AND f.pass_lang AND f.pass_quality AND f.pass_repetition
           AND c.is_canonical
           AND f.doc_id NOT IN (SELECT doc_id FROM contaminated) AS keep
  FROM flags f JOIN canon c ON f.doc_id = c.doc_id
)
SELECT COUNT(*) AS n_docs,
       CAST(COUNT(CASE WHEN is_eval THEN 1 END) AS BIGINT) AS n_eval_held_out,
       CAST(COUNT(CASE WHEN NOT pass_lang THEN 1 END) AS BIGINT) AS drop_lang,
       CAST(COUNT(CASE WHEN NOT pass_quality THEN 1 END) AS BIGINT) AS drop_quality,
       CAST(COUNT(CASE WHEN NOT pass_repetition THEN 1 END) AS BIGINT) AS drop_repetition,
       CAST(COUNT(CASE WHEN NOT is_canonical THEN 1 END) AS BIGINT) AS drop_dup,
       CAST(COUNT(CASE WHEN is_contaminated THEN 1 END) AS BIGINT) AS drop_contaminated,
       CAST(COUNT(CASE WHEN keep THEN 1 END) AS BIGINT) AS n_kept
FROM audited
""",
    doc="The curation funnel REPORT: per-stage drop accounting and the "
    "final kept count — exactly the table a data-quality review reads. "
    "One aggregate over curation_pipeline's per-doc audit columns (the "
    "flags are non-exclusive, so the per-stage numbers are independent "
    "failure counts, not a partition); re-registers the funnel output "
    "as the deliverable instead of leaving report-building to the "
    "consumer. Same three-slim-shuffle plan plus one global aggregate.",
)
def curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_doc = curation_pipeline(spark, sf_dir)
    c = F.count
    return per_doc.agg(
        c(F.lit(1)).alias("n_docs"),
        c(F.when(F.col("is_eval"), 1)).alias("n_eval_held_out"),
        c(F.when(~F.col("pass_lang"), 1)).alias("drop_lang"),
        c(F.when(~F.col("pass_quality"), 1)).alias("drop_quality"),
        c(F.when(~F.col("pass_repetition"), 1)).alias("drop_repetition"),
        c(F.when(~F.col("is_canonical"), 1)).alias("drop_dup"),
        c(F.when(F.col("is_contaminated"), 1)).alias("drop_contaminated"),
        c(F.when(F.col("keep"), 1)).alias("n_kept"),
    )


_MIX_TOKEN_BUDGET = 1_000_000


@register(
    "curation_token_budget_mix",
    oracle=f"""
WITH per_src AS (
    SELECT source,
           CAST(SUBSTR(source, 4) AS INTEGER) AS src_num,
           COUNT(*) AS n_docs,
           CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents
    GROUP BY source
),
weighted AS (
    SELECT *, 1 + src_num % 5 AS wnum FROM per_src
),
tot AS (SELECT SUM(wnum) AS tot_w FROM weighted)
SELECT source,
       n_docs,
       n_tokens,
       CAST(FLOOR({_MIX_TOKEN_BUDGET} * wnum / tot_w) AS BIGINT) AS alloc_tokens,
       ROUND(LEAST(
           1.0,
           CAST(FLOOR({_MIX_TOKEN_BUDGET} * wnum / tot_w) AS DOUBLE) / n_tokens
       ), 9) AS sampling_fraction,
       LEAST(CAST(FLOOR({_MIX_TOKEN_BUDGET} * wnum / tot_w) AS BIGINT),
             n_tokens) AS expected_tokens,
       CAST(FLOOR({_MIX_TOKEN_BUDGET} * wnum / tot_w) AS BIGINT) > n_tokens
           AS under_supplied
FROM weighted CROSS JOIN tot
""",
    doc="Training-mixture planning (the Pile/DoReMi data-mixing step): "
    "given per-source mixture weights and a global token budget, "
    "compute each source's token allocation, the sampling fraction "
    "that realizes it, and whether the source is under-supplied "
    "(allocation exceeds available tokens → needs oversampling or "
    "weight renormalization). Token counts are one hash aggregate "
    "over the corpus; everything downstream operates on O(sources) "
    "rows with the weight total broadcast back. Allocation arithmetic "
    "is integer-exact (weights are integer ratios, floor of one IEEE "
    "division), so the plan is bit-identical to the oracle.",
)
def curation_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
    )
    # unbounded substring, structurally identical to the oracle's
    # SUBSTR(source, 4) — a fixed-length extraction would silently
    # truncate if a source suffix ever exceeded it
    weighted = per_src.withColumn(
        "wnum", 1 + F.expr("substring(source, 4)").cast("int") % 5
    )
    tot = weighted.agg(F.sum("wnum").alias("tot_w"))
    alloc = F.floor(
        F.lit(_MIX_TOKEN_BUDGET) * F.col("wnum") / F.col("tot_w")
    ).cast("bigint")
    return weighted.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        alloc.alias("alloc_tokens"),
        F.round(
            F.least(F.lit(1.0), alloc.cast("double") / F.col("n_tokens")), 9
        ).alias("sampling_fraction"),
        F.least(alloc, F.col("n_tokens")).alias("expected_tokens"),
        (alloc > F.col("n_tokens")).alias("under_supplied"),
    )


@register(
    "curation_dataset_card",
    oracle="""
WITH base AS (
  SELECT source, lang, text,
         md5(text) AS th,
         LEN(string_split(text, ' ')) AS n_tokens,
         LEN(list_distinct(string_split(text, ' '))) AS n_distinct
  FROM documents
),
dups AS (
  SELECT source, SUM(cnt - 1) AS n_dup_rows
  FROM (SELECT source, th, COUNT(*) AS cnt FROM base GROUP BY source, th)
  GROUP BY source
)
SELECT b.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(b.n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN b.lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS pct_en,
       CAST(MAX(d.n_dup_rows) AS DOUBLE) / COUNT(*) AS exact_dup_ratio,
       CAST(SUM(CAST(
           0.5 * LEAST(CAST(b.n_tokens AS DOUBLE) / 100.0, 1.0)
           + 0.5 * (CAST(b.n_distinct AS DOUBLE) / b.n_tokens)
         AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS avg_quality
FROM base b JOIN dups d ON d.source = b.source
GROUP BY b.source
""",
    doc="Dataset card per corpus source — the one-row-per-source "
    "summary LLM data teams publish beside a training mix: document "
    "and token counts, declared-language share, EXACT within-source "
    "duplicate ratio (md5 content hash, the dedup_exact key), and "
    "mean composite quality (the text_quality_score formula). One "
    "scan feeds a per-(source, hash) aggregate and the per-source "
    "rollup; per-doc quality scores are row-local doubles summed via "
    "the exact-decimal trick, every ratio one double division.",
)
def curation_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textops import _words

    d = load(spark, sf_dir, "documents")
    w = _words(F.col("text"))
    base = d.select(
        "source",
        "lang",
        F.md5("text").alias("th"),
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
    )
    base = base.localCheckpoint(eager=False)  # feeds dups AND the rollup
    dups = (
        base.groupBy("source", "th")
        .agg(F.count("*").alias("cnt"))
        .groupBy("source")
        .agg(F.sum(F.col("cnt") - 1).alias("n_dup_rows"))
    )
    quality = 0.5 * F.least(
        F.col("n_tokens").cast("double") / 100.0, F.lit(1.0)
    ) + 0.5 * (F.col("n_distinct").cast("double") / F.col("n_tokens"))
    return (
        base.join(F.broadcast(dups), "source")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            (
                F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast(
                    "double"
                )
                / F.count("*")
            ).alias("pct_en"),
            (F.max("n_dup_rows").cast("double") / F.count("*")).alias(
                "exact_dup_ratio"
            ),
            (
                F.sum(quality.cast("decimal(18,9)")).cast("double")
                / F.count("*")
            ).alias("avg_quality"),
        )
    )
