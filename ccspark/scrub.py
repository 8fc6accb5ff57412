"""Corpus scrubbing for training-data pipelines: PII detection/redaction,
benchmark decontamination (n-gram overlap removal), and bigram-LM
perplexity quality scoring (the CCNet shape).

All three are pure JVM-expression plans with exact DuckDB twins; the
regexes are restricted to the syntax subset Java regex and RE2 share, and
the LM log-probabilities use the integer micro-unit scheme shared with
lang_id_nb / quality_model (textops.py) so per-doc scores are BIGINT sums.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .analytics import t

# ---------------------------------------------------------------------------
# PII detection + redaction
#
# The synthetic fixtures carry no PII, so the query first injects
# DETERMINISTIC synthetic PII derived from the row (an email and a phone
# number built from doc_id) — the redaction effect is then observable and
# value-checked instead of vacuously passing on a no-op. The patterns use
# only syntax Java regex (Spark) and RE2 (DuckDB) agree on: character
# classes, +, bounded repeats, \d; no backrefs, no lookaround.
#
# Scale story (100 TB): regexp_extract_all / regexp_replace are JVM
# expressions inside whole-stage codegen — embarrassingly parallel, no
# shuffle at all; the output is a narrow projection of the scan.
# ---------------------------------------------------------------------------

PII_EMAIL = "[a-z0-9.]+@[a-z0-9.-]+[.][a-z][a-z]+"
PII_PHONE = "[0-9]{3}-[0-9]{4}"


def _pii_aug():
    # deterministic synthetic PII: user<doc_id>@mail.example.com, 555-XXXX
    return F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))


def q_pii_redact(spark, sf_dir):
    d = t(spark, sf_dir, "documents").withColumn("text2", _pii_aug())
    emails = F.regexp_extract_all("text2", F.lit(PII_EMAIL), 0)
    phones = F.regexp_extract_all("text2", F.lit(PII_PHONE), 0)
    red = F.regexp_replace(
        F.regexp_replace("text2", PII_EMAIL, "<EMAIL>"),
        PII_PHONE, "<PHONE>")
    return d.select(
        "doc_id",
        F.size(emails).cast("bigint").alias("n_emails"),
        F.size(phones).cast("bigint").alias("n_phones"),
        F.md5(red).alias("redacted_md5"),
        F.length(red).cast("bigint").alias("redacted_len"))


SQL_PII_REDACT = f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com or call 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text2
  FROM documents),
red AS (
  SELECT doc_id, text2,
         regexp_replace(regexp_replace(text2, '{PII_EMAIL}', '<EMAIL>', 'g'),
                        '{PII_PHONE}', '<PHONE>', 'g') AS redacted
  FROM aug)
SELECT doc_id,
       CAST(len(regexp_extract_all(text2, '{PII_EMAIL}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(text2, '{PII_PHONE}')) AS BIGINT)
         AS n_phones,
       md5(redacted) AS redacted_md5,
       CAST(length(redacted) AS BIGINT) AS redacted_len
FROM red"""


# ---------------------------------------------------------------------------
# benchmark decontamination — n-gram overlap removal
#
# The pipeline stage that drops training documents sharing any n-gram
# with an evaluation benchmark (the industry-standard 13-gram rule; here
# n=4 because the fixture vocabulary is ~31 words, so 4-grams give a
# non-degenerate contaminated/clean mix at every sf — the PLAN is
# n-independent). "Benchmark" = docs with doc_id % 11 == 0; the rest is
# the training corpus being screened.
#
# Scale story (100 TB): benchmark n-gram sets are benchmark-sized (maybe
# millions of rows for every public eval suite combined) — broadcast the
# distinct-gram set (or its bloom filter, ccspark.seen has the machinery)
# and the screen is a map-side semi-join: zero shuffle on the 100 TB side
# except the per-doc hit count reduce keyed by doc_id.
# ---------------------------------------------------------------------------

DECON_N = 4
DECON_MOD = 11


def _grams(n: int):
    idx = ", ".join(f"toks[i+{j}]" for j in range(n))
    return F.expr(
        f"transform(sequence(0, size(toks) - {n}),"
        f" i -> concat_ws(' ', {idx}))")


def q_decontaminate(spark, sf_dir):
    d = (t(spark, sf_dir, "documents")
         .withColumn("toks",
                     F.expr("filter(split(text, ' '), x -> x <> '')"))
         .filter(F.size("toks") >= DECON_N))
    grams = d.select("doc_id", F.explode(_grams(DECON_N)).alias("gram"))
    bench = (grams.filter(F.col("doc_id") % DECON_MOD == 0)
             .select("gram").distinct())
    train = grams.filter(F.col("doc_id") % DECON_MOD != 0).distinct()
    hits = (train.join(F.broadcast(bench), "gram", "left_semi")
            .groupBy("doc_id").agg(F.count("*").alias("n_hits")))
    return (d.filter(F.col("doc_id") % DECON_MOD != 0)
            .select("doc_id")
            .join(hits, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_hits", F.lit(0)).cast("bigint")
                     .alias("n_hits"),
                    (F.coalesce("n_hits", F.lit(0)) > 0)
                     .alias("contaminated")))


SQL_DECONTAMINATE = f"""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
grams AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, len(toks) - {DECON_N - 1}),
           i -> {" || ' ' || ".join(f"toks[i+{j}]" for j in range(DECON_N))}
         )) AS gram
  FROM tok WHERE len(toks) >= {DECON_N}),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % {DECON_MOD} = 0),
train AS (SELECT DISTINCT doc_id, gram FROM grams
          WHERE doc_id % {DECON_MOD} != 0),
hits AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM train WHERE gram IN (SELECT gram FROM bench)
  GROUP BY doc_id)
SELECT t.doc_id, coalesce(h.n_hits, 0) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM (SELECT DISTINCT doc_id FROM tok
      WHERE len(toks) >= {DECON_N} AND doc_id % {DECON_MOD} != 0) t
LEFT JOIN hits h USING (doc_id)"""


# ---------------------------------------------------------------------------
# bigram-LM perplexity scoring — the CCNet quality signal
#
# A Laplace-smoothed bigram language model is TRAINED distributively
# (pure aggregations over the doc_id % 5 != 0 split) and every document
# is scored with its per-token negative log-likelihood — CCNet's
# KenLM-perplexity bucket signal, re-expressed as the same
# train-by-aggregation / serve-by-model-join shape as lang_id_nb. A real
# deployment swaps the learned bigram table for KenLM counts in the SAME
# plan.
#
# Determinism recipe (shared with lang_id_nb, textops.py:278): model
# statistics are exact BIGINT counts; each log-prob
# ln((c(w1,w2)+1)/(c(w1)+V)) is computed from the same integer ratio on
# both engines, rounded to 6 dp, scaled to micro-units — per-doc NLL is
# a BIGINT sum, and the per-token score is integer division. Unseen
# (w1, w2) falls back to the per-w1 default ln(1/(c(w1)+V)); unseen w1
# to ln(1/V).
#
# Scale story (100 TB): the model is |distinct train bigrams| rows —
# a hash join keyed on (w1, w2) (broadcast when the corpus vocabulary is
# capped, shuffle-hash otherwise); scoring is explode→count→join→reduce
# keyed by doc_id. No driver-side state; the model never leaves the
# cluster.
# ---------------------------------------------------------------------------

LM_TRAIN_MOD = 5


def _lpu(expr):
    return F.round(F.round(F.log(expr), 6) * 1e6, 0).cast("bigint")


_DUCK_LPU = "CAST(round(round(ln({expr}), 6) * 1e6, 0) AS BIGINT)"


def q_lm_perplexity(spark, sf_dir):
    d = (t(spark, sf_dir, "documents")
         .withColumn("toks",
                     F.expr("filter(split(text, ' '), x -> x <> '')"))
         .filter(F.size("toks") >= 2))
    bi = d.select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(0, size(toks) - 2),"
            " i -> struct(toks[i] as w1, toks[i+1] as w2))")).alias("g")
    ).select("doc_id", "g.w1", "g.w2")
    train = bi.filter(F.col("doc_id") % LM_TRAIN_MOD != 0)

    # model: exact integer counts
    c12 = train.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (train.select(F.col("w1").alias("w"))
             .union(train.select(F.col("w2").alias("w")))
             .distinct().agg(F.count("*").cast("double").alias("v")))

    w1dim = (c1.crossJoin(F.broadcast(vocab))
             .select("w1", "c1", "v",
                     _lpu(F.lit(1.0) / (F.col("c1") + F.col("v")))
                     .alias("w1_default_u")))
    model = (c12.join(w1dim.select("w1", "c1", "v"), "w1")
             .select("w1", "w2",
                     _lpu((F.col("c12") + 1) / (F.col("c1") + F.col("v")))
                     .alias("lp_u")))
    oov_u = vocab.select(_lpu(F.lit(1.0) / F.col("v")).alias("oov_u"))

    tc = bi.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("cnt"))
    scored = (tc.join(F.broadcast(model), ["w1", "w2"], "left")
              .join(F.broadcast(w1dim.select("w1", "w1_default_u")),
                    "w1", "left")
              .crossJoin(F.broadcast(oov_u))
              .withColumn("term_u",
                          -F.coalesce("lp_u", "w1_default_u", "oov_u")
                          * F.col("cnt"))
              .groupBy("doc_id")
              .agg(F.sum("term_u").alias("nll_u"),
                   F.sum("cnt").alias("n_bigrams")))
    return scored.select(
        "doc_id", F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        F.col("nll_u").cast("bigint").alias("nll_u"),
        F.expr("nll_u div n_bigrams").cast("bigint").alias("nll_u_per_tok"),
        (F.col("doc_id") % LM_TRAIN_MOD == 0).alias("held_out"))


SQL_LM_PERPLEXITY = f"""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
bi AS (
  SELECT doc_id, g.w1 AS w1, g.w2 AS w2
  FROM (SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, len(toks) - 1),
                 i -> {{'w1': toks[i], 'w2': toks[i+1]}})) AS g
        FROM tok WHERE len(toks) >= 2)),
train AS (SELECT * FROM bi WHERE doc_id % {LM_TRAIN_MOD} != 0),
c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        FROM train GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
vocab AS (
  SELECT CAST(count(*) AS DOUBLE) AS v FROM (
    SELECT w1 AS w FROM train UNION SELECT w2 AS w FROM train)),
w1dim AS (
  SELECT w1, c1, v,
         {_DUCK_LPU.format(expr="1.0 / (c1 + v)")} AS w1_default_u
  FROM c1 CROSS JOIN vocab),
model AS (
  SELECT w1, w2,
         {_DUCK_LPU.format(expr="(c12 + 1) / (c1 + v)")} AS lp_u
  FROM c12 JOIN w1dim USING (w1)),
oov AS (SELECT {_DUCK_LPU.format(expr="1.0 / v")} AS oov_u FROM vocab),
tc AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS cnt
       FROM bi GROUP BY doc_id, w1, w2),
scored AS (
  SELECT doc_id,
         CAST(sum(-coalesce(m.lp_u, d.w1_default_u, o.oov_u) * cnt)
              AS BIGINT) AS nll_u,
         CAST(sum(cnt) AS BIGINT) AS n_bigrams
  FROM tc
  LEFT JOIN model m USING (w1, w2)
  LEFT JOIN w1dim d USING (w1)
  CROSS JOIN oov o
  GROUP BY doc_id)
SELECT doc_id, n_bigrams, nll_u,
       CAST(nll_u // n_bigrams AS BIGINT) AS nll_u_per_tok,
       doc_id % {LM_TRAIN_MOD} = 0 AS held_out
FROM scored"""


REG: dict[str, tuple] = {
    "pii_redact": (q_pii_redact, SQL_PII_REDACT),
    "decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "lm_perplexity": (q_lm_perplexity, SQL_LM_PERPLEXITY),
}
