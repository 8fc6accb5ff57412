"""Dual-model arbitration, trained twin (SURVEY §2 U11 closure).

The reference composes TWO classifiers per image URL and arbitrates
(ProcessingService.java:200-222): an n-gram model over the URL string
and a 23-feature model; if the predicted classes agree that class wins,
else the model with the larger confidence margin, n-gram-favored by
ε = 0.05 (`|d1[0]-d1[1]| + 0.05 > |d2[0]-d2[1]|`). FakeArffCreator.java:
64-119 evaluates the composed decision with per-class confusion counts
and F1.

`dual_model_eval` is the oracle-backed relational twin: both models are
genuinely TRAINED (distributed aggregations, broadcast-model serving —
the lang_id_nb / quality_model machinery) on the deterministic media-URL
corpus synthesized from `part` (the same URLs media_url_filter gates):

  - model 1 (ngramsClass analog): multinomial NB over distinct char
    3-grams of the URL string,
  - model 2 (featuresClass analog): histogram NB over two coarse URL
    features (extension length, last-character bucket) — deliberately
    weaker than the gram model so the two genuinely disagree and the
    margin rule is exercised, like the reference's feature model vs its
    n-gram model,

with train split p_partkey % 5 != 0 and held-out evaluation on the
rest. Margins map the BIGINT micro-unit log-score difference to Weka's
|p0−p1| via the exact two-class identity |p0−p1| = |tanh(Δlogit/2)|,
rounded to 6 dp (the lang_id_nb ln-micro-unit recipe) so the
arbitration comparison `m1_u + 50000 > m2_u` is exact integer math on
both engines.

Scale story (100 TB): both models are tiny broadcast tables (V×2 gram
rows, bins×2 feature rows); training is pure aggregations over one
gram-explode scan; scoring is two broadcast joins + BIGINT sums keyed
by url — one shuffle each; the arbitration itself is a scalar
expression. The same shape serves 10^10 URLs.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .analytics import _MEDIA_URL_SPARK, MEDIA_SUFFIX_ANCHORED
from .kernels import DUAL_EPSILON

_TRAIN_MOD = 5
_EPS_U = int(round(DUAL_EPSILON * 1e6))  # 0.05 in micro-units

_lp_u = lambda expr: F.round(F.round(F.log(expr), 6) * 1e6, 0).cast("bigint")


def _t(spark, sf_dir, name):
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _urls(spark, sf_dir):
    return (_t(spark, sf_dir, "part")
            .select("p_partkey", F.expr(_MEDIA_URL_SPARK).alias("url"))
            .withColumn("truth_big",
                        F.col("url").rlike(MEDIA_SUFFIX_ANCHORED))
            .withColumn("cls_true",
                        F.col("truth_big").cast("int"))
            .withColumn("held_out", F.col("p_partkey") % _TRAIN_MOD == 0))


# 3-grams of the full URL, DISTINCT per url (the Java extractor emits a
# set). greatest(...,1) + the length filter guard the Spark
# sequence(1,0)-is-descending trap on degenerate strings.
_GRAMS_SPARK = ("filter(transform(sequence(1, greatest(length(url) - 2, 1)),"
                " i -> lower(substring(url, i, 3))), x -> length(x) = 3)")


def _score_grams(urls):
    """Model 1: multinomial NB over distinct url 3-grams. Returns one
    row per url: (p_partkey, s1_big, s1_small) BIGINT micro-scores."""
    grams = urls.select(
        "p_partkey", "cls_true",
        F.explode(F.array_distinct(F.expr(_GRAMS_SPARK))).alias("gram"))
    train = grams.filter(F.col("p_partkey") % _TRAIN_MOD != 0)
    cg = (train.groupBy(F.col("cls_true").alias("cls"), "gram")
          .agg(F.count(F.lit(1)).alias("c_cg")))
    tot = cg.groupBy("cls").agg(F.sum("c_cg").alias("c_c"))
    vocab = cg.select("gram").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("v"))
    n_docs = (urls.filter(F.col("p_partkey") % _TRAIN_MOD != 0)
              .groupBy(F.col("cls_true").alias("cls"))
              .agg(F.count(F.lit(1)).alias("n_c")))
    n_tot = n_docs.agg(F.sum("n_c").cast("double").alias("n"))
    cls_dim = (n_docs.crossJoin(F.broadcast(n_tot))
               .join(tot, "cls").crossJoin(F.broadcast(vocab))
               .select("cls",
                       _lp_u(F.lit(1.0) / (F.col("c_c") + F.col("v")))
                       .alias("default_u"),
                       _lp_u(F.col("n_c") / F.col("n")).alias("prior_u"),
                       "c_c", "v"))
    model = (cg.join(cls_dim.select("cls", "c_c", "v"), "cls")
             .select("cls", "gram",
                     _lp_u((F.col("c_cg") + 1) / (F.col("c_c") + F.col("v")))
                     .alias("lp_u")))
    scored = (grams.crossJoin(F.broadcast(
                  cls_dim.select("cls", "default_u", "prior_u")))
              .join(F.broadcast(model), ["cls", "gram"], "left")
              .withColumn("term_u", F.coalesce("lp_u", "default_u"))
              .groupBy("p_partkey", "cls")
              .agg((F.sum("term_u") + F.first("prior_u")).alias("score_u")))
    return (scored.groupBy("p_partkey")
            .agg(F.max(F.when(F.col("cls") == 1, F.col("score_u")))
                 .alias("s1_big"),
                 F.max(F.when(F.col("cls") == 0, F.col("score_u")))
                 .alias("s1_small")))


# model-2 features: deliberately coarse (extension length catches
# .html; the last-character bucket collides .txt with .mp4) so the
# models disagree on real rows and the margin rule runs
_FEATS_SPARK = [
    ("extlen", "length(regexp_extract(url, '\\\\.([a-z0-9]+)$', 1))"),
    ("lastc", "ascii(substring(url, -1, 1)) % 16"),
]


def _score_feats(urls):
    """Model 2: histogram NB over the two coarse features (the
    quality_model machinery). Returns (p_partkey, s2_big, s2_small)."""
    longs = None
    for feat, expr in _FEATS_SPARK:
        part = urls.select(
            "p_partkey", "cls_true", F.lit(feat).alias("feat"),
            F.expr(expr).cast("bigint").alias("bin"))
        longs = part if longs is None else longs.unionByName(part)
    train = longs.filter(F.col("p_partkey") % _TRAIN_MOD != 0)
    cfb = (train.groupBy(F.col("cls_true").alias("cls"), "feat", "bin")
           .agg(F.count(F.lit(1)).alias("c_fb")))
    cf = cfb.groupBy("cls", "feat").agg(F.sum("c_fb").alias("c_f"))
    bins = (train.groupBy("feat")
            .agg(F.count_distinct("bin").cast("double").alias("b_f")))
    n_docs = (urls.filter(F.col("p_partkey") % _TRAIN_MOD != 0)
              .groupBy(F.col("cls_true").alias("cls"))
              .agg(F.count(F.lit(1)).alias("n_c")))
    n_tot = n_docs.agg(F.sum("n_c").cast("double").alias("n"))
    defaults = (cf.join(F.broadcast(bins), "feat")
                .select("cls", "feat",
                        _lp_u(F.lit(1.0) / (F.col("c_f") + F.col("b_f")))
                        .alias("default_u")))
    priors = (n_docs.crossJoin(F.broadcast(n_tot))
              .select("cls", _lp_u(F.col("n_c") / F.col("n"))
                      .alias("prior_u")))
    model = (cfb.join(cf, ["cls", "feat"]).join(F.broadcast(bins), "feat")
             .select("cls", "feat", "bin",
                     _lp_u((F.col("c_fb") + 1) / (F.col("c_f") + F.col("b_f")))
                     .alias("lp_u")))
    scored = (longs.crossJoin(F.broadcast(priors))
              .join(F.broadcast(defaults), ["cls", "feat"])
              .join(F.broadcast(model), ["cls", "feat", "bin"], "left")
              .withColumn("term_u", F.coalesce("lp_u", "default_u"))
              .groupBy("p_partkey", "cls")
              .agg((F.sum("term_u") + F.first("prior_u")).alias("score_u")))
    return (scored.groupBy("p_partkey")
            .agg(F.max(F.when(F.col("cls") == 1, F.col("score_u")))
                 .alias("s2_big"),
                 F.max(F.when(F.col("cls") == 0, F.col("score_u")))
                 .alias("s2_small")))


def _margin_u(big, small):
    """|p0−p1| = |tanh(Δlogit/2)| with Δlogit = Δscore_u / 1e6, rounded
    to 6 dp micro-units — exact BIGINT on both engines. Written as the
    overflow-stable identity |tanh(x)| = 1 − 2/(exp(2|x|)+1) because
    this DuckDB build has no tanh(): exp saturates to +inf for huge
    score gaps and the expression collapses to exactly 1.0 — the
    correct saturated margin — identically on both engines."""
    return (F.round(F.round(
        F.lit(1.0) - F.lit(2.0)
        / (F.exp(F.abs(big - small) / F.lit(1e6)) + F.lit(1.0)), 6)
        * 1e6, 0).cast("bigint"))


def q_dual_model_eval(spark, sf_dir):
    urls = _urls(spark, sf_dir)
    j = (urls.join(_score_grams(urls), "p_partkey")
         .join(_score_feats(urls), "p_partkey")
         .withColumn("c1", F.col("s1_big") > F.col("s1_small"))
         .withColumn("c2", F.col("s2_big") > F.col("s2_small"))
         .withColumn("m1_u", _margin_u(F.col("s1_big"), F.col("s1_small")))
         .withColumn("m2_u", _margin_u(F.col("s2_big"), F.col("s2_small")))
         # ProcessingService.java:209-222 verbatim: agree → shared
         # class; else margin rule with the ε advantage to the n-grams
         .withColumn("pred_big", F.when(
             F.col("c1") == F.col("c2"), F.col("c1"))
             .otherwise(F.when(F.col("m1_u") + _EPS_U > F.col("m2_u"),
                               F.col("c1")).otherwise(F.col("c2"))))
         .filter(F.col("held_out")))
    m = j.agg(
        F.sum((F.col("truth_big") & F.col("pred_big")).cast("long"))
        .alias("tp_big"),
        F.sum((F.col("truth_big") & ~F.col("pred_big")).cast("long"))
        .alias("fn_big"),
        F.sum((~F.col("truth_big") & F.col("pred_big")).cast("long"))
        .alias("fp_big"),
        F.sum((~F.col("truth_big") & ~F.col("pred_big")).cast("long"))
        .alias("tp_small"),
        F.sum((F.col("c1") == F.col("c2")).cast("long")).alias("n_agree"),
        F.sum(((F.col("c1") != F.col("c2"))
               & (F.col("m1_u") + _EPS_U > F.col("m2_u"))).cast("long"))
        .alias("n_arb_ngram"),
        F.sum(((F.col("c1") != F.col("c2"))
               & ~(F.col("m1_u") + _EPS_U > F.col("m2_u"))).cast("long"))
        .alias("n_arb_feature"))
    f1_big = (2 * F.col("tp_big")
              / (2 * F.col("tp_big") + F.col("fn_big") + F.col("fp_big")))
    f1_small = (2 * F.col("tp_small")
                / (2 * F.col("tp_small") + F.col("fn_big") + F.col("fp_big")))
    return m.select(
        "tp_big", "fn_big", "fp_big", "tp_small",
        f1_big.alias("f1_big"), f1_small.alias("f1_small"),
        ((f1_big + f1_small) / 2).alias("f1_avg"),
        "n_agree", "n_arb_ngram", "n_arb_feature")


_LPU_DUCK = "CAST(round(round(ln({expr}), 6) * 1e6, 0) AS BIGINT)"

_URLS_DUCK = (
    "SELECT p_partkey, url,"
    f" regexp_matches(url, '{MEDIA_SUFFIX_ANCHORED}') AS truth_big,"
    f" CAST(regexp_matches(url, '{MEDIA_SUFFIX_ANCHORED}') AS INT)"
    " AS cls_true,"
    f" p_partkey % {_TRAIN_MOD} = 0 AS held_out"
    f" FROM (SELECT p_partkey, {_MEDIA_URL_SPARK} AS url FROM part)")

_GRAMS_DUCK = (
    "SELECT p_partkey, cls_true, unnest(list_distinct(list_filter("
    " list_transform(range(1, greatest(length(url) - 2, 1) + 1),"
    "  i -> lower(substr(url, i, 3))), x -> length(x) = 3))) AS gram"
    " FROM urls")

_FEATS_DUCK = " UNION ALL ".join(
    f"SELECT p_partkey, cls_true, '{feat}' AS feat,"
    f" CAST({expr} AS BIGINT) AS bin FROM urls"
    for feat, expr in [
        ("extlen", r"length(regexp_extract(url, '\.([a-z0-9]+)$', 1))"),
        ("lastc", "ascii(substr(url, -1)) % 16"),
    ])

_MARGIN_DUCK = ("CAST(round(round(1 - 2 / (exp(abs({big} - {small}) / 1e6)"
                " + 1), 6) * 1e6, 0) AS BIGINT)")

SQL_DUAL_MODEL_EVAL = (
    f"WITH urls AS ({_URLS_DUCK}),"
    f" grams AS ({_GRAMS_DUCK}),"
    f" g_train AS (SELECT * FROM grams WHERE p_partkey % {_TRAIN_MOD} <> 0),"
    " cg AS (SELECT cls_true AS cls, gram, CAST(count(*) AS BIGINT) AS c_cg"
    "   FROM g_train GROUP BY cls_true, gram),"
    " g_tot AS (SELECT cls, CAST(sum(c_cg) AS BIGINT) AS c_c FROM cg"
    "   GROUP BY cls),"
    " g_vocab AS (SELECT CAST(count(DISTINCT gram) AS DOUBLE) AS v FROM cg),"
    f" n_docs AS (SELECT cls_true AS cls, CAST(count(*) AS BIGINT) AS n_c"
    f"   FROM urls WHERE p_partkey % {_TRAIN_MOD} <> 0 GROUP BY cls_true),"
    " n_tot AS (SELECT CAST(sum(n_c) AS DOUBLE) AS n FROM n_docs),"
    " g_cls AS (SELECT d.cls,"
    f"   {_LPU_DUCK.format(expr='1.0 / (c_c + v)')} AS default_u,"
    f"   {_LPU_DUCK.format(expr='n_c / n')} AS prior_u, c_c, v"
    "   FROM n_docs d CROSS JOIN n_tot JOIN g_tot t ON t.cls = d.cls"
    "   CROSS JOIN g_vocab),"
    " g_model AS (SELECT c.cls, c.gram,"
    f"   {_LPU_DUCK.format(expr='(c_cg + 1) / (c_c + v)')} AS lp_u"
    "   FROM cg c JOIN g_cls USING (cls)),"
    " g_scored AS (SELECT g.p_partkey, l.cls,"
    "   CAST(sum(coalesce(m.lp_u, l.default_u))"
    "        + any_value(l.prior_u) AS BIGINT) AS score_u"
    "   FROM grams g CROSS JOIN"
    "    (SELECT cls, default_u, prior_u FROM g_cls) l"
    "   LEFT JOIN g_model m ON m.cls = l.cls AND m.gram = g.gram"
    "   GROUP BY g.p_partkey, l.cls),"
    " s1 AS (SELECT p_partkey,"
    "   max(CASE WHEN cls = 1 THEN score_u END) AS s1_big,"
    "   max(CASE WHEN cls = 0 THEN score_u END) AS s1_small"
    "   FROM g_scored GROUP BY p_partkey),"
    f" feats AS ({_FEATS_DUCK}),"
    f" f_train AS (SELECT * FROM feats WHERE p_partkey % {_TRAIN_MOD} <> 0),"
    " cfb AS (SELECT cls_true AS cls, feat, bin,"
    "   CAST(count(*) AS BIGINT) AS c_fb FROM f_train"
    "   GROUP BY cls_true, feat, bin),"
    " cf AS (SELECT cls, feat, CAST(sum(c_fb) AS BIGINT) AS c_f FROM cfb"
    "   GROUP BY cls, feat),"
    " f_bins AS (SELECT feat, CAST(count(DISTINCT bin) AS DOUBLE) AS b_f"
    "   FROM f_train GROUP BY feat),"
    " f_defaults AS (SELECT cls, cf.feat,"
    f"   {_LPU_DUCK.format(expr='1.0 / (c_f + b_f)')} AS default_u"
    "   FROM cf JOIN f_bins ON f_bins.feat = cf.feat),"
    " f_priors AS (SELECT cls,"
    f"   {_LPU_DUCK.format(expr='n_c / n')} AS prior_u"
    "   FROM n_docs CROSS JOIN n_tot),"
    " f_model AS (SELECT c.cls, c.feat, c.bin,"
    f"   {_LPU_DUCK.format(expr='(c_fb + 1) / (c_f + b_f)')} AS lp_u"
    "   FROM cfb c JOIN cf USING (cls, feat)"
    "   JOIN f_bins ON f_bins.feat = c.feat),"
    " f_scored AS (SELECT f.p_partkey, p.cls,"
    "   CAST(sum(coalesce(m.lp_u, d.default_u))"
    "        + any_value(p.prior_u) AS BIGINT) AS score_u"
    "   FROM feats f CROSS JOIN f_priors p"
    "   JOIN f_defaults d ON d.cls = p.cls AND d.feat = f.feat"
    "   LEFT JOIN f_model m ON m.cls = p.cls AND m.feat = f.feat"
    "    AND m.bin = f.bin"
    "   GROUP BY f.p_partkey, p.cls),"
    " s2 AS (SELECT p_partkey,"
    "   max(CASE WHEN cls = 1 THEN score_u END) AS s2_big,"
    "   max(CASE WHEN cls = 0 THEN score_u END) AS s2_small"
    "   FROM f_scored GROUP BY p_partkey),"
    " arb AS (SELECT u.truth_big, s1_big > s1_small AS c1,"
    "   s2_big > s2_small AS c2,"
    f"   {_MARGIN_DUCK.format(big='s1_big', small='s1_small')} AS m1_u,"
    f"   {_MARGIN_DUCK.format(big='s2_big', small='s2_small')} AS m2_u"
    "   FROM urls u JOIN s1 USING (p_partkey) JOIN s2 USING (p_partkey)"
    "   WHERE u.held_out),"
    " dec AS (SELECT truth_big, c1, c2, m1_u, m2_u,"
    "   CASE WHEN c1 = c2 THEN c1"
    f"        WHEN m1_u + {_EPS_U} > m2_u THEN c1 ELSE c2 END AS pred_big"
    "   FROM arb),"
    " m AS (SELECT"
    "  CAST(sum(CASE WHEN truth_big AND pred_big THEN 1 ELSE 0 END)"
    "    AS BIGINT) AS tp_big,"
    "  CAST(sum(CASE WHEN truth_big AND NOT pred_big THEN 1 ELSE 0 END)"
    "    AS BIGINT) AS fn_big,"
    "  CAST(sum(CASE WHEN NOT truth_big AND pred_big THEN 1 ELSE 0 END)"
    "    AS BIGINT) AS fp_big,"
    "  CAST(sum(CASE WHEN NOT truth_big AND NOT pred_big THEN 1 ELSE 0 END)"
    "    AS BIGINT) AS tp_small,"
    "  CAST(sum(CASE WHEN c1 = c2 THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,"
    f"  CAST(sum(CASE WHEN c1 <> c2 AND m1_u + {_EPS_U} > m2_u"
    "    THEN 1 ELSE 0 END) AS BIGINT) AS n_arb_ngram,"
    f"  CAST(sum(CASE WHEN c1 <> c2 AND NOT (m1_u + {_EPS_U} > m2_u)"
    "    THEN 1 ELSE 0 END) AS BIGINT) AS n_arb_feature"
    "  FROM dec)"
    " SELECT tp_big, fn_big, fp_big, tp_small,"
    "  2 * tp_big / (2 * tp_big + fn_big + fp_big) AS f1_big,"
    "  2 * tp_small / (2 * tp_small + fn_big + fp_big) AS f1_small,"
    "  (2 * tp_big / (2 * tp_big + fn_big + fp_big)"
    "   + 2 * tp_small / (2 * tp_small + fn_big + fp_big)) / 2 AS f1_avg,"
    "  n_agree, n_arb_ngram, n_arb_feature"
    " FROM m")


REG: dict[str, tuple] = {
    "dual_model_eval": (q_dual_model_eval, SQL_DUAL_MODEL_EVAL),
}
