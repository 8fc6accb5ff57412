"""Vectorized pandas/Arrow UDF wrappers over ccspark.kernels.

These are the ONLY Python touch-points in the engine's hot path
(input_hint mandate: vectorized pandas/Arrow UDFs, no per-row Python).
Everything else — filters, explodes, joins, windows, aggregations — is
JVM-side DataFrame API under whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F, types as T

from . import kernels as K


@F.pandas_udf(T.StringType())
def strip_ws_udf(s: pd.Series) -> pd.Series:
    return K.strip_whitespace(s)


@F.pandas_udf(T.StringType())
def normalize_udf(src: pd.Series, page: pd.Series) -> pd.Series:
    """U1+U2: whitespace strip then the reference's exact relative-URL
    reconstruction (ProcessingService.java:170-171,436-474). Null out =
    drop the row (malformed URL, ProcessingService.java:427-429)."""
    return K.normalize_series(K.strip_whitespace(src), K.strip_whitespace(page))


@F.pandas_udf(T.StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    """U3: java.net.URL#getHost semantics (case-preserving, port-stripped)."""
    return K.hosts_of(urls)


@F.pandas_udf(T.StringType())
def surt_udf(urls: pd.Series) -> pd.Series:
    """U4 extension: SURT-style total-order key."""
    return K.surt_series(urls)


@F.pandas_udf(T.DoubleType())
def priority_udf(url: pd.Series, page_url: pd.Series, kind: pd.Series,
                 alt: pd.Series, parent_txt: pd.Series,
                 dom_depth: pd.Series, dom_sib: pd.Series) -> pd.Series:
    """U11: deterministic priority over the reference's 23 features
    (ProcessingService.java:595-689), fixed weights replacing the RFs."""
    pdf = pd.DataFrame({
        "url": url, "page_url": page_url, "kind": kind, "alt": alt,
        "parent_txt": parent_txt, "dom_depth": dom_depth, "dom_sib": dom_sib,
    })
    return K.priority_scores(pdf)


@F.pandas_udf(T.ArrayType(T.StringType()))
def url_ngrams_udf(urls: pd.Series) -> pd.Series:
    """X5: char n-grams of the URL (Lucene NGramTokenizer port),
    sorted for determinism."""
    return urls.fillna("").map(lambda u: sorted(K.url_ngrams_one(u)))


@F.pandas_udf(T.BooleanType())
def dual_big_udf(urls: pd.Series, priorities: pd.Series) -> pd.Series:
    """Dual-model arbitration (ProcessingService.java:200-222): n-gram
    scorer vs the 23-feature priority, agreement else margin rule."""
    return K.dual_model_big_batch(urls, priorities)


CANON_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("host", T.StringType()),
    T.StructField("surt", T.StringType()),
    T.StructField("priority", T.DoubleType()),
])


@F.pandas_udf(CANON_SCHEMA)
def canon_udf(src: pd.Series, page: pd.Series, kind: pd.Series,
              alt: pd.Series, parent_txt: pd.Series,
              dom_depth: pd.Series, dom_sib: pd.Series) -> pd.DataFrame:
    """Fused U1+U2+U3+U4-key+U11 kernel: ONE Arrow exchange per batch
    instead of four chained pandas UDFs, and one URL decomposition pass
    shared by host/surt/priority (kernels.canon_block). Fusing matters
    doubly: it quarters the JVM↔Python socket round-trips (expensive
    under syscall-intercepting sandboxes and on real clusters alike) and
    one worker per task slot keeps total processes == cores — the chained
    layout runs 4 workers per slot, which oversubscribes exactly-sized
    executors. Output struct is exploded JVM-side; rows with null
    url/host are dropped there."""
    return K.canon_block(src, page, kind, alt, parent_txt, dom_depth, dom_sib)
