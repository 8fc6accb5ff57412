"""BPE merge-application fold semantics, pinned on literal cases: the
greedy left-to-right contract (scan continues after a replacement) and
the token-exact endswith test that keeps a just-merged symbol from
re-matching as the pair's left element."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ccspark.textops import _SPARK_BPE_FOLD


def _apply(spark, seq: str, pa: str, pb: str) -> str:
    df = spark.createDataFrame([(seq, pa, pb)], "seq string, pa string, pb string")
    return df.select(F.expr(_SPARK_BPE_FOLD).alias("m")).collect()[0].m


CASES = [
    # classic merge
    ("h e l l o", "l", "l", "h e ll o"),
    # greedy on runs: "a a a" merges the FIRST pair only, the merged
    # token does not re-match as left element
    ("a a a", "a", "a", "aa a"),
    ("a a a a", "a", "a", "aa aa"),
    # merged symbol string-prefix trap: token 'aaa' (one symbol) must
    # not satisfy a ('aa','a') merge via string suffix matching
    ("aaa a", "aa", "a", "aaa a"),
    ("aa a", "aa", "a", "aaa"),
    # merge at start and end of sequence
    ("a b c", "a", "b", "ab c"),
    ("c a b", "a", "b", "c ab"),
    # no occurrence
    ("x y z", "a", "b", "x y z"),
    # single symbol
    ("q", "a", "b", "q"),
]


@pytest.mark.parametrize("seq,pa,pb,want", CASES)
def test_greedy_fold(spark, seq, pa, pb, want):
    assert _apply(spark, seq, pa, pb) == want


def test_fold_matches_reference_bpe(spark):
    """The fold equals the textbook greedy merge (Sennrich et al.'s
    pair-replacement loop) on every word of a small corpus."""
    def ref_merge(tokens, pa, pb):
        out, i = [], 0
        while i < len(tokens):
            if i + 1 < len(tokens) and tokens[i] == pa and tokens[i + 1] == pb:
                out.append(pa + pb); i += 2
            else:
                out.append(tokens[i]); i += 1
        return out

    words = ["hello", "lllll", "banana", "aaaa", "mississippi"]
    for w in words:
        toks = list(w)
        for pa, pb in [("l", "l"), ("a", "a"), ("s", "s"), ("a", "n")]:
            got = _apply(spark, " ".join(toks), pa, pb)
            assert got == " ".join(ref_merge(toks, pa, pb)), (w, pa, pb)
