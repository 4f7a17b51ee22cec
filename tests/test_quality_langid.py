"""Quality-rule labelling, quantile thresholds, language ID."""

from __future__ import annotations

from pyspark.sql import functions as F

from redpajama_v2_processing_spark.functions.langid import langid_struct
from redpajama_v2_processing_spark.functions.signals import with_signals
from redpajama_v2_processing_spark.operators.quality_filter import (
    quality_filter, with_quality_label,
)
from redpajama_v2_processing_spark.operators.thresholds import (
    per_lang_thresholds, quantile_filter,
)
from tests.conftest import docs_frame


def _label(spark, text):
    return with_quality_label(with_signals(docs_frame(spark, [text]))).collect()[0]


def test_drop_reasons_fire(spark):
    assert _label(spark, "too short").drop_reason == "number_of_words_min"
    long_ok = "the quick brown fox jumps over the lazy dog again and again today"
    assert _label(spark, long_ok).keep
    flagged = ("the " + "good word filler text here more words yes " * 2
               + "viagra casino xxx spam dup viagra")
    assert _label(spark, flagged).drop_reason == "flagged_word_fraction_max"
    low_entropy = "zz " + "the " + " ".join(["zz"] * 30)
    r = _label(spark, low_entropy)
    assert r.drop_reason == "word_repetition_2gram_max"
    no_stop = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambada"
    assert _label(spark, no_stop).drop_reason == "stop_word_fraction_min"


def test_quality_filter_removes_dropped(spark):
    df = docs_frame(spark, [
        "the quick brown fox jumps over the lazy dog again and again today",
        "x",
    ])
    assert [r.doc_id for r in quality_filter(df).select("doc_id").collect()] == [0]


def test_rule_order_precedence(spark):
    # a doc failing multiple rules reports the FIRST configured failure
    r = _label(spark, "zz")
    assert r.drop_reason == "number_of_words_min"


def test_thresholds_and_quantile_filter(spark):
    rows = [(i, f"l{i % 2}", " ".join(["w"] * (5 + i))) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    sig = with_signals(df)
    th = per_lang_thresholds(sig, ["number_of_words"], p_low=0.0, p_high=1.0)
    got = {r.lang: (r.number_of_words_lo, r.number_of_words_hi) for r in th.collect()}
    assert got["l0"] == (5.0, 23.0) and got["l1"] == (6.0, 24.0)
    # p=0/1 keeps everything
    assert quantile_filter(sig, ["number_of_words"], p_low=0.0, p_high=1.0).count() == 20
    # tight band drops the tails per language
    kept = quantile_filter(sig, ["number_of_words"], p_low=0.25, p_high=0.75).count()
    assert 0 < kept < 20


def test_langid_markers(spark):
    cases = {
        "the cat and the dog is here with this": "en",
        "der hund und die katze ist nicht hier": "de",
        "le chat et la maison est dans les champs": "fr",
        "el perro es una casa para los gatos": "es",
        "il cane non sono della casa anche che": "it",
        "зелёный кот сидит дома": "und",
        "这是一个中文文档测试页面": "zh",
    }
    df = spark.createDataFrame([(t,) for t in cases], "text string")
    s = langid_struct(F.col("text"))
    got = {r.text: r.lang for r in df.select("text", s["lang"].alias("lang")).collect()}
    for text, want in cases.items():
        assert got[text] == want, (text, got[text], want)


def test_langid_fixture_accuracy(spark, pages_small):
    """On clean fixture pages with correct tags, lexicon langid should hit
    the tag most of the time (contaminated rows excluded by construction
    is impossible here, so just require a solid majority)."""
    s = langid_struct(F.col("text"))
    scored = pages_small.select("lang", s["lang"].alias("pred"))
    total = scored.count()
    hit = scored.where(F.col("lang") == F.col("pred")).count()
    assert hit / total > 0.8


def test_quality_classifier_learns_disjoint_vocab(spark):
    """Hashed-LR classifier: 3 exact-GD iterations separate two classes
    with disjoint vocabularies; scores/pred align with labels; weights
    are integers (micro-unit contract) and deterministic across runs."""
    from pyspark.sql import functions as F
    from redpajama_v2_processing_spark.operators.quality_classifier import (
        classifier_scores, weights_frame)

    rows = [(i, "good clean prose reference encyclopedia" if i % 2 == 0
             else "spam casino pills winner jackpot click")
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    label = F.col("doc_id") % 2 == 0

    out = {r.id: r for r in classifier_scores(df, label, "doc_id").collect()}
    assert len(out) == 40
    for i, r in out.items():
        assert r.pred == (i % 2 == 0), (i, r)
        assert isinstance(r.margin_micro, int)
        assert (r.score4 > 0.5) == (i % 2 == 0)

    w1 = sorted((r.j, r.w_micro) for r in weights_frame(df, label, "doc_id").collect())
    w2 = sorted((r.j, r.w_micro) for r in weights_frame(df, label, "doc_id").collect())
    assert w1 == w2
    assert any(w != 0 for _, w in w1)
