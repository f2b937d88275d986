"""Property-based tests (hypothesis) over the column-function semantics.

Each property drives the real Spark expressions on generated inputs and
checks an algebraic invariant — the SURVEY §5.2-4 layer beyond
fixed-fixture parity. Example counts are kept small because every
example is a Spark job.
"""

from __future__ import annotations

import datetime
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_trend_analysis_spark.functions.decay import decay_weight
from big_data_trend_analysis_spark.functions.text import quality_score
from big_data_trend_analysis_spark.operators.dedup import dedup_exact
from big_data_trend_analysis_spark.operators.skew import salted_join

# Slow tier (see pyproject.toml): every hypothesis example is a Spark
# job; the module totals ~30 min. Run explicitly: pytest -m slow.
pytestmark = pytest.mark.slow


SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ANCHOR = "2024-02-01 00:00:00"
ANCHOR_DT = datetime.datetime(2024, 2, 1)


@SETTINGS
@given(
    ages=st.lists(
        st.integers(min_value=0, max_value=10_000_000), min_size=1, max_size=30
    )
)
def test_decay_weight_matches_formula_and_bounds(spark, ages):
    rows = [(ANCHOR_DT - datetime.timedelta(seconds=a),) for a in ages]
    df = spark.createDataFrame(rows, "ts timestamp")
    got = [r.w for r in df.select(decay_weight("ts", ANCHOR).alias("w")).collect()]
    for age, w in zip(ages, got):
        # lower bound inclusive: exp underflows to exactly 0.0 for ages
        # beyond ~7.45e5 s at this rate (found by hypothesis)
        assert 0.0 <= w <= 1.0
        assert w == pytest.approx(math.exp(-0.1 * age / 60.0), rel=1e-12, abs=1e-300)
    # monotonic: older ⇒ smaller weight
    by_age = sorted(zip(ages, got))
    for (a1, w1), (a2, w2) in zip(by_age, by_age[1:]):
        if a1 < a2:
            assert w1 >= w2


@SETTINGS
@given(
    texts=st.lists(
        st.text(alphabet="abc ", min_size=1, max_size=12), min_size=1, max_size=25
    )
)
def test_dedup_exact_invariants(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_exact(df).collect()
    # one survivor per distinct text, and it is the minimal doc_id
    assert len(out) == len(set(texts))
    expected = {}
    for i, t in enumerate(texts):
        expected.setdefault(t, i)
    assert {r.text: r.doc_id for r in out} == expected


@SETTINGS
@given(
    keys=st.lists(st.integers(min_value=0, max_value=3), min_size=1, max_size=40),
    buckets=st.integers(min_value=1, max_value=8),
)
def test_salted_join_equivalence_under_skew(spark, keys, buckets):
    large = spark.createDataFrame(
        [(k, i) for i, k in enumerate(keys)], "k int, row_id int"
    )
    small = spark.createDataFrame([(k, f"v{k}") for k in range(4)], "k int, v string")
    plain = large.join(small, "k").select("row_id", "v")
    salted = salted_join(large, small, on="k", buckets=buckets).select("row_id", "v")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


@SETTINGS
@given(
    words=st.lists(
        st.text(alphabet="abcdefgh", min_size=1, max_size=10),
        min_size=1,
        max_size=20,
    )
)
def test_quality_score_bounded(spark, words):
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    q = df.select(quality_score("text").alias("q")).collect()[0].q
    assert 0.0 <= q <= 1.0


class _FakeVader:
    """Shape-faithful VADER stub: polarity_scores -> dict with compound."""

    def polarity_scores(self, text):
        return {"neg": 0.0, "neu": 0.5, "pos": 0.5, "compound": 0.42 if text else 0.0}


class _FakeSpan:
    def __init__(self, text, label):
        self.text, self.label_ = text, label


class _FakeDoc:
    def __init__(self, ents):
        self.ents = ents


class _FakeSpacy:
    """Shape-faithful spaCy stub: callable doc with .ents spans."""

    def __call__(self, text):
        ents = []
        if "Ada" in text:
            ents.append(_FakeSpan("Ada Lovelace", "PERSON"))
        if "Apache" in text:
            ents.append(_FakeSpan("Apache Spark", "ORG"))
        if "Paris" in text:
            ents.append(_FakeSpan("Paris", "GPE"))  # must be filtered out
        return _FakeDoc(ents)


def test_vader_branch_contract_with_stub():
    """The real-model branch body (functions/nlp._vader_series) is
    exercised with a shape-faithful stub: float output, null-safe."""
    import pandas as pd

    from big_data_trend_analysis_spark.functions.nlp import _vader_series

    out = _vader_series(_FakeVader(), pd.Series(["hello", None, ""]))
    assert list(out) == [0.42, 0.0, 0.0]
    assert all(isinstance(v, float) for v in out)


def test_spacy_branch_contract_with_stub():
    """PERSON/ORG filter of the real-model branch (reference
    fake_producer.py:47-51): other labels dropped, null-safe."""
    import pandas as pd

    from big_data_trend_analysis_spark.functions.nlp import _spacy_series

    out = _spacy_series(
        _FakeSpacy(), pd.Series(["Ada met Apache in Paris", None, "plain text"])
    )
    assert list(out[0]) == ["Ada Lovelace", "Apache Spark"]  # GPE filtered
    assert list(out[1]) == []
    assert list(out[2]) == []


def test_vader_branch_with_real_model_if_installed():
    """Real NLTK VADER, when present: known-polarity fixtures."""
    import pandas as pd
    import pytest

    nltk = pytest.importorskip("nltk")
    try:
        from nltk.sentiment.vader import SentimentIntensityAnalyzer

        vader = SentimentIntensityAnalyzer()
    except Exception:
        pytest.skip("vader_lexicon data not downloaded")
    from big_data_trend_analysis_spark.functions.nlp import _vader_series

    out = _vader_series(vader, pd.Series(["I love this, it is great!", "I hate this, it is terrible."]))
    assert out[0] > 0.05 and out[1] < -0.05


def test_spacy_branch_with_real_model_if_installed():
    """Real spaCy en_core_web_sm, when present: entity extraction with
    the PERSON/ORG label filter."""
    import pandas as pd
    import pytest

    spacy = pytest.importorskip("spacy")
    try:
        nlp = spacy.load("en_core_web_sm")
    except Exception:
        pytest.skip("en_core_web_sm model not installed")
    from big_data_trend_analysis_spark.functions.nlp import _spacy_series

    out = _spacy_series(nlp, pd.Series(["Ada Lovelace joined Microsoft in London."]))
    assert "Ada Lovelace" in out[0]
    assert any("Microsoft" in e for e in out[0])
    assert not any("London" == e for e in out[0])  # GPE filtered


def test_winnow_fingerprints_differential_vs_reference_impl(spark):
    """Spark winnowing vs an independent pure-Python implementation over
    randomized documents: exact fingerprint-set equality. Catches
    off-by-one drift in the gram/frame windows that example-based tests
    can miss."""
    import hashlib
    import random

    from big_data_trend_analysis_spark.operators.textstats import winnow_fingerprints

    def reference(text, k=4, window=5):
        w = text.split(" ")
        if len(w) < k:
            return set()
        hs = [
            hashlib.md5(" ".join(w[i : i + k]).encode()).hexdigest()
            for i in range(len(w) - k + 1)
        ]
        if len(hs) < window:
            return set()
        return {min(hs[i : i + window]) for i in range(len(hs) - window + 1)}

    rng = random.Random(99)
    vocab = [f"w{j}" for j in range(40)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(100)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    for doc_id, text in docs:
        assert got.get(doc_id, set()) == reference(text), f"doc {doc_id}"


@SETTINGS
@given(
    vals=st.lists(
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=15,
    ),
    frame=st.integers(min_value=0, max_value=5),
)
def test_rolling_median_matches_statistics(spark, vals, frame):
    """Windowed percentile(0.5) must equal the interpolated median of
    each trailing frame (statistics.median uses the same rule)."""
    import statistics

    from big_data_trend_analysis_spark.operators.windows import rolling_median

    rows = [
        (i, ANCHOR_DT + datetime.timedelta(seconds=i), 1, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {
        r.event_id: r.rolling_median
        for r in rolling_median(df, frame_rows=frame).collect()
    }
    for i in range(len(vals)):
        window = vals[max(0, i - frame) : i + 1]
        assert got[i] == pytest.approx(round(statistics.median(window), 6))


@SETTINGS
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=6
        ),
        min_size=2,
        max_size=10,
    )
)
def test_cooccurrence_pmi_matches_brute_force(spark, docs):
    """PMI pairs/counts must equal the brute-force doc-set computation."""
    import itertools
    import math as m

    from big_data_trend_analysis_spark.operators.textstats import cooccurrence_pmi

    rows = [(i, " ".join(toks), "en", "s", 1) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        (r.token_a, r.token_b): (r.c_ab, r.pmi)
        for r in cooccurrence_pmi(df, min_pairs=1, top_k=100).collect()
    }

    sets = [set(toks) for toks in docs]
    n = len(docs)
    dfreq = {t: sum(t in s for s in sets) for s in sets for t in s}
    expected = {}
    vocab = sorted(dfreq)
    for ta, tb in itertools.combinations(vocab, 2):
        c = sum(ta in s and tb in s for s in sets)
        if c >= 1:
            expected[(ta, tb)] = (
                c,
                round(m.log((c * n) / (dfreq[ta] * dfreq[tb])), 6),
            )
    assert {k: v[0] for k, v in got.items()} == {
        k: v[0] for k, v in expected.items()
    }
    for k in expected:
        assert got[k][1] == pytest.approx(expected[k][1])


@SETTINGS
@given(
    seq=st.lists(st.sampled_from(["view", "click", "purchase"]), min_size=1, max_size=12)
)
def test_attribution_matches_brute_force(spark, seq):
    """Attribution output must equal the per-purchase linear scan."""
    from big_data_trend_analysis_spark.operators.temporal import (
        attribution_last_touch,
    )

    rows = [
        (i, ANCHOR_DT + datetime.timedelta(hours=i), 1, t, 1.0, "{}")
        for i, t in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {r.purchase_id: (r.touch_type, r.touch_ts) for r in attribution_last_touch(df).collect()}

    expected = {}
    for i, t in enumerate(seq):
        if t != "purchase":
            continue
        touches = [
            (j, u) for j, u in enumerate(seq[:i]) if u != "purchase"
        ]
        # within 7 days: hours diff <= 168
        touches = [(j, u) for j, u in touches if i - j <= 168]
        if touches:
            j, u = touches[-1]
            expected[i] = (u, ANCHOR_DT + datetime.timedelta(hours=j))
    assert got == expected


@SETTINGS
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e"]), min_size=3, max_size=8
        ),
        min_size=3,
        max_size=12,
    )
)
def test_decontaminate_matches_brute_force(spark, docs):
    """Flagged docs + shared-gram counts must equal the brute-force
    n-gram set intersection against the benchmark slice."""
    from big_data_trend_analysis_spark.operators.dedup import decontaminate_ngram

    n, mod = 3, 3  # every doc_id % 3 == 0 is "benchmark" on tiny data
    rows = [(i, " ".join(toks), "en", "s", 1) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        r.doc_id: (r.n_shared, r.n_grams)
        for r in decontaminate_ngram(df, n=n, bench_mod=mod).collect()
    }

    def grams(toks):
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    bench = set().union(
        *(grams(t) for i, t in enumerate(docs) if i % mod == 0 and len(t) >= n)
    ) if any(i % mod == 0 and len(t) >= n for i, t in enumerate(docs)) else set()
    expected = {}
    for i, toks in enumerate(docs):
        if i % mod == 0 or len(toks) < n:
            continue
        g = grams(toks)
        shared = g & bench
        if shared:
            expected[i] = (len(shared), len(g))
    assert got == expected


@SETTINGS
@given(
    seq=st.lists(
        st.tuples(st.integers(0, 2), st.sampled_from(["x", "y", "z"])),
        min_size=2,
        max_size=20,
    )
)
def test_event_transitions_matches_brute_force(spark, seq):
    """Transition counts must equal the per-user linear scan, and the
    probabilities must sum to 1 within each from_type."""
    from collections import Counter, defaultdict

    from big_data_trend_analysis_spark.operators.temporal import event_transitions

    rows = [
        (i, ANCHOR_DT + datetime.timedelta(minutes=i), u, t, 1.0, "{}")
        for i, (u, t) in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {
        (r.from_type, r.to_type): (r.n_transitions, r.p_transition)
        for r in event_transitions(df).collect()
    }

    per_user = defaultdict(list)
    for i, (u, t) in enumerate(seq):
        per_user[u].append(t)
    expected = Counter()
    for types in per_user.values():
        for a, b in zip(types, types[1:]):
            expected[(a, b)] += 1
    assert {k: v[0] for k, v in got.items()} == dict(expected)
    by_from = defaultdict(float)
    for (a, _), (_, p) in got.items():
        by_from[a] += p
    for a, total in by_from.items():
        assert total == pytest.approx(1.0, abs=1e-4)


def test_histogram_covers_all_rows_and_bucket_range(spark, sf_dir):
    """Histogram counts must sum to the table row count; bucket ids lie
    in [0, n_buckets); the max-value row lands in the last bucket."""
    from big_data_trend_analysis_spark.operators.aggregates import histogram_numeric
    from big_data_trend_analysis_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    rows = histogram_numeric(li, n_buckets=20).collect()
    assert sum(r.n_items for r in rows) == li.count()
    assert all(0 <= r.bucket < 20 for r in rows)
    assert max(r.bucket for r in rows) == 19


def test_retention_week0_counts_every_user(spark, sf_dir):
    """Offset-0 cells must cover the full user population exactly once
    (every user is active in their own cohort week), and no offset may
    be negative."""
    from big_data_trend_analysis_spark.operators.temporal import retention_cohort
    from big_data_trend_analysis_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = retention_cohort(ev).collect()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_users for r in rows if r.week_offset == 0) == n_users
    assert all(r.week_offset >= 0 for r in rows)


@SETTINGS
@given(
    toks=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        min_size=1,
        max_size=8,
        unique=True,
    )
)
def test_fuzzy_join_radius2_matches_brute_force(spark, toks):
    """Radius-2 deletion neighborhoods must be a COMPLETE candidate
    generator: the join output equals the brute-force all-pairs
    levenshtein(a, b) <= 2 relation over the augmented vocabulary."""
    import itertools

    from big_data_trend_analysis_spark.operators.dedup import fuzzy_token_join

    df = spark.createDataFrame(
        [(0, " ".join(toks), "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        (r.token_a, r.token_b, r.dist)
        for r in fuzzy_token_join(df, max_dist=2).collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    vocab = set(toks)
    for t in toks:
        if len(t) >= 4:
            half = len(t) // 2
            vocab.add(t[:half] + t[half + 1 :])
    expected = {
        (a, b, lev(a, b))
        for a, b in itertools.combinations(sorted(vocab), 2)
        if lev(a, b) <= 2
    }
    assert got == expected


def test_split_train_val_test_disjoint_stable_ratioed(spark, sf_dir):
    """Splits must be exhaustive and disjoint, stable under
    repartitioning AND under corpus growth (an existing doc never
    changes split when new docs arrive), with fractions near target."""
    from pyspark.sql import functions as F

    from big_data_trend_analysis_spark.operators.textstats import (
        split_train_val_test,
    )
    from big_data_trend_analysis_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = split_train_val_test(docs, val_frac=0.1, test_frac=0.1)
    n = docs.count()
    counts = {r.split: r.n for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == n  # exhaustive, one split per row
    assert 0.04 < counts.get("val", 0) / n < 0.16
    assert 0.04 < counts.get("test", 0) / n < 0.16

    assign = {r.doc_id: r.split for r in out.select("doc_id", "split").collect()}
    # stable under physical layout
    re_assign = {
        r.doc_id: r.split
        for r in split_train_val_test(docs.repartition(7), 0.1, 0.1)
        .select("doc_id", "split").collect()
    }
    assert assign == re_assign
    # stable under corpus growth: half the corpus gets identical splits
    half = docs.filter(F.col("doc_id") % 2 == 0)
    half_assign = {
        r.doc_id: r.split
        for r in split_train_val_test(half, 0.1, 0.1)
        .select("doc_id", "split").collect()
    }
    assert half_assign == {k: v for k, v in assign.items() if k % 2 == 0}

    with pytest.raises(ValueError, match="invalid split"):
        split_train_val_test(docs, val_frac=0.6, test_frac=0.5)


def test_repetition_signals_match_brute_force(spark):
    """Each Gopher-style signal must equal the brute-force Python
    computation on planted repetitive / clean / degenerate docs."""
    from collections import Counter

    from big_data_trend_analysis_spark.operators.textstats import (
        repetition_signals,
    )

    docs = {
        1: "spam spam spam spam unique",            # heavy word dup
        2: "alpha beta\nalpha beta\ngamma delta",   # duplicate line
        3: "clean words only here now",             # clean
        4: "x",                                     # single token
        5: "tag # tag # tag ... done",              # symbols
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in repetition_signals(df).collect()}

    for i, t in docs.items():
        lines = t.split("\n")
        words = t.split(" ")
        exp_dup_line = round((len(lines) - len(set(lines))) / len(lines), 6)
        exp_dup_word = round((len(words) - len(set(words))) / len(words), 6)
        n_sym = t.count("#") + t.count("...") + t.count("…")
        sym_chars = t.count("#") + 3 * t.count("...") + t.count("…")
        exp_sym = round(sym_chars / len(words), 6)
        assert got[i].dup_line_frac == exp_dup_line, i
        assert got[i].dup_word_frac == exp_dup_word, i
        assert got[i].symbol_word_ratio == exp_sym, i

        bigrams = [" ".join(words[j : j + 2]) for j in range(len(words) - 1)]
        if bigrams:
            c = Counter(bigrams)
            best = max(c, key=lambda g: (c[g], len(g), g))
            # overlapping self-repeating bigrams can "cover" more chars
            # than the doc has; the operator caps the fraction at 1.0
            exp_top = round(min(c[best] * len(best) / len(t), 1.0), 6)
            assert got[i].top_bigram_char_frac == exp_top, i
        else:
            assert got[i].top_bigram_char_frac is None, i

    # doc 1's top bigram "spam spam" covers 3*9=27 of 26 chars when
    # counted with overlap — the reported fraction must be capped
    assert got[1].top_bigram_char_frac == 1.0


def test_split_bucket_is_engine_portable(spark):
    """The split hash must be recomputable OUTSIDE Spark verbatim (the
    whole point of the md5 bucket): hashlib reproduces every bucket,
    i.e. split membership is auditable from any engine."""
    import hashlib

    from pyspark.sql import functions as F

    from big_data_trend_analysis_spark.operators.textstats import (
        split_train_val_test,
    )

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    got = {
        r.doc_id: r.split
        for r in split_train_val_test(docs, 0.05, 0.05).collect()
    }
    for i in range(200):
        b = int(hashlib.md5(f"{i}:29".encode()).hexdigest()[:15], 16) % 1_000_000
        want = "val" if b < 50_000 else ("test" if b < 100_000 else "train")
        assert got[i] == want, f"doc {i}: bucket {b} → {want}, got {got[i]}"


def test_tune_lsh_knobs_meet_recall_and_budget(spark, sf_dir):
    """Tuned (bands, bits) must satisfy both constraints they were
    derived under, recomputed independently here: analytic recall at
    the threshold >= target, and expected background candidate
    fraction within budget on a fresh sample."""
    import numpy as np

    from big_data_trend_analysis_spark.operators.similarity import (
        _hash_sample_matrix,
        tune_lsh_knobs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bands, bits = tune_lsh_knobs(
        emb, threshold=0.9, target_recall=0.9, max_cand_frac=0.01
    )
    assert 1 <= bands <= 16 and 4 <= bits <= 16
    p_t = 1.0 - np.arccos(0.9) / np.pi
    recall = 1.0 - (1.0 - p_t**bits) ** bands
    assert recall >= 0.9, (bands, bits, recall)
    _, mat = _hash_sample_matrix(emb, 256, "test")
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    sims = (mat @ mat.T)[np.triu_indices(len(mat), k=1)]
    p_bg = 1.0 - np.arccos(np.clip(sims, -1.0, 1.0)) / np.pi
    assert bands * float(np.mean(p_bg**bits)) <= 0.01
    # determinism: the knobs are a pure function of the corpus
    assert tune_lsh_knobs(emb) == (bands, bits)


def test_tune_ivf_nprobe_adapts_to_cluster_structure(spark):
    """On tightly clustered corpora the neighbor's cell is the
    vector's own top cell => nprobe=1; the near-uniform fixture needs
    more probes. The tuner must see the difference from data."""
    import numpy as np

    from big_data_trend_analysis_spark.operators.similarity import (
        EMBEDDING_DIM,
        tune_ivf_nprobe,
    )

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, EMBEDDING_DIM)) * 10
    rows = []
    for i in range(400):
        c = centers[i % 4]
        v = c + rng.standard_normal(EMBEDDING_DIM) * 0.01
        rows.append((i, [float(x) for x in v], "l"))
    clustered = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    assert tune_ivf_nprobe(clustered, n_centroids=4, target_recall=0.9) == 1


def test_footer_count_skips_the_count_job(spark, sf_dir):
    """VERDICT r8 #7: codebook training sizes its hash sample from
    parquet footer statistics when the plan preserves scan
    cardinality (zero pre-jobs), and falls back to an honest count()
    the moment the plan filters/limits — never a wrong size."""
    from big_data_trend_analysis_spark.operators.similarity import (
        _hash_sample_matrix,
        _scan_row_count,
    )
    from big_data_trend_analysis_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    true_n = emb.count()
    # footer stats answer scans and projections exactly
    assert _scan_row_count(emb) == true_n
    assert _scan_row_count(emb.select("vec_id", "embedding")) == true_n
    # cardinality-changing plans must refuse the shortcut
    assert _scan_row_count(emb.filter("vec_id > 3")) is None
    assert _scan_row_count(emb.limit(5)) is None
    assert _scan_row_count(emb.groupBy("vec_id").count()) is None
    # non-file inputs too
    assert _scan_row_count(spark.range(10)) is None

    # the sampler must never pay the count job on the scan path
    def boom():
        raise AssertionError("count() job ran despite footer stats")

    emb.count = boom
    n, _ = _hash_sample_matrix(emb, 8, "footer-test")
    assert n == true_n


def test_bounded_collect_raises_over_ceiling(spark, monkeypatch):
    """The driver-side sample ceiling is enforced, not advisory."""
    import pytest

    from big_data_trend_analysis_spark.operators import similarity

    monkeypatch.setattr(similarity, "_BOUNDED_SAMPLE_MAX", 10)
    with pytest.raises(RuntimeError, match="_BOUNDED_SAMPLE_MAX"):
        similarity._bounded_collect(spark.range(11), "test path")
    assert len(similarity._bounded_collect(spark.range(10), "t")) == 10


@given(
    counts=st.lists(st.integers(min_value=1, max_value=50), min_size=4, max_size=15)
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_km_survival_invariants(spark, counts):
    """Kaplan–Meier invariants on ANY lifetime distribution: S is in
    (0, 1], non-increasing over days, at-risk counts non-increasing,
    and the final-day cohort is censored (d = 0), never churned."""
    from big_data_trend_analysis_spark.operators.temporal import survival_km

    rows, eid, uid = [], 0, 0
    for d, n in enumerate(counts):  # n users whose LAST day is day d+1
        for _ in range(n):
            for k in range(1, d + 2):
                rows.append(
                    (eid, datetime.datetime(2024, 1, k), uid, "view", 1.0, "{}")
                )
                eid += 1
            uid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = sorted(survival_km(ev).collect(), key=lambda r: r.day)
    assert out[0].n_risk == sum(counts)
    s_prev, risk_prev = 1.0 + 1e-9, out[0].n_risk + 1
    for r in out:
        assert 0.0 < r.s_km <= 1.0 + 1e-9
        assert r.s_km <= s_prev + 1e-9
        assert r.n_risk < risk_prev + 1
        s_prev, risk_prev = r.s_km, r.n_risk
    assert out[-1].d_churned == 0  # censoring, not churn


@given(
    counts=st.lists(st.integers(min_value=1, max_value=40), min_size=5, max_size=12)
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_acf_bounded_and_lag_count(spark, counts):
    """|ACF(k)| ≤ 1 (Cauchy–Schwarz) for any daily-count series, and
    the three lag rows always exist with the right n_days."""
    from big_data_trend_analysis_spark.operators.drift import autocorr_daily

    rows, eid = [], 0
    for d, n in enumerate(counts):
        for _ in range(n):
            rows.append(
                (eid, datetime.datetime(2024, 1, d + 1), 1, "view", 1.0, "{}")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.lag: r for r in autocorr_daily(ev).collect()}
    assert set(out) == {1, 2, 3}
    for r in out.values():
        assert r.n_days == len(counts)
        if r.acf is not None:  # constant series -> 0/0 -> NULL
            assert abs(r.acf) <= 1.0 + 1e-6


@given(
    n_docs=st.integers(min_value=1, max_value=60),
    cap=st.integers(min_value=1, max_value=25),
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cap_per_key_partition(spark, n_docs, cap):
    """kept + dropped = total and kept = min(cap, total) for any corpus
    size and cap."""
    from big_data_trend_analysis_spark.operators.textstats import cap_per_key

    df = spark.createDataFrame(
        [(i, "t", "en", "s", 1) for i in range(n_docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = cap_per_key(df, max_per_key=cap).collect()[0]
    assert r.n_kept == min(cap, n_docs)
    assert r.n_kept + r.n_dropped == n_docs == r.n_docs


@given(
    pre=st.integers(min_value=2, max_value=20),
    post=st.integers(min_value=25, max_value=60),
    split=st.integers(min_value=3, max_value=9),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cusum_localizes_any_clean_level_shift(spark, pre, post, split):
    """For a two-level series with a clear shift at day `split`, the
    CUSUM argmax must land exactly on the last pre-shift day and the
    change must be flagged (the contrast here is always far above the
    1.358 Brownian-bridge critical value)."""
    from big_data_trend_analysis_spark.operators.drift import changepoint_cusum

    n_days = 12
    counts = [pre] * split + [post] * (n_days - split)
    rows, eid = [], 0
    for d, n in enumerate(counts):
        for _ in range(n):
            rows.append(
                (eid, datetime.datetime(2024, 1, d + 1), 1, "view", 1.0, "{}")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = changepoint_cusum(ev).collect()[0]
    assert r.cp_day == datetime.datetime(2024, 1, split)
    assert r.is_change


@given(
    slope=st.integers(min_value=1, max_value=9),
    outlier=st.integers(min_value=200, max_value=900),
    pos=st.integers(min_value=0, max_value=6),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_theil_sen_breaks_down_gracefully(spark, slope, outlier, pos):
    """One arbitrary outlier day injected into a perfect linear series
    must leave the Theil-Sen slope EXACTLY at the true slope (the
    estimator's 29% breakdown point, exercised at 1/7 contamination)."""
    from big_data_trend_analysis_spark.operators.trend import theil_sen_slope

    counts = [1 + slope * d for d in range(7)]
    counts[pos] += outlier
    rows, eid = [], 0
    for d, n in enumerate(counts):
        for _ in range(n):
            rows.append(
                (eid, datetime.datetime(2024, 1, d + 1), 1, "view", 1.0, "{}")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = theil_sen_slope(ev).collect()[0]
    assert r.sen_slope == float(slope)


@SETTINGS
@given(
    base=st.lists(
        st.integers(min_value=0, max_value=50), min_size=3, max_size=25
    ),
    cur=st.lists(
        st.integers(min_value=0, max_value=50), min_size=3, max_size=25
    ),
)
def test_mann_whitney_invariant_under_monotone_transform(spark, base, cur):
    """U is a rank statistic: any strictly increasing value transform
    must leave (u_stat, z_score) exactly unchanged."""
    from big_data_trend_analysis_spark.operators.drift import mann_whitney_u

    def frame(xform):
        rows = [
            (i, datetime.datetime(2024, 1, 5), "t", float(xform(v)))
            for i, v in enumerate(base)
        ] + [
            (1000 + i, datetime.datetime(2024, 1, 20), "t", float(xform(v)))
            for i, v in enumerate(cur)
        ]
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string, value double"
        )

    r1 = mann_whitney_u(frame(lambda v: v)).collect()[0]
    r2 = mann_whitney_u(frame(lambda v: 3 * v + 7)).collect()[0]
    assert (r1.u_stat, r1.z_score) == (r2.u_stat, r2.z_score)
    assert (r1.n_base, r1.n_cur) == (len(base), len(cur))
    # U is bounded by n1·n2 and symmetric around its mean
    assert 0.0 <= r1.u_stat <= len(base) * len(cur)


@SETTINGS
@given(n_tokens=st.integers(min_value=1, max_value=300))
def test_doc_chunking_tiles_every_length(spark, n_tokens):
    """Chunks start at 0, step by the stride, end exactly at the last
    token, and only the final chunk may be short."""
    from big_data_trend_analysis_spark.operators.textstats import doc_chunking

    text = " ".join(f"t{i}" for i in range(n_tokens))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = sorted(doc_chunking(docs).collect(), key=lambda r: r.chunk_id)
    assert chunks[0].start_tok == 0
    assert [c.start_tok for c in chunks] == [i * 48 for i in range(len(chunks))]
    assert chunks[-1].start_tok + chunks[-1].n_tok == n_tokens
    for c in chunks[:-1]:
        assert c.n_tok == 64
    # full coverage: the union of [start, start+n_tok) tiles [0, n)
    covered = set()
    for c in chunks:
        covered.update(range(c.start_tok, c.start_tok + c.n_tok))
    assert covered == set(range(n_tokens))


@SETTINGS
@given(
    groups=st.lists(
        st.lists(st.integers(min_value=0, max_value=40), min_size=2, max_size=12),
        min_size=2,
        max_size=4,
    )
)
def test_kruskal_invariant_under_monotone_transform(spark, groups):
    """H is a rank statistic: a strictly increasing transform of the
    values leaves it exactly unchanged, and H ≥ 0 always."""
    from big_data_trend_analysis_spark.operators.drift import kruskal_wallis

    def frame(xform):
        rows = []
        eid = 0
        for g, vals in enumerate(groups):
            for v in vals:
                rows.append(
                    (eid, datetime.datetime(2024, 1, 5), f"g{g}",
                     float(xform(v)))
                )
                eid += 1
        return spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, event_type string, value double",
        )

    r1 = kruskal_wallis(frame(lambda v: v)).collect()
    r2 = kruskal_wallis(frame(lambda v: 5 * v + 11)).collect()
    h1 = {r.event_type: (r.h_stat, r.rank_sum) for r in r1}
    h2 = {r.event_type: (r.h_stat, r.rank_sum) for r in r2}
    assert h1 == h2
    for r in r1:
        assert r.h_stat is None or r.h_stat >= 0.0


@SETTINGS
@given(
    counts=st.lists(
        st.integers(min_value=0, max_value=30), min_size=3, max_size=14
    )
)
def test_isotonic_fit_is_idempotent_monotone_mean_preserving(spark, counts):
    """PAVA invariants on arbitrary series: the fit is non-decreasing,
    preserves the sum (up to the 1e-6 quantization), and re-fitting a
    fitted (already monotone) series is the identity."""
    from big_data_trend_analysis_spark.operators.trend import (
        isotonic_daily_fit,
    )

    def frame(vals):
        rows = []
        eid = 0
        for d, c in enumerate(vals):
            for _ in range(c):
                rows.append(
                    (eid, datetime.datetime(2024, 1, 1 + d), "t")
                )
                eid += 1
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string"
        )

    # days with zero events vanish from the rollup — mirror that in
    # the expected series
    present = [c for c in counts if c > 0]
    if not present:
        assert isotonic_daily_fit(frame(counts)).collect() == []
        return
    out = sorted(
        isotonic_daily_fit(frame(counts)).collect(), key=lambda r: r.day
    )
    fits = [r.fit for r in out]
    assert [r.y for r in out] == present
    assert all(a <= b for a, b in zip(fits, fits[1:]))
    assert sum(fits) == pytest.approx(sum(present), abs=1e-4 * len(present))
    # idempotence: feed the (rounded-to-int-scale) fit back — a
    # monotone series must come back unchanged
    refit_in = [round(f * 4) for f in fits]  # keep integers, preserve order
    assert all(a <= b for a, b in zip(refit_in, refit_in[1:]))
    refit = sorted(
        isotonic_daily_fit(frame(refit_in)).collect(), key=lambda r: r.day
    )
    kept = [c for c in refit_in if c > 0]
    assert [r.fit for r in refit] == [float(c) for c in kept]


@SETTINGS
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=50), min_size=2, max_size=20
    ),
    split=st.integers(min_value=1, max_value=19),
)
def test_permutation_p_value_bounds(spark, vals, split):
    """The add-one randomization p is always in (0, 1], and the
    observed difference matches the exact slice means."""
    from big_data_trend_analysis_spark.operators.drift import (
        permutation_test_mean,
    )

    split = min(split, len(vals) - 1)
    base, cur = vals[:split], vals[split:]
    rows = [
        (i, datetime.datetime(2024, 1, 5), "t", float(v))
        for i, v in enumerate(base)
    ] + [
        (1000 + i, datetime.datetime(2024, 1, 20), "t", float(v))
        for i, v in enumerate(cur)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    r = permutation_test_mean(df).collect()[0]
    assert 0.0 < r.p_value <= 1.0
    assert r.n_extreme <= r.n_perms <= 100
    expect = round(
        sum(base) / len(base) - sum(cur) / len(cur), 6
    )
    assert r.diff_obs == pytest.approx(expect, abs=2e-6)
