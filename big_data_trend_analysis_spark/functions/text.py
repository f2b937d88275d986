"""Text-analysis column expressions (tokenization, lang-ID, quality).

The reference tokenizes by whitespace on the driver after a collect()
(``processing/cms_stream.py:94-97``) — the single biggest scale defect
in the reference. Here tokenization is ``split()``/``explode()``:
distributed, codegen'd, shuffle-free until an aggregation asks for one.

The LLM-pipeline additions (language-ID heuristic, quality scoring,
token counting, fingerprinting) are likewise pure column expressions so
they run at full scan speed over 100 TB of documents — no Python in the
hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Small, fixed English stopword list used by the lang-ID / quality
#: heuristics. Deliberately tiny & frozen: it is part of the declared
#: semantics (the DuckDB oracle embeds the same list).
EN_STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "by", "at", "from", "that", "this", "be",
)

#: Word-ish token pattern shared with the oracle (ASCII alpha runs or
#: digit runs — deliberately regex-dialect-neutral between Java regex
#: and RE2-style engines).
WORD_TOKEN_RE = "[A-Za-z]+|[0-9]+"


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (reference A4 semantics: ``str.split(' ')``)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def n_tokens(text: Column | str) -> Column:
    """Whitespace token count as a long."""
    return F.size(tokens(text)).cast("long")


def n_word_tokens(text: Column | str) -> Column:
    """BPE-ish token count: number of WORD_TOKEN_RE matches."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(WORD_TOKEN_RE), 0)).cast("long")


def stopword_ratio(text: Column | str) -> Column:
    """Fraction of whitespace tokens that are EN stopwords (double)."""
    toks = tokens(text)
    stop = F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))
    return F.size(stop).cast("double") / F.size(toks).cast("double")


def lang_id_en(text: Column | str, threshold: float = 0.08) -> Column:
    """Heuristic language-ID: 'en' if stopword ratio ≥ threshold.

    A deliberately simple, deterministic n-gram-free heuristic (the
    container has no langdetect/fasttext); the point is the *shape* —
    a scan-speed classifier column a 100 TB filter can push on.
    """
    return F.when(stopword_ratio(text) >= F.lit(threshold), F.lit("en")).otherwise(
        F.lit("other")
    )


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic for training-data filtering.

    mean of three bounded signals: length score (chars/500 capped at 1),
    mean-token-length score (len/8 capped at 1), stopword score
    (ratio/0.2 capped at 1). Pure arithmetic — oracle-expressible.
    """
    c = F.col(text) if isinstance(text, str) else text
    len_score = F.least(F.length(c).cast("double") / F.lit(500.0), F.lit(1.0))
    mean_tok = F.length(c).cast("double") / n_tokens(c).cast("double")
    tok_score = F.least(mean_tok / F.lit(8.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(c) / F.lit(0.2), F.lit(1.0))
    return (len_score + tok_score + stop_score) / F.lit(3.0)


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of lowercased text.

    md5 is available verbatim in both Spark and DuckDB, which makes the
    fingerprint an oracle-checkable exact-dedup key. (Near-dup
    fingerprints — MinHash/SimHash — live in ``operators/dedup.py``.)
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.lower(c))


#: Per-language function-word profiles for multi-class language ID.
#: Small closed-class word sets (the most frequent function words per
#: language) — the deterministic, dependency-free core of stopword-
#: profile language identification; fasttext/langdetect drop in at the
#: same call site when available.
LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the of and to in a is that it for was on are as with his they at be this".split()
    ),
    "es": frozenset(
        "de la que el en y a los del se las por un para con no una su al es".split()
    ),
    "fr": frozenset(
        "de la le et les des en un du une que est pour qui dans par sur au plus".split()
    ),
    "de": frozenset(
        "der die und in den von zu das mit sich des auf ist im dem nicht ein eine als".split()
    ),
}


def lang_id_multi(
    text: Column | str, threshold: float = 0.08
) -> Column:
    """Multi-class stopword-profile language ID ('en'/'es'/'fr'/'de'/'other').

    Scores each language as the fraction of whitespace tokens found in
    its function-word profile and picks the arg-max (ties break to the
    alphabetically smallest language code), defaulting to
    'other' below ``threshold``. Entirely row-local higher-order
    expressions — a scan-speed classifier column that composes with
    predicate pushdown, exactly like ``lang_id_en`` but multi-class.
    """
    toks = tokens(text)
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    # Tie-break: the struct carries an inverted-alphabetical integer
    # rank ahead of the code, so array_max's lexicographic struct order
    # resolves equal scores to the alphabetically SMALLEST code
    # ('de' < 'en' < 'es' < 'fr'), as the docstring promises.
    codes = sorted(LANG_PROFILES)
    scored = F.array(
        *[
            F.struct(
                (
                    F.size(
                        F.filter(toks, lambda t: t.isin(*sorted(LANG_PROFILES[code])))
                    )
                    / n
                ).alias("score"),
                F.lit(len(codes) - 1 - rank).alias("prio"),
                F.lit(code).alias("code"),
            )
            for rank, code in enumerate(codes)
        ]
    )
    best = F.array_max(scored)
    return F.when(
        best.getField("score") >= F.lit(threshold), best.getField("code")
    ).otherwise(F.lit("other"))


#: PII patterns (dialect-conservative Java regex): emails and URLs are
#: handled by clean_text; these add phone numbers, IPv4 addresses,
#: SSN-shaped and long-digit-run (card-shaped) sequences.
_PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b\d(?:[ -]?\d){12,15}\b", "<CARD>"),
    (r"(?:\+?\d{1,3}[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b", "<PHONE>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def mask_pii(text: Column | str) -> Column:
    """Replace PII-shaped substrings with typed placeholders.

    The redaction pass of training-data curation: SSN-shaped ids,
    card-shaped digit runs, phone numbers, and IPv4 addresses become
    ``<SSN>/<CARD>/<PHONE>/<IP>`` tokens via a chain of JVM-side
    ``regexp_replace`` calls (order matters: most-specific first so a
    card-shaped run is not half-eaten by the phone pattern). Pattern-
    based masking is a RECALL tool, not a guarantee — production adds
    NER-based detection on top (the spaCy hook in functions/nlp.py).
    """
    c = F.col(text) if isinstance(text, str) else text
    for pattern, token in _PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def url_normalize(url: Column | str) -> Column:
    """Canonicalize a URL for dedup/grouping (web-corpus curation).

    The normalization every crawl pipeline applies before URL-level
    dedup: lowercase scheme+host, drop the fragment, drop tracking
    parameters (``utm_*``, ``ref``), keep the remaining query in
    order, never emit a default port (``parse_url``'s HOST is already
    port-free). Pure JVM expressions (parse_url + regexp), scan-speed,
    and dialect-conservative so the oracle reproduces it with plain
    regex extraction.
    """
    c = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.parse_url(c, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(c, F.lit("HOST")))
    path = F.parse_url(c, F.lit("PATH"))
    query = F.parse_url(c, F.lit("QUERY"))
    query_clean = F.regexp_replace(
        F.coalesce(query, F.lit("")),
        "(^|&)(utm_[^=&]*|ref)=[^&]*",
        "",
    )
    query_clean = F.regexp_replace(query_clean, "^&", "")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query_clean != "", F.concat(F.lit("?"), query_clean)).otherwise(
            F.lit("")
        ),
    )
