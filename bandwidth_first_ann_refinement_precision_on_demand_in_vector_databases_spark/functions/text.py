"""Text-analysis Column expressions for the training-data pipeline
surface (SURVEY §2.7 extension; north-star LLM-pipeline ops).

The reference has no text processing (`ANNCode.py` is numeric only);
these operators are the additive scope SURVEY §2.7/§7-M5 declares for
the 100 TB document pipeline: token counting, quality scoring,
language-ID heuristics, and rolling-hash fingerprints.

Design rules:

* Pure Column expressions — no Python UDFs — so the whole text path
  stays inside Catalyst/whole-stage codegen and scans stay prunable.
* Every function has an exact DuckDB twin (see ``registry_text``):
  the polynomial hash is a strict left fold over codepoints that both
  engines evaluate identically (verified: ``H("key agg row scan") ==
  476181683`` on both).
* All shared constants live here so Spark and SQL sides can't drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31−1: modulus for every polynomial/affine hash.
HASH_P = 2_147_483_647
#: polynomial base / seed for the rolling hash.
HASH_BASE = 31
HASH_SEED = 7

#: language marker words for the n-gram/stopword language-ID heuristic.
#: Deterministic scoring function — the fixture `lang` labels are
#: synthetic, so the contract is "both engines compute the same score",
#: not "recovers the label".
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "value"),
    "de": ("der", "die", "und", "ein", "wert"),
    "es": ("el", "la", "y", "de", "valor"),
    "fr": ("le", "la", "et", "un", "valeur"),
}

#: stopwords for the quality-score ratio (drawn from the fixture vocab).
STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is", "it")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.lower(_c(text)), r"\s+")


def regex_tokens(text: Column | str) -> Column:
    """BPE-ish tokenizer: maximal runs of letters or of digits, so
    ``"abc123"`` → ``["abc", "123"]`` — the coarse analog of byte-pair
    pretokenization rules."""
    return F.regexp_extract_all(F.lower(_c(text)), F.lit(r"[a-z]+|[0-9]+"), 0)


def token_count(text: Column | str) -> Column:
    return F.size(regex_tokens(text))


def poly_hash(str_col: Column) -> Column:
    """Rolling polynomial hash of a string: strict left fold
    ``h ← (h·31 + codepoint) mod (2³¹−1)`` seeded with 7. Matches the
    DuckDB ``list_reduce`` twin exactly (both BIGINT arithmetic).

    ``H("") = seed`` by definition: splitting "" yields ``[""]`` on
    both engines but they fabricate *different* codepoints for the
    empty string (Spark ``ascii``→0, DuckDB ``unicode``→−1), so the
    empty case is pinned explicitly on both sides."""
    fold = F.aggregate(
        F.transform(F.split(str_col, ""), lambda ch: F.ascii(ch).cast("bigint")),
        F.lit(HASH_SEED).cast("bigint"),
        lambda h, cp: (h * F.lit(HASH_BASE) + cp) % F.lit(HASH_P),
    )
    return F.when(F.length(str_col) == 0, F.lit(HASH_SEED).cast("bigint")).otherwise(fold)


def fingerprint(text: Column | str) -> Column:
    """Whole-document rolling-hash fingerprint."""
    return poly_hash(F.lower(_c(text)))


def min_token_fingerprint(text: Column | str) -> Column:
    """Winnowing-style robust fingerprint: the minimum token hash —
    stable under token reordering and small edits."""
    return F.array_min(F.transform(tokens(text), poly_hash))


def word_shingles(toks: Column, n: int) -> Column:
    """Distinct word n-gram shingles (space-joined). Documents shorter
    than ``n`` tokens yield an empty array (not a reversed sequence —
    Spark's ``sequence(1, 0)`` counts down, so it must be guarded).

    Built as an n-way zip of shifted slices, NOT per-index
    ``element_at`` inside a ``transform`` lambda: expressions inside a
    lambda are re-evaluated per element, so when ``toks`` is an inline
    ``split(...)`` the old form re-ran the regex split O(n) times per
    shingle — O(n²) splits per document (measured 5.4s vs 0.2s just
    building bigrams over 5000 docs). Callers should still prefer
    projecting the token array once (see ``dedup.shingle_index``);
    this form keeps even un-projected callers O(n)."""
    win = F.size(toks) - F.lit(n - 1)
    joined = F.slice(toks, 1, win)
    for j in range(1, n):
        joined = F.zip_with(
            joined,
            F.slice(toks, j + 1, win),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(F.size(toks) >= n, F.array_distinct(joined)).otherwise(
        F.array().cast("array<string>")
    )


def stopword_ratio(toks: Column) -> Column:
    stops = F.array(*[F.lit(w) for w in STOPWORDS])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def distinct_token_ratio(toks: Column) -> Column:
    """1.0 = no repetition; low values flag boilerplate/spam."""
    return F.size(F.array_distinct(toks)).cast("double") / F.greatest(
        F.size(toks), F.lit(1)
    ).cast("double")


def mean_token_len(toks: Column) -> Column:
    total = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def alpha_ratio(text: Column | str) -> Column:
    """Fraction of characters that are letters or spaces (the
    complement counts digits/punctuation — a classic quality signal)."""
    t = F.lower(_c(text))
    kept = F.length(F.regexp_replace(t, r"[^a-z ]", ""))
    return kept.cast("double") / F.greatest(F.length(t), F.lit(1)).cast("double")


def quality_score(text: Column | str) -> Column:
    """Composite document-quality heuristic in [0, 1]:
    mean of (length-in-range, alpha ratio, lexical diversity,
    bounded stopword presence). Deterministic, both-engine exact."""
    t = _c(text)
    toks = tokens(t)
    len_ok = F.when(
        (F.size(toks) >= 10) & (F.size(toks) <= 1000), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    stop_ok = F.least(stopword_ratio(toks) * F.lit(4.0), F.lit(1.0))
    return (len_ok + alpha_ratio(t) + distinct_token_ratio(toks) + stop_ok) / F.lit(4.0)


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language marker-hit ratio (language-ID heuristic)."""
    toks = tokens(text)
    out: dict[str, Column] = {}
    for lang, markers in LANG_MARKERS.items():
        marks = F.array(*[F.lit(w) for w in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(marks, t)))
        out[lang] = hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast(
            "double"
        )
    return out


def predicted_lang(text: Column | str) -> Column:
    """argmax over ``lang_scores`` with deterministic lexicographic
    first-match tie-break; 'und' (undetermined) when every score is
    zero. Realized as a CASE chain so the DuckDB oracle is literal."""
    scores = lang_scores(text)
    mx = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(scores[lang] == mx, F.lit(lang)).otherwise(pred)
    return F.when(mx > 0, pred).otherwise(F.lit("und"))


# --------------------------------------------------------------------------
# PII scrubbing (curation-stage redaction). The patterns are the
# Java-regex ∩ RE2 common subset, so Spark (java.util.regex) and the
# DuckDB oracle (RE2) match byte-identically; kept deliberately simple
# — production scrubbers layer many more patterns on the same
# map-side regexp_replace shape.
# --------------------------------------------------------------------------

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE_RE = r"\b555-[0-9]{4}\b"

#: replacement order matters: emails first (their local parts contain
#: digits an IP pattern could graze), then IPs, then phones — the
#: redaction markers themselves contain no digits so later passes
#: cannot re-match earlier replacements.
PII_RULES: tuple[tuple[str, str], ...] = (
    (PII_EMAIL_RE, "<EMAIL>"),
    (PII_IPV4_RE, "<IP>"),
    (PII_PHONE_RE, "<PHONE>"),
)


def pii_redact(text: Column | str) -> Column:
    """Apply every ``PII_RULES`` pattern in order — one map-side
    codegen'd regexp_replace chain, no shuffle, no Python."""
    out = _c(text)
    for pat, marker in PII_RULES:
        out = F.regexp_replace(out, pat, marker)
    return out
