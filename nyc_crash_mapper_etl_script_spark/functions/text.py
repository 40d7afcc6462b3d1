"""Text-analysis Column helpers (north-star extensions: language-ID,
quality scoring, token counting, fingerprinting).

All pure Column expressions -- at 100 TB these run inside whole-stage
codegen over the parquet scan with no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword marker sets for the n-gram/stopword
#: heuristic language ID.  Deliberately small and deterministic.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "nicht", "ist"],
    "fr": ["le", "la", "les", "est", "une"],
    "es": ["el", "los", "que", "es", "una"],
}

WORD_SPLIT = r"\s+"
#: BPE-ish token pattern: word pieces, numbers, or single non-space
#: punctuation -- approximates subword tokenizer counts.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/NULL."""
    t = F.trim(F.coalesce(text, F.lit("")))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, WORD_SPLIT)))


def bpe_ish_token_count(text: Column) -> Column:
    """Regex-extracted token count approximating a BPE tokenizer."""
    return F.size(
        F.filter(
            F.split(
                F.regexp_replace(F.coalesce(text, F.lit("")), f"({BPE_TOKEN_RE})", "$1\u001f"),
                "\u001f",
            ),
            lambda x: F.trim(x) != "",
        )
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are language markers."""
    words = F.split(F.lower(F.trim(text)), WORD_SPLIT)
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    hits = F.size(F.filter(words, lambda w: F.array_contains(markers, w)))
    return F.when(F.size(words) > 0, hits / F.size(words)).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    t = F.coalesce(text, F.lit(""))
    total = F.length(t)
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    return F.when(total > 0, punct.cast("double") / total).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punct +
    stopword presence (the classic C4/Gopher-style cheap filters)."""
    n = F.length(F.coalesce(text, F.lit("")))
    len_ok = F.when((n >= 50) & (n <= 20000), F.lit(1.0)).otherwise(
        F.when(n > 0, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    punct_ok = F.lit(1.0) - F.least(F.lit(1.0), punct_ratio(text) * 4)
    stop_ok = F.least(F.lit(1.0), stopword_ratio(text) * 10)
    # floor-truncation, not round: identical across engines even on
    # exactly-representable rounding boundaries
    return F.floor(((len_ok + punct_ok + stop_ok) / 3) * 10000) / 10000.0


def language_id(text: Column) -> Column:
    """Marker-count argmax language guess ('und' when no markers)."""
    words = F.split(F.lower(F.trim(F.coalesce(text, F.lit("")))), WORD_SPLIT)
    scores = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in markers])
        scores.append(
            F.struct(
                F.size(F.filter(words, lambda w: F.array_contains(arr, w))).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of
    whitespace-normalized lowercased text (rolling-hash analog;
    content-defined, order-sensitive)."""
    norm = F.regexp_replace(F.lower(F.trim(F.coalesce(text, F.lit("")))), r"\s+", " ")
    return F.md5(norm)


def shingles(text: Column, k: int = 5) -> Column:
    """Word k-shingles of normalized text (for MinHash / Jaccard).

    Built with sequence+transform (JVM-side), not a UDF.  The words
    array is bound as the lambda VARIABLE of an outer single-element
    transform, so the normalize+split+filter pipeline evaluates once
    per document: higher-order functions are CodegenFallback (no
    common-subexpression elimination), so naively referencing the
    words expression inside the per-shingle lambda re-runs the
    regexes for every shingle -- measured ~7x slower on real docs
    (O(words) regex passes instead of 1).
    """
    norm = F.regexp_replace(F.lower(F.trim(F.coalesce(text, F.lit("")))), r"\s+", " ")
    words_expr = F.filter(F.split(norm, " "), lambda w: w != "")

    def via(words):
        n = F.size(words)
        idx = F.when(n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))).otherwise(
            F.when(n > 0, F.sequence(F.lit(1), F.lit(1))).otherwise(
                F.array().cast("array<int>")
            )
        )
        return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, k)))

    return F.flatten(F.transform(F.array(words_expr), via))


#: PII patterns shared with the DuckDB oracle -- restricted to syntax
#: Java regex and RE2 interpret identically (no backrefs, no
#: lookaround, explicit classes).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"
PII_SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"


def pii_scrub(text: Column) -> Column:
    """Redact emails / phone numbers / SSN-shaped strings.

    Pure codegen regexp_replace cascade; the SSN pass runs before the
    phone pass because the phone pattern would half-match an SSN.
    Replacement tokens are distinct so downstream audits can count
    redaction kinds from the scrubbed text alone.
    """
    t = F.coalesce(text, F.lit(""))
    t = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    t = F.regexp_replace(t, PII_SSN_RE, "<SSN>")
    t = F.regexp_replace(t, PII_PHONE_RE, "<PHONE>")
    return t


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_ssns, n_phones) found in the raw text.  The phone
    count excludes SSN matches the same way the scrub cascade does:
    it counts on the SSN-scrubbed text."""
    t = F.coalesce(text, F.lit(""))
    no_ssn = F.regexp_replace(t, PII_SSN_RE, "<SSN>")
    return (
        F.regexp_count(t, F.lit(PII_EMAIL_RE)),
        F.regexp_count(t, F.lit(PII_SSN_RE)),
        F.regexp_count(no_ssn, F.lit(PII_PHONE_RE)),
    )
