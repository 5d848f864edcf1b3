"""Text-analysis functions for training-data pipelines — native expressions.

These are extension operators beyond the reference's surface
(BASELINE.json north star): language-ID heuristic, quality scoring,
token counting, shingling, document fingerprinting. Everything stays
JVM-side; regex character classes are written ASCII-explicit so Java and
RE2 (DuckDB oracle) agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ASCII-explicit "BPE-ish" token pattern: word runs or single non-space
# symbols (CJK chars each count as one token — the right bias for
# token-budget estimation).
TOKEN_PATTERN = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"

# Distinctive function words per language, padded with spaces so matches
# are whole-word. Kept tiny on purpose: this is a scalable heuristic, not
# a classifier.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": (" the ", " and ", " of "),
    "de": (" der ", " und ", " die "),
    "es": (" el ", " que ", " los "),
    "fr": (" le ", " les ", " est "),
}
CJK_PATTERN = "[\\u4e00-\\u9fff]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalized_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, whitespace collapsed."""
    return F.regexp_replace(F.lower(F.trim(_c(text))), r"\s+", " ")


def doc_fingerprint(text: Column | str) -> Column:
    """Deterministic content fingerprint = md5 of the normalized text.
    Stable across engines (md5 is md5), so usable as an exact-dedup key
    that survives whitespace/case perturbations."""
    return F.md5(normalized_text(text))


def token_count(text: Column | str) -> Column:
    """Token-budget estimate with the BPE-ish pattern."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(TOKEN_PATTERN), 0))


def whitespace_token_count(text: Column | str) -> Column:
    t = F.trim(_c(text))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def occurrence_count(text: Column | str, needle: str) -> Column:
    """Count non-overlapping occurrences of a literal substring via
    length arithmetic — identical semantics in any engine."""
    t = _c(text)
    return (F.length(t) - F.length(F.replace(t, F.lit(needle), F.lit("")))) / F.lit(len(needle))


def lang_marker_hits(text: Column | str) -> dict[str, Column]:
    """Whole-word marker hits per language over ' '+lower(text)+' '."""
    padded = F.concat(F.lit(" "), F.lower(_c(text)), F.lit(" "))
    return {
        lang: sum(
            (occurrence_count(padded, m) for m in markers), start=F.lit(0.0)
        ).cast("int")
        for lang, markers in LANG_MARKERS.items()
    }


def cjk_char_count(text: Column | str) -> Column:
    return F.length(F.regexp_replace(_c(text), f"[^{CJK_PATTERN[1:-1]}]", ""))


def lang_id(text: Column | str) -> Column:
    """Heuristic language guess: CJK presence -> zh, else argmax marker
    hits with fixed precedence en > de > es > fr (deterministic ties),
    'und' (undetermined) when nothing matches."""
    hits = lang_marker_hits(text)
    en, de, es, fr = hits["en"], hits["de"], hits["es"], hits["fr"]
    best = F.greatest(en, de, es, fr)
    return (
        F.when(cjk_char_count(text) > 0, F.lit("zh"))
        .when(best <= 0, F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(de == best, F.lit("de"))
        .when(es == best, F.lit("es"))
        .otherwise(F.lit("fr"))
    )


def quality_features(text: Column | str) -> dict[str, Column]:
    """Cheap quality signals: length, token stats, symbol/digit/upper
    ratios, stopword ratio. Each is a single division over exact integer
    counts (cross-engine deterministic)."""
    t = _c(text)
    n_chars = F.length(t)
    n_tokens = whitespace_token_count(t)
    nz = F.when(n_chars > 0, n_chars.cast("double"))  # NULL-safe denominators
    tz = F.when(n_tokens > 0, n_tokens.cast("double"))
    n_digits = F.length(F.regexp_replace(t, "[^0-9]", ""))
    n_upper = F.length(F.regexp_replace(t, "[^A-Z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,!?;:]", ""))
    n_stop = lang_marker_hits(t)["en"]
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "digit_ratio": n_digits / nz,
        "upper_ratio": n_upper / nz,
        "punct_ratio": n_punct / nz,
        "stopword_ratio": n_stop / tz,
        "avg_token_len": n_chars.cast("double") / tz,
    }


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """k-word shingles of the lowercased, whitespace-split text; empty
    array when the document has fewer than k tokens.

    Built as a zip_with fold over k shifted slices — NOT a transform
    whose lambda indexes the token array: interpreted higher-order
    functions do no common-subexpression sharing, so ``element_at(
    split(...), i)`` inside the lambda re-ran the whole split per
    element per reference (O(k·T) splits of an O(T) array = O(T²) per
    doc — the PQ staged-normalize lesson). Slices evaluate the split
    once per ROW; the concat fold is O(k) per shingle. Same strings,
    same order, measured ~9x faster on the sf1 winnowing probe."""
    tokens = F.split(F.lower(F.trim(_c(text))), r"\s+")
    n = F.size(tokens)
    cnt = n - (k - 1)
    sh = F.slice(tokens, 1, cnt)
    for j in range(1, k):
        sh = F.zip_with(
            sh,
            F.slice(tokens, j + 1, cnt),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(n >= k, sh).otherwise(F.array().cast("array<string>"))
