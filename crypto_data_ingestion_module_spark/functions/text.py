"""Text-analysis column expressions (north-star X4): tokenization, quality
scoring, language-ID scoring, fingerprinting.

All pure ``pyspark.sql.functions`` — JVM-side, codegen-friendly, and each
has an exact ANSI-SQL twin for the DuckDB oracle (ASCII-class regexes only,
so Java regex and RE2 agree).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish token pattern: runs of alphanumerics OR single punctuation marks.
TOKEN_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"
WORD_PATTERN = r"[A-Za-z0-9]+"
PUNCT_PATTERN = r"[^A-Za-z0-9\s]"

#: small English stopword set for quality ratios (ASCII, both-engine safe).
STOPWORDS = ("the", "a", "of", "and", "in", "to", "is", "it", "on", "for")

#: per-language marker words for the n-gram/keyword lang-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "with"),
    "de": ("der", "die", "das", "und", "nicht"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "que", "es"),
    "zh": ("de", "shi", "bu", "le", "zai"),  # pinyin-romanized markers
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def words(col: Column | str) -> Column:
    return F.regexp_extract_all(_c(col), F.lit(WORD_PATTERN), F.lit(0))


def word_count(col: Column | str) -> Column:
    return F.size(words(col)).cast("long")


def token_count(col: Column | str) -> Column:
    """BPE-ish token count: alnum runs + individual punctuation marks."""
    return F.size(
        F.regexp_extract_all(_c(col), F.lit(TOKEN_PATTERN), F.lit(0))
    ).cast("long")


def punct_count(col: Column | str) -> Column:
    return F.size(
        F.regexp_extract_all(_c(col), F.lit(PUNCT_PATTERN), F.lit(0))
    ).cast("long")


def char_count(col: Column | str) -> Column:
    return F.length(_c(col)).cast("long")


def alnum_char_count(col: Column | str) -> Column:
    """Total characters inside word tokens (for mean word length)."""
    return F.length(F.array_join(words(col), "")).cast("long")


def marker_count(col: Column | str, markers: tuple[str, ...]) -> Column:
    """Occurrences of any marker word (word-boundary match, lowercased)."""
    pat = r"\b(" + "|".join(markers) + r")\b"
    return F.size(
        F.regexp_extract_all(F.lower(_c(col)), F.lit(pat), F.lit(0))
    ).cast("long")


def stopword_count(col: Column | str) -> Column:
    return marker_count(col, STOPWORDS)


def normalize_ws(col: Column | str) -> Column:
    """Canonical form: lowercase, collapse whitespace runs, trim."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 hex of the normalized text
    (lowercase hex in Spark and DuckDB alike)."""
    return F.md5(F.encode(normalize_ws(col), "UTF-8"))


def quality_score(col: Column | str) -> Column:
    """Heuristic quality in [0,1]: length band + stopword presence −
    punctuation excess.  Integer counts → double arithmetic, so the score
    is bit-identical across engines.
    """
    n = char_count(col).cast("double")
    wc = word_count(col).cast("double")
    sw = stopword_count(col).cast("double")
    pc = punct_count(col).cast("double")
    length_component = F.least(n / F.lit(200.0), F.lit(1.0)) * 0.4
    stop_component = F.least(sw / F.greatest(wc, F.lit(1.0)) * F.lit(5.0), F.lit(1.0)) * 0.3
    word_component = F.least(wc / F.lit(40.0), F.lit(1.0)) * 0.3
    punct_penalty = F.least(pc / F.greatest(n, F.lit(1.0)) * F.lit(2.0), F.lit(0.5))
    return F.greatest(
        length_component + stop_component + word_component - punct_penalty,
        F.lit(0.0),
    )


def oracle_quality_sql(text: str = "text") -> str:
    """DuckDB twin of quality_score (same ops, same constants)."""
    n = f"CAST(length({text}) AS DOUBLE)"
    wc = f"CAST(len(regexp_extract_all({text}, '{WORD_PATTERN}')) AS DOUBLE)"
    sw = (
        f"CAST(len(regexp_extract_all(lower({text}),"
        f" '\\b({'|'.join(STOPWORDS)})\\b')) AS DOUBLE)"
    )
    pc = f"CAST(len(regexp_extract_all({text}, '[^A-Za-z0-9\\s]')) AS DOUBLE)"
    return (
        f"greatest(least({n} / 200.0, 1.0) * 0.4"
        f" + least({sw} / greatest({wc}, 1.0) * 5.0, 1.0) * 0.3"
        f" + least({wc} / 40.0, 1.0) * 0.3"
        f" - least({pc} / greatest({n}, 1.0) * 2.0, 0.5), 0.0)"
    )


# -- PII redaction (training-data hygiene) ----------------------------------
# ASCII-class patterns only, no lookaround, so Java regex (Spark) and RE2
# (DuckDB) match identically.  Order matters: emails first (an address
# contains digit runs a phone pattern could claim), then IPs, then phones.

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_PATTERN = r"\+[0-9][0-9() -]{6,}[0-9]"

_PII_STEPS = (
    (EMAIL_PATTERN, "<EMAIL>"),
    (IPV4_PATTERN, "<IP>"),
    (PHONE_PATTERN, "<PHONE>"),
)


def pii_redact(col: Column | str) -> Column:
    """Mask emails, IPv4 addresses, and international-format phone numbers
    with typed placeholders."""
    out = _c(col)
    for pat, token in _PII_STEPS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(col: Column | str) -> tuple[Column, Column, Column]:
    """(n_emails, n_ips, n_phones) detected — audit metrics emitted
    alongside the redacted text."""
    c = _c(col)
    return (
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_PATTERN), F.lit(0))).cast("long"),
        F.size(F.regexp_extract_all(c, F.lit(IPV4_PATTERN), F.lit(0))).cast("long"),
        F.size(F.regexp_extract_all(c, F.lit(PHONE_PATTERN), F.lit(0))).cast("long"),
    )


def oracle_pii_redact_sql(text: str = "text") -> str:
    """DuckDB twin of pii_redact (same patterns, same order; 'g' flag —
    DuckDB replaces first-match-only by default, Spark replaces all)."""
    out = text
    for pat, token in _PII_STEPS:
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out


# --------------------------------------------------------------------------
# Hashed linear classifier inference (r12, X4): the fastText-style
# "run the quality model AT the data" primitive.  A linear model over
# hashed token features needs no model server: weights are a pure
# function of the bucket id (here md5-derived integers in [-1000,
# 1000], standing in for trained weights shipped as a broadcast
# VALUES table), so inference is hash → weight → per-doc SUM — one
# map-side-combined aggregate over the token stream, no shuffle
# beyond the doc key, no UDF, and every step has an exact DuckDB
# twin (the hashed_doc_similarity md5 idiom).  All-integer margins:
# |w| ≤ 1000 bounds |score| ≤ 1000·n_tokens, so the normalized
# quality is (score + 1000·n) DIV (2000·n) in ppm — nonnegative
# operands only (Spark DIV truncates toward zero while DuckDB //
# floors; they agree only on nonnegative ints).
# --------------------------------------------------------------------------

#: weight-table seed tag: a different tag IS a different model.
LINEAR_MODEL_TAG = "qw1"


def hashed_token_bucket(tok: Column | str, n_buckets: int) -> Column:
    """md5 feature-hash bucket, engine-identical (15 hex chars < 2^60
    keeps the parse positive in both engines)."""
    th = F.conv(F.substring(F.md5(_c(tok)), 1, 15), 16, 10).cast("long")
    return F.pmod(th, F.lit(n_buckets)).cast("int")


def hashed_bucket_weight(bucket: Column, tag: str = LINEAR_MODEL_TAG) -> Column:
    """Deterministic integer weight in [-1000, 1000] for a feature
    bucket — md5 of ``tag:bucket``.  Replace with a join against a
    trained weight table to ship a real model; the inference plan
    shape is identical."""
    wh = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{tag}:"), bucket.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return (F.pmod(wh, F.lit(2001)) - F.lit(1000)).cast("long")


def oracle_hashed_weight_sql(bucket: str, tag: str = LINEAR_MODEL_TAG) -> str:
    """DuckDB twin of hashed_bucket_weight."""
    return (
        f"(CAST(('0x' || substr(md5('{tag}:' || CAST({bucket} AS VARCHAR)),"
        f" 1, 15)) AS BIGINT) % 2001 - 1000)"
    )


# -- quantized profile features (linear-model feature engineering) ----------
# One-hot band features over the document's shape statistics — the
# signals the quality heuristic reads (length, word count, punctuation
# ratio, stopword ratio), quantized to small integer bands so a LINEAR
# model can fit a sum of banded functions of them.  Band ids live ABOVE
# the token-hash bucket range (base = n_buckets), so a model can mix
# hashed-token and profile features in one weight table without
# collisions.  Banding is floor division on nonnegative counts: DuckDB
# runs integer //; Spark runs floor(a / b) in doubles, which equals the
# integer floor here because IEEE division is correctly rounded and at
# these magnitudes (a < 2^40, b <= 40) a misrounding across an integer
# boundary would require the true quotient within half an ulp of an
# integer — impossible for integer operands this small unless the
# division is exact.  So the feature frame is bit-identical across
# engines.

#: band layout (offsets from base): 16 length bands, 16 word-count
#: bands, 16 punctuation-ratio bands (ratio in twentieths), 10
#: stopword-ratio bands (ratio in tenths).
PROFILE_BANDS = 58


def profile_feature_buckets(col: Column | str, base: int) -> Column:
    """Array of 4 one-hot band feature ids for a document."""
    cc = char_count(col)
    wc = word_count(col)
    pc = punct_count(col)
    sw = stopword_count(col)
    one = F.greatest(cc, F.lit(1))  # never 0 together with a nonzero pc
    wone = F.greatest(wc, F.lit(1))
    return F.array(
        F.lit(base) + F.least(F.floor(cc / F.lit(40)), F.lit(15)),
        F.lit(base + 16) + F.least(F.floor(wc / F.lit(8)), F.lit(15)),
        F.lit(base + 32) + F.least(F.floor(pc * 20 / one), F.lit(15)),
        F.lit(base + 48) + F.least(F.floor(sw * 10 / wone), F.lit(9)),
    )


def oracle_profile_buckets_sql(text: str, base: int) -> str:
    """DuckDB twin of profile_feature_buckets: a LIST expression to
    unnest (same bands, same floor math)."""
    cc = f"length({text})"
    wc = f"len(regexp_extract_all({text}, '{WORD_PATTERN}'))"
    pc = f"len(regexp_extract_all({text}, '[^A-Za-z0-9\\s]'))"
    sw = (
        f"len(regexp_extract_all(lower({text}),"
        f" '\\b({'|'.join(STOPWORDS)})\\b'))"
    )
    return (
        f"[{base} + least({cc} // 40, 15),"
        f" {base + 16} + least({wc} // 8, 15),"
        f" {base + 32} + least(({pc} * 20) // greatest({cc}, 1), 15),"
        f" {base + 48} + least(({sw} * 10) // greatest({wc}, 1), 9)]"
    )
