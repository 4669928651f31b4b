"""Text-analysis column functions for training-data pipelines.

All pure JVM-side column expressions (no Python UDFs — these run inside
whole-stage codegen at 100 TB): tokenization, token/char stats,
stopword-based language ID, quality scoring, content fingerprinting.
Every function has an exact ANSI-SQL twin used by the DuckDB oracles in
``queries/llm.py``; cross-engine determinism comes from md5 (identical
everywhere) rather than engine-private hash functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# Tiny deterministic stopword sets — enough signal for a heuristic
# language guess; real pipelines would swap in fastText-style models via
# the same column interface.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit"],
    "es": ["el", "los", "las", "es", "un", "una", "y", "que"],
    "fr": ["le", "les", "et", "est", "une", "dans", "pour", "sur"],
}
LANG_PRIORITY = ["en", "de", "es", "fr"]  # deterministic tie-break order


def tokens(text: Column) -> Column:
    """Lowercased alnum tokens, empties dropped.

    PER-ROW REUSE CONTRACT (r14 optimization round): this split+filter
    is the engine's most-evaluated expression, and Catalyst does NOT
    common-subexpression-eliminate two separately-built ``tokens(text)``
    trees (each ``F.filter`` call mints fresh lambda-variable exprIds,
    so the subtrees are never ``semanticEquals``; higher-order functions
    are also CodegenFallback, outside codegen subexpr elimination).  A
    consumer that needs the token array MORE THAN ONCE per row must
    project it into a column first (``withColumn("_toks", tokens(...))``)
    and compute everything from the column — CollapseProject will not
    re-inline it because the array is referenced repeatedly and is not
    a cheap expression.  The ``*_of(toks)`` variants below exist for
    exactly that staging; measured on text_stats at sf0.1 the staged
    form is ~15% faster end-to-end (identical values)."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: F.length(t) > 0
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def whitespace_token_count(text: Column) -> Column:
    return F.size(F.filter(F.split(text, r"\s+"), lambda t: F.length(t) > 0))


def punct_char_count(text: Column) -> Column:
    """Non-alnum, non-whitespace character count (the punctuation term
    of the BPE estimate) — split out so token-staged callers can avoid
    re-tokenizing."""
    return F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))


def bpe_ish_token_count(text: Column) -> Column:
    """Approximate subword count: alnum runs + punctuation characters —
    the usual 'tokens ≈ words + punct' pre-tokenizer estimate."""
    return token_count(text) + punct_char_count(text)


def avg_token_len_of(toks: Column) -> Column:
    """``avg_token_len`` over a pre-projected token array."""
    return F.when(
        F.size(toks) > 0,
        F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x))
        / F.size(toks),
    ).otherwise(F.lit(0.0))


def avg_token_len(text: Column) -> Column:
    return avg_token_len_of(tokens(text))


def stopword_hits_of(distinct_toks: Column, lang: str) -> Column:
    """``stopword_hits`` over a pre-projected DISTINCT token array."""
    return F.size(
        F.array_intersect(
            distinct_toks,
            F.array(*[F.lit(w) for w in STOPWORDS[lang]]),
        )
    )


def stopword_hits(text: Column, lang: str) -> Column:
    """Number of DISTINCT stopwords of ``lang`` present."""
    return stopword_hits_of(F.array_distinct(tokens(text)), lang)


def language_guess_of(scores: dict[str, Column]) -> Column:
    """The ``language_guess`` CASE chain over pre-projected per-language
    score columns. The chain references each score up to |langs| times,
    so callers MUST pass plain column references (staged via
    ``withColumn``), not score expressions — see the ``tokens`` reuse
    contract."""
    expr = None
    for lang in LANG_PRIORITY:
        cond = scores[lang] > 0
        for other in LANG_PRIORITY:
            if other != lang:
                cond = cond & (scores[lang] >= scores[other])
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("unknown"))


def language_guess(text: Column) -> Column:
    """Argmax of stopword hits; ties and evaluation order follow
    LANG_PRIORITY (a first-match CASE chain — the SQL oracle is the
    same chain, so the semantics are identical by construction).

    NB: as a single expression this evaluates ``array_distinct(tokens)``
    once per score REFERENCE (~16× per row for 4 languages). Hot paths
    should stage the distinct-token column and the four score columns
    and call ``language_guess_of`` — queries/llm.q_language_id does."""
    scores = {lang: stopword_hits(text, lang) for lang in LANG_PRIORITY}
    return language_guess_of(scores)


def stopword_ratio_of(distinct_toks: Column) -> Column:
    """``stopword_ratio`` over a pre-projected DISTINCT token array."""
    return F.when(
        F.size(distinct_toks) > 0,
        stopword_hits_of(distinct_toks, "en").cast("double")
        / F.size(distinct_toks),
    ).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    return stopword_ratio_of(F.array_distinct(tokens(text)))


def quality_score_of(toks: Column, distinct_toks: Column) -> Column:
    """``quality_score`` over pre-projected token / distinct-token
    arrays."""
    return (
        F.least(F.size(toks) / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.least(stopword_ratio_of(distinct_toks) * F.lit(4.0), F.lit(1.0)) * 0.5
    )


def quality_score(text: Column) -> Column:
    """Cheap doc-quality heuristic in [0,1]: enough tokens + natural
    stopword density."""
    return quality_score_of(tokens(text), F.array_distinct(tokens(text)))


def normalize(text: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(text), TOKEN_SPLIT_RE, " "))


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the normalized text — whitespace/
    punctuation/case-insensitive exact-dup key."""
    return F.md5(normalize(text))


def normalize_whitespace(text: Column) -> Column:
    """Canonical whitespace/control cleanup (the pre-tokenization
    normalize pass): strip C0 control chars (except \\t\\n), collapse
    whitespace runs to single spaces, trim. Pure codegen regex — RE2 ∩
    Java subset so oracles replay it verbatim; full Unicode NFC needs
    ICU and stays out of the engine core."""
    no_ctl = F.regexp_replace(text, "[\\x00-\\x08\\x0b-\\x1f\\x7f]", " ")
    return F.trim(F.regexp_replace(no_ctl, "\\s+", " "))


# HTML → text extraction (the first pass of every web-corpus pipeline).
# All patterns are RE2 ∩ Java (no backrefs/lookaround), so the DuckDB
# oracle replays them verbatim. [\s\S] stands in for dotall — neither
# engine needs an (?s) flag that the other lacks.
SCRIPT_STYLE_RE = r"(?i)<(?:script|style)[^>]*>[\s\S]*?</(?:script|style)>"
TAG_RE = r"<[^>]*>"
_ENTITIES = [  # decode order matters: &amp; LAST or it re-creates entities
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def strip_html(text: Column) -> Column:
    """Extract visible text from HTML: drop <script>/<style> blocks
    with their contents, strip remaining tags, decode the common
    entities, collapse whitespace. Pure codegen regex chain — no
    parser dependency, linear per row, scan-parallel at any corpus
    size. (A spec-complete HTML5 parser is out of engine scope; this
    is the CommonCrawl-style fast path.)"""
    t = F.regexp_replace(text, SCRIPT_STYLE_RE, " ")
    t = F.regexp_replace(t, TAG_RE, " ")
    for ent, ch in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, "\\s+", " "))


# Host = dot-joined alnum/hyphen labels (a trailing sentence period is
# structurally excluded — each '.' must be followed by another label);
# optional userinfo ('user:pass@') is skipped so the REAL host is
# captured, not the username. RE2 ∩ Java subset.
HOST_RE = r"https?://(?:[^/\s@]+@)?([a-zA-Z0-9-]+(?:\.[a-zA-Z0-9-]+)*)"


def extract_domains(text: Column) -> Column:
    """All normalized domains mentioned in the text: extract URL hosts
    (userinfo-aware, trailing-punctuation-safe), lowercase, strip a
    leading ``www.``. Pure codegen regex (DuckDB twin replays it
    verbatim). Returns array<string> in match order (may contain
    duplicates — callers dedupe)."""
    hosts = F.regexp_extract_all(text, F.lit(HOST_RE), 1)
    return F.transform(
        hosts,
        lambda h: F.regexp_replace(F.lower(h), "^www\\.", ""),
    )


def char_entropy_micro(text: Column) -> Column:
    """Shannon character entropy of ``text`` in nats, as MICRO-NAT
    integer units (bigint) — the information-density quality signal
    (near-zero entropy = repeated filler/padding; very high = random
    bytes/base64 blobs; natural prose sits in a stable band).

    Entirely within the row via higher-order array functions — ZERO
    shuffle, embarrassingly parallel, whole-stage codegen:
    ``H = ln(N) - (Σ c·ln c)/N`` over per-character counts c, where the
    inner sum rides as round(c·ln(c)·1e6) INTEGERS (order-free exact
    sum; ln drifts by ulps across engines, so per-TERM rounding — the
    same fixed-point contract as the surprisal/money queries — keeps
    the total replayable in DuckDB). O(distinct_chars · len) per row;
    distinct chars in real text is tiny (≲ 100).

    Returns NULL for empty/NULL text."""
    chars = F.split(text, "")
    n = F.size(chars)

    # Per-character counts via sorted run-length walk: O(len·log len)
    # per row instead of the naive O(distinct·len) distinct×filter scan
    # (higher-order functions run interpreted, so the constant matters
    # — this form is ~10× faster on real prose). A non-character
    # sentinel appended to the sorted array flushes the final run; the
    # sentinel's own 1-run contributes f(1)=round(1·ln1·1e6)=0, so it
    # never needs flushing. The resulting Σ f(count) is the same
    # integer no matter how the counts were produced, which is why the
    # DuckDB twin can keep its distinct-scan formulation.
    def f_run(c):
        return F.when(
            c > 0,
            F.round(c.cast("double") * F.log(c.cast("double")) * 1000000.0).cast(
                "bigint"
            ),
        ).otherwise(F.lit(0).cast("bigint"))

    walked = F.aggregate(
        F.concat(F.array_sort(chars), F.array(F.lit("__END__"))),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("bigint").alias("c"),
            F.lit(0).cast("bigint").alias("acc"),
        ),
        lambda s, x: F.when(
            x == s["prev"],
            F.struct(
                s["prev"].alias("prev"),
                (s["c"] + 1).alias("c"),
                s["acc"].alias("acc"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                F.lit(1).cast("bigint").alias("c"),
                (s["acc"] + f_run(s["c"])).alias("acc"),
            )
        ),
    )
    inner = walked["acc"]
    h = F.log(n.cast("double")) - (inner.cast("double") / 1000000.0) / n.cast("double")
    # guard on length, not array size: split('', '') yields [''] (size
    # 1), so empty text would otherwise score 0 instead of NULL
    return F.when(
        F.length(text) > 0, F.round(h * 1000000.0).cast("bigint")
    ).otherwise(F.lit(None).cast("bigint"))
