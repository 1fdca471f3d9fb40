"""Text-analysis operators for LLM data pipelines (SURVEY.md §2.K K4 [EXT]).

All pure Column expressions (JVM-side, whole-stage codegen — no Python UDFs in
the hot path), so they run unchanged over 100 TB of documents. Where an
operator needs a fold (fingerprints), Spark's higher-order functions keep it
JVM-side too.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: Tiny English stopword set for quality scoring / language heuristics.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

#: BPE-ish tokenizer regex: letter runs, digit runs, single non-space symbols.
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def let(value: Column, body) -> Column:
    """Higher-order let-binding: evaluate `value` ONCE per row and hand it to
    `body` as a lambda variable (transform over a one-element array, then
    element_at 1). Why it exists: an expression placed inside a higher-order
    function's lambda is re-evaluated on EVERY element — e.g. the original
    shingles() embedded words(text) (a regex split of the whole document)
    inside its per-gram lambda k times, so each k-gram re-split the document
    k times, O(k·n²) regex work per doc. Binding the array as a lambda
    variable makes the body see a cheap reference instead. Value-transparent:
    element_at(transform(array(v), f), 1) ≡ f(v) for any v including NULL
    (the one-element array holds NULL and the lambda sees it)."""
    return F.element_at(F.transform(F.array(value), body), 1)


def words(text) -> Column:
    """Whitespace tokenization: splits on runs of any whitespace and drops
    empty tokens, so multi-line / multi-space corpora tokenize correctly.

    (The driver fixtures are single-space separated, so DuckDB oracles may
    spell this as string_split(text, ' ') — identical output on that data.)
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, "\\s+"), lambda w: w != "")


def word_count(text) -> Column:
    return F.size(words(text))


def token_count(text) -> Column:
    """Token count under the BPE-ish regex (letters/digits/symbol singles)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), F.lit(0)))


def unique_word_ratio(text) -> Column:
    """Distinct-word share; defined as 0.0 for empty and NULL documents
    (a real corpus has both — under ANSI mode an unguarded division would
    abort the whole job on the first empty doc)."""
    w = words(text)
    n = F.size(w)
    return F.when(
        n > 0, F.size(F.array_distinct(w)).cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


def stopword_ratio(text) -> Column:
    """Stopword share; 0.0 for empty/NULL documents (same guard rationale
    as unique_word_ratio)."""
    w = words(text)
    n = F.size(w)
    hits = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(
        F.lit(0.0)
    )


def quality_score(text) -> Column:
    """Composite quality heuristic in [0,1]: length saturation + lexical
    diversity + stopword plausibility. Deterministic per-row double math;
    empty/NULL documents score 0.0 (every component is null/empty-guarded),
    so the downstream corpus filter drops rather than crashes on them."""
    w = words(text)
    n = F.coalesce(F.size(w), F.lit(0)).cast("double")
    length_component = F.least(F.lit(1.0), n / F.lit(100.0))
    return (
        F.lit(0.4) * length_component
        + F.lit(0.3) * unique_word_ratio(text)
        + F.lit(0.3) * stopword_ratio(text)
    )


def lang_guess(text) -> Column:
    """Toy deterministic language-ID heuristic (stopword evidence).

    A production system would use an n-gram profile model; the operator shape
    (text → label, pure column expr) is what matters for pipeline plumbing.
    """
    w = words(text)
    en_hits = F.size(F.filter(w, lambda x: x.isin("the", "a", "of")))
    return F.when(en_hits > 0, F.lit("en")).otherwise(F.lit("unk"))


def fingerprint(text) -> Column:
    """Order-sensitive rolling document fingerprint (polynomial hash).

    Per word w: code = ascii(first char) * 31 + length(w); fold
    acc = (acc * 131 + code) mod 1_000_000_007 over the word sequence.
    Exact integer math → identical in any engine (DuckDB oracle: list_reduce).
    """
    w = words(text)
    codes = F.transform(w, lambda x: F.ascii(F.substring(x, 1, 1)) * 31 + F.length(x))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 131 + c.cast("long")) % 1000000007,
    )


def shingles(text, k: int = 3) -> Column:
    """k-word shingles (n-grams joined by a space), distinct not applied.

    Documents with fewer than k words yield an EMPTY array — guarded
    explicitly because Spark's sequence(1, 0) counts DOWN ([1, 0]) and would
    index out of range (DuckDB's range(1, 0) is empty, so the engines would
    otherwise diverge: oracle fine, Spark crash).
    """
    return let(
        words(text),
        lambda w: F.when(
            F.size(w) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (k - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(w, i + j) for j in range(k)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
