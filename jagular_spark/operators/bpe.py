"""Distributed BPE tokenizer training — the tokenizer-fitting stage of
a pretraining data pipeline (Sennrich et al. 2016, arXiv:1508.07909),
in the engine's bounded-fit / frozen-row-local-serving shape:

- FIT (``bpe_fit``): merge selection runs driver-side over an ABSOLUTE
  ``fit_rows`` hash-sample of documents (the quantizer-fit precedent —
  sampling.hash_sample_rows: the ``n`` smallest-md5 docs, a pure
  function of (corpus, salt), TakeOrderedAndProject so the corpus
  never shuffles and the fit cost is corpus-size-invariant). Real
  tokenizers train on samples; the sample is deterministic and
  engine-portable, so a DuckDB oracle re-derives the SAME merge list
  independently (generated CTE chain, one round per merge — the
  integer-Lloyd-in-SQL precedent, oracles._ivf_fit_prefix).
- ENCODE (``bpe_encode_words``): the fitted merges freeze into a chain
  of LITERAL string ``replace`` calls applied per word — pure JVM
  expressions inside whole-stage codegen, zero shuffle, zero Python.

Cross-engine exactness rests on one representation trick: a word's
symbol sequence is the STRING ``(h)(e)(l)(l)(o)(#)`` — every symbol
wrapped in parens, ``#`` the end-of-word marker. Applying merge
("a","b") is the literal replace ``(a)(b)`` → ``(ab)``, and the parens
make it boundary-safe: ``(b)(c)`` can never false-match inside
``(ab)(c)`` because the pattern requires ``(b`` which does not occur.
Both engines' ``replace`` scan left-to-right without rescanning
replacements (verified: ``(a)(a)(a)`` → ``(aa)(a)`` on both), and the
driver-side fit emulates exactly that scan, so fit and encode replay
bit-for-bit in SQL.

Vocabulary convention: words are the whitespace tokens that are purely
alphabetic (``^[A-Za-z]+$``), lowercased — symbols stay in
``[a-z]``+``#`` so the paren delimiters are unambiguous.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_RE = r"^[A-Za-z]+$"


def _word_symbols(word: str) -> list[str]:
    return list(word) + ["#"]


def _pair_str(a: str, b: str) -> str:
    return f"({a})({b})"


def _apply_merge(syms: list[str], a: str, b: str) -> list[str]:
    """Leftmost non-overlapping merge of adjacent (a, b) — the exact
    list emulation of string replace-all on the paren representation
    (replace scans the original left-to-right and never rescans the
    inserted text, so a merged symbol cannot chain into the next match
    within the same round)."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_fit_sample(
    df: DataFrame,
    fit_rows: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
) -> list[list[str]]:
    """Collect the fit sample's words as symbol lists. Bounded collect:
    exactly ``fit_rows`` docs (the smallest-md5 set, ties by id), same
    membership the oracle reproduces with ``ORDER BY bucket, id
    LIMIT n``."""
    from jagular_spark.operators.sampling import hash_sample_rows

    rows = hash_sample_rows(
        df.select(id_col, text_col), id_col, fit_rows, salt
    ).collect()
    words: list[list[str]] = []
    for r in rows:
        # flags=re.ASCII: Python's \s is Unicode by default (matches
        # \xa0,  , ...) while the JVM encode's split('\s+') and
        # the oracle's RE2 \s are ASCII classes — a fit-sample doc with
        # non-ASCII whitespace would otherwise tokenize differently
        # here than in BOTH SQL engines and silently shift the fitted
        # merge list (r15 advice). Residual JVM-vs-RE2 \x0B difference
        # is shared with every other split-based workload.
        for t in re.split(r"\s+", (r[text_col] or "").strip(), flags=re.ASCII):
            if re.fullmatch("[A-Za-z]+", t):
                words.append(_word_symbols(t.lower()))
    return words


def bpe_fit(
    df: DataFrame,
    n_merges: int,
    fit_rows: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
) -> list[tuple[str, str]]:
    """Fit ``n_merges`` BPE merges on the hash-sample. Selection per
    round: most frequent adjacent symbol pair across ALL word
    occurrences, ties broken by the ASCII order of the paren pair
    string — the exact (cnt DESC, pair ASC) the SQL replay uses.
    Returns ``[(a, b), ...]`` in rank order; raises if the sample
    exhausts its pairs before ``n_merges`` (a loud spec violation
    instead of a silent short vocabulary)."""
    words = bpe_fit_sample(df, fit_rows, id_col, text_col, salt)
    merges: list[tuple[str, str]] = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w in words:
            for i in range(len(w) - 1):
                counts[(w[i], w[i + 1])] = counts.get((w[i], w[i + 1]), 0) + 1
        if not counts:
            raise ValueError(
                f"BPE fit sample exhausted after {rank} merges "
                f"(asked for {n_merges}) — enlarge fit_rows"
            )
        (a, b) = min(counts, key=lambda p: (-counts[p], _pair_str(*p)))
        merges.append((a, b))
        words = [_apply_merge(w, a, b) for w in words]
    return merges


def _sym_expr(word_col) -> F.Column:
    """``'hello'`` → ``'(h)(e)(l)(l)(o)(#)'`` as a JVM expression."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word_col)),
        lambda i: F.substring(word_col, i, F.lit(1).cast("int")),
    )
    return F.concat(F.lit("("), F.array_join(chars, ")("), F.lit(")(#)"))


def bpe_words_col(text_col: str = "text") -> F.Column:
    """The shared vocabulary convention: alphabetic whitespace tokens,
    lowercased."""
    return F.transform(
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"),
            lambda t: t.rlike(WORD_RE),
        ),
        lambda t: F.lower(t),
    )


def bpe_encode_words(
    text_col: str,
    merges: list[tuple[str, str]],
) -> F.Column:
    """Array of encoded word strings (paren representation) — the
    frozen-merge serving path: symbolize each word, then apply the
    fitted merges as a chain of LITERAL replaces. Everything is a JVM
    string expression inside one projection: zero shuffle, zero
    Python, corpus-scan-local."""

    def encode_one(w) -> F.Column:
        e = _sym_expr(w)
        for a, b in merges:
            e = F.replace(e, F.lit(_pair_str(a, b)), F.lit(f"({a + b})"))
        return e

    return F.transform(bpe_words_col(text_col), encode_one)


def bpe_token_count_col(
    text_col: str,
    merges: list[tuple[str, str]],
) -> F.Column:
    """Per-document token count under the FITTED tokenizer — the
    honest token-accounting unit a budgeted mixture really wants
    (whitespace counts misprice long-word strata; BPE counts are what
    the training run pays for). Pure row-local JVM expression: encode
    each word with the frozen merges, count symbols as the number of
    '(' delimiters, sum over words. Stateless, so it drops into a
    document STREAM unchanged (see streaming.pipeline
    stream_bpe_token_counts)."""
    ws = bpe_encode_words(text_col, merges)
    per_word = F.transform(
        ws,
        lambda e: (
            F.length(e) - F.length(F.replace(e, F.lit("("), F.lit("")))
        ).cast("long"),
    )
    return F.aggregate(
        per_word, F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def bpe_vocab_audit(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """The tokenizer-quality audit a fit job reports: for each fitted
    merge, how often its token survives in the FINAL encoding of the
    whole corpus (later merges consume earlier tokens — e.g. ``th``
    mostly disappears into ``the`` — so the survival counts expose the
    merge hierarchy). One corpus scan → row-local encode → symbol
    explode → a ≤|alphabet|+|merges|-key aggregate (map-side combine)
    broadcast-joined to the ``n_merges``-row literal rank table.
    ``(rank, token, n_final)``; ``n_final`` 0 is legitimate."""
    spark = df.sparkSession
    enc = df.select(bpe_encode_words(text_col, merges).alias("ws"))
    syms = enc.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ws"),
                    lambda e: F.regexp_extract_all(
                        e, F.lit(r"\(([^)]*)\)"), F.lit(1)
                    ),
                )
            )
        ).alias("token")
    )
    counts = syms.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n_final")
    )
    toks = F.array(*[F.lit(a + b) for a, b in merges])
    ranks = spark.range(1, len(merges) + 1).select(
        F.col("id").alias("rank"),
        F.element_at(toks, F.col("id").cast("int")).alias("token"),
    )
    return ranks.join(F.broadcast(counts), "token", "left").select(
        "rank", "token", F.coalesce(F.col("n_final"), F.lit(0).cast("long")).alias("n_final")
    )
