"""Property tests for text-analysis operators (exact values are pinned
by the DuckDB oracle harness; these check semantic properties)."""

from __future__ import annotations

from jagular_spark.operators import text as txt


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_language_id_picks_profile_language(spark):
    rows = [
        (0, "the cat and the dog of a house in the garden is big"),
        (1, "le chat et la maison de les arbres un jour une nuit"),
        (2, "der hund und die katze das haus ein garten zu hause"),
        (3, "el perro y la casa de los gatos un dia en madrid"),
    ]
    out = {r.doc_id: r.pred_lang for r in txt.language_id(_df(spark, rows)).collect()}
    assert out == {0: "en", 1: "fr", 2: "de", 3: "es"}


def test_rolling_fingerprint_is_order_sensitive(spark):
    rows = [(0, "alpha beta gamma"), (1, "gamma beta alpha"), (2, "alpha beta gamma")]
    fp = {r.doc_id: r.fp_roll for r in txt.fingerprints(_df(spark, rows)).collect()}
    assert fp[0] == fp[2]
    assert fp[0] != fp[1]


def test_min_gram_fingerprint_stable_under_distant_edit(spark):
    base = "x" * 40 + " the quick brown fox jumps over the lazy dog"
    edited = "y" * 40 + " the quick brown fox jumps over the lazy dog"
    rows = [(0, base), (1, edited)]
    fp = {r.doc_id: r.fp_min8 for r in txt.fingerprints(_df(spark, rows)).collect()}
    # the minimizing 8-gram usually survives an edit elsewhere; at minimum
    # the op is deterministic and produces 32-bit hashes
    assert all(0 <= v < 2**32 for v in fp.values())


def test_bpe_token_stats_counts(spark):
    rows = [(0, "hello, world! abc123 longwordhere")]
    r = txt.bpe_token_stats(_df(spark, rows)).collect()[0]
    # tokens: hello , world ! abc 123 longwordhere  -> 7
    assert r.n_regex_tokens == 7
    assert r.n_punct == 2
    # subwords: ceil(5/4)+1+ceil(5/4)+1+ceil(3/4)+ceil(3/4)+ceil(12/4) = 2+1+2+1+1+1+3
    assert r.n_subwords == 11
