"""DuckDB oracle SQL for every driver query — the cross-engine
correctness gate. Each entry is the ANSI-SQL twin of the same-named
SPARK_QUERIES entry in workloads.py; the driver (and
tools/check_oracles.py) runs both sides and compares row count,
schema, and an order-insensitive value hash. Split out of
workloads.py (r6) so engine code and oracle text are separately
reviewable; no behavior change. The cross-engine float/int parity
playbook lives in workloads.py's module docstring.
"""

from __future__ import annotations

from jagular_spark.operators import similarity as sim
from jagular_spark.operators import text as txt
from jagular_spark.operators.filtering import XCORR_CORR_SQL as _XCORR_CORR
from jagular_spark.workload_params import (
    _BPE_FIT_ROWS,
    _BPE_MERGES,
    _BP_TAPS,
    _DISC_PRICE_QUANTA,
    _IVF_FROZEN_CENTS,
    _JACCARD_MAX_BUCKET,
    _LP_TAPS,
    _ORDERED_LISTS_CTE,
    _REBALANCE_TARGETS,
    _SEMDEDUP_MAX_CLUSTER,
    _SPIKE_FIT_FRACTION,
    _SPIKE_FIT_SALT,
    _STRATA_FRACTIONS,
    _TOKEN_BUDGETS,
    _fir_chain_sql,
)


def _text_oracles() -> dict[str, str]:
    ratio = {
        lang: (
            f"CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), "
            f"t -> t IN ({', '.join(chr(39) + w + chr(39) for w in words)}))) AS DOUBLE)"
            f" / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE)"
        )
        for lang, words in txt.LANG_STOPWORDS.items()
    }
    lang_sql = f"""
        WITH scored AS (
            SELECT doc_id, {ratio['en']} AS s_en, {ratio['fr']} AS s_fr,
                   {ratio['de']} AS s_de, {ratio['es']} AS s_es
            FROM documents
        )
        SELECT doc_id, s_en, s_fr, s_de, s_es,
               CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
                    WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                    WHEN s_de >= s_es THEN 'de'
                    ELSE 'es' END AS pred_lang
        FROM scored"""

    fp_sql = f"""
        SELECT doc_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
                    (acc, x) -> (acc * 31 + x) % {txt.P}) AS fp_roll,
               list_min(list_transform(generate_series(1, greatest(1, length(text) - 7)),
                    i -> ('0x' || substr(md5(substr(text, i, 8)), 1, 8))::BIGINT)) AS fp_min8
        FROM documents"""

    toks = f"regexp_extract_all(text, '{txt.BPE_TOKEN_RE}')"
    bpe_sql = f"""
        SELECT doc_id,
               CAST(len({toks}) AS BIGINT) AS n_regex_tokens,
               CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform({toks}, t -> CASE WHEN regexp_matches(t, '^[A-Za-z0-9]')
                        THEN (length(t) + 3) // 4 ELSE CAST(1 AS BIGINT) END)),
                    (acc, x) -> acc + x) AS BIGINT) AS n_subwords,
               CAST(len(list_filter({toks}, t -> NOT regexp_matches(t, '^[A-Za-z0-9]'))) AS BIGINT)
                   AS n_punct
        FROM documents"""

    case_lang = """CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
                    WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                    WHEN s_de >= s_es THEN 'de'
                    ELSE 'es' END"""
    thr_case = (
        "CASE pred_lang "
        + " ".join(
            f"WHEN '{k}' THEN {int(v * (1 << 32))}"
            for k, v in sorted(_STRATA_FRACTIONS.items())
        )
        + " ELSE 0 END"
    )
    sample_sql = f"""
        WITH scored AS (
            SELECT doc_id, {ratio['en']} AS s_en, {ratio['fr']} AS s_fr,
                   {ratio['de']} AS s_de, {ratio['es']} AS s_es
            FROM documents
        ), lang AS (
            SELECT doc_id, {case_lang} AS pred_lang FROM scored
        )
        SELECT doc_id, pred_lang FROM lang
        WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT < {thr_case}"""

    quantiles_sql = f"""
        WITH base AS (
            SELECT doc_id,
                   CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
                   {ratio['en']} AS s_en, {ratio['fr']} AS s_fr,
                   {ratio['de']} AS s_de, {ratio['es']} AS s_es
            FROM documents
        ), lang AS (
            SELECT doc_id, n_tokens,
                   CAST(floor(s_en * 10.0) AS BIGINT) AS stop_dec,
                   {case_lang} AS pred_lang
            FROM base
        ), ranked AS (
            SELECT pred_lang, stop_dec, n_tokens,
                   CAST(ROW_NUMBER() OVER (PARTITION BY pred_lang, stop_dec
                        ORDER BY n_tokens, doc_id) AS BIGINT) - 1 AS rn,
                   COUNT(*) OVER (PARTITION BY pred_lang, stop_dec) AS cnt
            FROM lang
        )
        SELECT pred_lang, stop_dec, CAST(COUNT(*) AS BIGINT) AS n_docs,
               MAX(CASE WHEN rn = CAST(floor((cnt - 1) * 0.5) AS BIGINT) THEN n_tokens END) AS p50_tokens,
               MAX(CASE WHEN rn = CAST(floor((cnt - 1) * 0.9) AS BIGINT) THEN n_tokens END) AS p90_tokens,
               MAX(CASE WHEN rn = CAST(floor((cnt - 1) * 0.99) AS BIGINT) THEN n_tokens END) AS p99_tokens
        FROM ranked GROUP BY pred_lang, stop_dec"""

    return {
        "docs_language_id": lang_sql,
        "docs_fingerprint": fp_sql,
        "docs_bpe_tokens": bpe_sql,
        "docs_stratified_sample": sample_sql,
        "docs_token_quantiles": quantiles_sql,
    }


def _sim_hash_sql() -> str:
    return "('0x' || substr(md5({col}), 1, 8))::BIGINT"


def _similarity_oracles() -> dict[str, str]:
    P = sim.P
    shingle_cte = f"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
        ), sh AS (
            SELECT doc_id, CASE WHEN len(t) >= 3 THEN
                list_distinct(list_transform(generate_series(1, len(t) - 2),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                ELSE [] END AS shingles FROM toks
        ), ex AS (
            SELECT doc_id, unnest(shingles) AS s FROM sh
        ), hashes AS (
            SELECT doc_id, {_sim_hash_sql().format(col='s')} % {P} AS h FROM ex
        )"""
    sig_cols = ", ".join(
        f"MIN(({a} * h + {b}) % {P}) AS m{j}"
        for j, (a, b) in enumerate(zip(sim.MINHASH_A, sim.MINHASH_B))
    )
    band_selects = "\n            UNION ALL ".join(
        f"SELECT doc_id AS id, {b} AS band, m{2*b} * 2147483648 + m{2*b+1} AS key FROM sig"
        for b in range(sim.LSH_BANDS)
    )
    minhash_lsh = f"""{shingle_cte}, sig AS (
            SELECT doc_id, {sig_cols} FROM hashes GROUP BY doc_id
        ), buckets AS (
            {band_selects}
        )
        SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_bands
        FROM buckets a JOIN buckets b ON a.band = b.band AND a.key = b.key AND a.id < b.id
        GROUP BY a.id, b.id"""

    # r12 hot-bucket guard twin: (band, key) buckets holding more than
    # max_members ids are removed wholesale BEFORE pair generation —
    # exactly lsh_candidate_pairs(max_members=3)'s size filter.
    minhash_lsh_capped = f"""{shingle_cte}, sig AS (
            SELECT doc_id, {sig_cols} FROM hashes GROUP BY doc_id
        ), buckets AS (
            {band_selects}
        ), ok AS (
            SELECT band, key FROM buckets GROUP BY band, key HAVING COUNT(*) <= 3
        ), kept AS (
            SELECT b.* FROM buckets b JOIN ok USING (band, key)
        )
        SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_bands
        FROM kept a JOIN kept b ON a.band = b.band AND a.key = b.key AND a.id < b.id
        GROUP BY a.id, b.id"""

    # Mirrors the engine's _JACCARD_MAX_BUCKET stop-shingle cutoff (the
    # r9 guard on the standalone call site): over-cap hashes are removed
    # from every doc's shingle multiset before sizes AND common — exactly
    # what dropping the bucket from both the pair stream and the size
    # sentinels does Spark-side.
    jaccard = f"""{shingle_cte}, fhashes AS (
            SELECT * FROM hashes WHERE h IN (
                SELECT h FROM hashes GROUP BY h HAVING COUNT(*) <= {_JACCARD_MAX_BUCKET}
            )
        ), sizes AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM fhashes GROUP BY doc_id
        ), common AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_common
            FROM fhashes a JOIN fhashes b ON a.h = b.h AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT id_a, id_b, n_common,
               CAST(sa.n_sh + sb.n_sh - n_common AS BIGINT) AS n_union,
               n_common / (sa.n_sh + sb.n_sh - n_common) AS jaccard
        FROM common
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.5"""

    # Asymmetric containment: same shingle/common machinery, max of the
    # two per-side ratios — flags subset/superset duplication Jaccard
    # dilutes away.
    containment = f"""{shingle_cte}, fhashes AS (
            SELECT * FROM hashes WHERE h IN (
                SELECT h FROM hashes GROUP BY h HAVING COUNT(*) <= {_JACCARD_MAX_BUCKET}
            )
        ), sizes AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM fhashes GROUP BY doc_id
        ), common AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_common
            FROM fhashes a JOIN fhashes b ON a.h = b.h AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT id_a, id_b, n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
               GREATEST(n_common / sa.n_sh, n_common / sb.n_sh) AS containment
        FROM common
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE GREATEST(n_common / sa.n_sh, n_common / sb.n_sh) >= 0.8"""

    # LSH-first exact Jaccard: candidates from the minhash band buckets,
    # common-shingle counting restricted to candidate pairs. The shared
    # hashes JOIN counts multiplicity products like the engine's
    # aggregate-over-multiset expression.
    jaccard_lsh = f"""{shingle_cte}, sig AS (
            SELECT doc_id, {sig_cols} FROM hashes GROUP BY doc_id
        ), buckets AS (
            {band_selects}
        ), cand AS (
            SELECT a.id AS id_a, b.id AS id_b
            FROM buckets a JOIN buckets b
              ON a.band = b.band AND a.key = b.key AND a.id < b.id
            GROUP BY a.id, b.id
        ), sizes AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM hashes GROUP BY doc_id
        ), common AS (
            SELECT c.id_a, c.id_b, CAST(COUNT(*) AS BIGINT) AS n_common
            FROM cand c
            JOIN hashes a ON a.doc_id = c.id_a
            JOIN hashes b ON b.doc_id = c.id_b AND a.h = b.h
            GROUP BY c.id_a, c.id_b
        )
        SELECT id_a, id_b, n_common,
               CAST(sa.n_sh + sb.n_sh - n_common AS BIGINT) AS n_union,
               n_common / (sa.n_sh + sb.n_sh - n_common) AS jaccard
        FROM common
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.5"""

    def _simhash_sql_for(bits: int) -> str:
        sum_cols = ", ".join(
            f"SUM(CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS s{b}" for b in range(bits)
        )
        fp = " + ".join(f"(CASE WHEN s{b} >= 0 THEN {1 << b} ELSE 0 END)" for b in range(bits))
        return f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents
        ), h AS (
            SELECT doc_id, {_sim_hash_sql().format(col='tok')} AS h FROM toks
        ), sums AS (
            SELECT doc_id, {sum_cols} FROM h GROUP BY doc_id
        )
        SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM sums"""

    simhash_sql = _simhash_sql_for(16)

    normed_cte = f"""
        WITH base AS (
            SELECT vec_id, list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * {sim.EMB_SCALE}) AS BIGINT)) AS iv
            FROM embeddings
        ), normed AS (
            SELECT vec_id, iv,
                   CAST(list_sum(list_transform(generate_series(1, len(iv)),
                        i -> iv[i] * iv[i])) AS BIGINT) AS nrm
            FROM base
        )"""
    pair_dot = (
        "CAST(list_sum(list_transform(generate_series(1, len(a.iv)), "
        "i -> a.iv[i] * b.iv[i])) AS BIGINT)"
    )
    neardup = f"""{normed_cte}, scored AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b, {pair_dot} AS dot,
                   a.nrm AS nrm_a, b.nrm AS nrm_b
            FROM normed a JOIN normed b ON a.vec_id < b.vec_id
        )
        SELECT id_a, id_b,
               dot / (sqrt(CAST(nrm_a AS DOUBLE)) * sqrt(CAST(nrm_b AS DOUBLE))) AS cos
        FROM scored
        WHERE dot / (sqrt(CAST(nrm_a AS DOUBLE)) * sqrt(CAST(nrm_b AS DOUBLE))) >= 0.35"""

    probe_dot = (
        "CAST(list_sum(list_transform(generate_series(1, len(q.iv)), "
        "i -> q.iv[i] * c.iv[i])) AS BIGINT)"
    )
    ann = f"""{normed_cte}, scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {probe_dot} AS dot,
                   q.nrm AS nrm_a, c.nrm AS nrm_b
            FROM normed q JOIN normed c
              ON q.vec_id < 20 AND c.vec_id != q.vec_id
        ), ranked AS (
            SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY dot DESC, neighbor_id ASC) AS BIGINT) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, rank,
               dot / (sqrt(CAST(nrm_a AS DOUBLE)) * sqrt(CAST(nrm_b AS DOUBLE))) AS cos
        FROM ranked WHERE rank <= 5"""

    plane_terms = []
    for j in range(8):
        signs = "[" + ", ".join(str(sim._plane_sign(j, i)) for i in range(64)) + "]"
        plane_terms.append(
            f"CAST(list_sum(list_transform(generate_series(1, 64), i -> ({signs}[i]) * iv[i])) AS BIGINT) AS p{j}"
        )
    bucket_expr = " + ".join(f"(CASE WHEN p{j} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(8))
    lsh_buckets = f"""
        WITH base AS (
            SELECT vec_id, list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * {sim.EMB_SCALE}) AS BIGINT)) AS iv
            FROM embeddings
        ), proj AS (
            SELECT vec_id, {', '.join(plane_terms)} FROM base
        )
        SELECT vec_id, CAST({bucket_expr} AS BIGINT) AS bucket FROM proj"""

    # Connected-components closure of the jaccard>=0.5 pair graph as a
    # recursive CTE: reach = transitive closure over symmetric edges,
    # component label = min reachable id (matches min-label propagation).
    # Mirrors the engine's _JACCARD_MAX_BUCKET stop-shingle cutoff:
    # hashes whose bucket exceeds the cap are removed from every doc's
    # shingle multiset before sizes/common (exactly what dropping the
    # bucket before pair gen AND the size sentinels does Spark-side).
    cluster_sql = f"""{shingle_cte.replace("WITH ", "WITH RECURSIVE ", 1)}, fhashes AS (
            SELECT * FROM hashes WHERE h IN (
                SELECT h FROM hashes GROUP BY h HAVING COUNT(*) <= {_JACCARD_MAX_BUCKET}
            )
        ), sizes AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM fhashes GROUP BY doc_id
        ), common AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_common
            FROM fhashes a JOIN fhashes b ON a.h = b.h AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ), prs AS (
            SELECT id_a, id_b FROM common
            JOIN sizes sa ON id_a = sa.doc_id
            JOIN sizes sb ON id_b = sb.doc_id
            WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.5
        ), edges AS (
            SELECT id_a AS a, id_b AS b FROM prs
            UNION ALL
            SELECT id_b, id_a FROM prs
        ), reach AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        ), comp AS (
            SELECT a AS id, LEAST(a, MIN(b)) AS comp FROM reach GROUP BY a
        )
        SELECT d.doc_id,
               CAST(COALESCE(c.comp, d.doc_id) AS BIGINT) AS cluster_id,
               d.doc_id = COALESCE(c.comp, d.doc_id) AS is_canonical
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id"""

    # All-pairs Hamming<=1 over 32-bit fingerprints: provably the same
    # result set as the engine's half-fingerprint banding (pigeonhole).
    # 32 bits, not 16: a 16-bit space saturates at corpus scale (5000
    # docs already produced ~700k birthday-collision "pairs" at sf0.1);
    # at 32 bits survivors are genuine near-dups.
    simhash_neardup_sql = f"""
        WITH fps AS ({_simhash_sql_for(32)})
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM fps a JOIN fps b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 1"""

    return {
        "docs_minhash_lsh": minhash_lsh,
        "docs_minhash_lsh_capped": minhash_lsh_capped,
        "docs_ngram_jaccard": jaccard,
        "docs_ngram_containment": containment,
        "docs_ngram_jaccard_lsh": jaccard_lsh,
        "docs_simhash": simhash_sql,
        "docs_simhash_neardup": simhash_neardup_sql,
        "docs_dedup_clusters": cluster_sql,
        "emb_cosine_neardup": neardup,
        "emb_ann_topk": ann,
        "emb_lsh_buckets": lsh_buckets,
    }


# ---------------------------------------------------------------------------
# Dedup clustering, deterministic sampling, corpus stats
# ---------------------------------------------------------------------------



def _curation_ratio() -> dict[str, str]:
    """Per-language stopword-ratio expressions shared by the curation
    oracles (batch funnel and streamed twin) — one construction."""
    return {
        lang: (
            f"CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), "
            f"t -> t IN ({', '.join(chr(39) + w + chr(39) for w in words)}))) AS DOUBLE)"
            f" / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE)"
        )
        for lang, words in txt.LANG_STOPWORDS.items()
    }


_CURATION_QUALITY = (
    "0.4 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)"
    " / nullif(CAST(length(text) AS DOUBLE), 0.0))"
    " + 0.3 * (CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),"
    " t -> t IN ('the','a','of','and','to'))) AS DOUBLE)"
    " / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE))"
    " + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)"
    " / nullif(CAST(length(text) AS DOUBLE), 0.0))"
)

_CURATION_CASE_LANG = """CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
                    WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                    WHEN s_de >= s_es THEN 'de'
                    ELSE 'es' END"""


def _funnel_oracle(
    prefix_ctes: str = "",
    corpus: str = "documents",
    final_cols: str = "doc_id, quality_score",
) -> str:
    """DuckDB replay of the whole curation funnel (quality → language →
    exact dedup → LSH-candidate near-dup closure → hash sample). The
    near-dup stage mirrors the engine's LSH-first composition: minhash
    band buckets propose candidate pairs over the survivor set, exact
    shingle-Jaccard ≥ 0.5 verifies them. ``prefix_ctes``/``corpus``
    let the v2 variant swap the raw documents table for the keep-first
    substring-cut corpus; ``final_cols`` selects the output shape."""
    sig_cols = ", ".join(
        f"MIN(({a} * h + {b}) % {sim.P}) AS m{j}"
        for j, (a, b) in enumerate(
            zip(sim.MINHASH_A[: sim.N_MINHASH], sim.MINHASH_B[: sim.N_MINHASH])
        )
    )
    band_selects = "\n            UNION ALL ".join(
        f"SELECT doc_id AS id, {b} AS band, m{2*b} * 2147483648 + m{2*b+1} AS key FROM sig"
        for b in range(sim.LSH_BANDS)
    )
    ratio = _curation_ratio()
    quality = _CURATION_QUALITY
    case_lang = _CURATION_CASE_LANG
    return f"""
        WITH RECURSIVE {prefix_ctes}scored AS (
            SELECT doc_id, text, {quality} AS quality_score,
                   {ratio['en']} AS s_en, {ratio['fr']} AS s_fr,
                   {ratio['de']} AS s_de, {ratio['es']} AS s_es
            FROM {corpus}
        ), f1 AS (
            SELECT doc_id, text, quality_score FROM scored
            WHERE quality_score >= 0.6 AND {case_lang} = 'en'
        ), d AS (
            SELECT doc_id, text, quality_score FROM (
                SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS min_id FROM f1
            ) WHERE doc_id = min_id
        ), toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM d
        ), sh AS (
            SELECT doc_id, CASE WHEN len(t) >= 3 THEN
                list_distinct(list_transform(generate_series(1, len(t) - 2),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                ELSE [] END AS shingles FROM toks
        ), ex AS (
            SELECT doc_id, unnest(shingles) AS s FROM sh
        ), hashes AS (
            SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT % {sim.P} AS h FROM ex
        ), sig AS (
            SELECT doc_id, {sig_cols} FROM hashes GROUP BY doc_id
        ), buckets AS (
            {band_selects}
        ), cand AS (
            SELECT a.id AS id_a, b.id AS id_b
            FROM buckets a JOIN buckets b
              ON a.band = b.band AND a.key = b.key AND a.id < b.id
            GROUP BY a.id, b.id
        ), sizes AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM hashes GROUP BY doc_id
        ), common AS (
            SELECT c.id_a, c.id_b, CAST(COUNT(*) AS BIGINT) AS n_common
            FROM cand c
            JOIN hashes a ON a.doc_id = c.id_a
            JOIN hashes b ON b.doc_id = c.id_b AND a.h = b.h
            GROUP BY c.id_a, c.id_b
        ), prs AS (
            SELECT id_a, id_b FROM common
            JOIN sizes sa ON id_a = sa.doc_id
            JOIN sizes sb ON id_b = sb.doc_id
            WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.5
        ), edges AS (
            SELECT id_a AS a, id_b AS b FROM prs
            UNION ALL
            SELECT id_b, id_a FROM prs
        ), reach AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        ), comp AS (
            SELECT a AS id, LEAST(a, MIN(b)) AS comp FROM reach GROUP BY a
        ), kept AS (
            SELECT d.doc_id, d.text, d.quality_score
            FROM d LEFT JOIN comp c ON d.doc_id = c.id
            WHERE d.doc_id = COALESCE(c.comp, d.doc_id)
        )
        SELECT {final_cols} FROM kept
        WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT < {int(0.5 * (1 << 32))}"""



ORACLE_SQL: dict[str, str] = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
               (CAST(CAST(SUM((CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                        * (10000 - CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))) // 2147483648) AS BIGINT) AS DOUBLE)
                    * 2147483648.0
                + CAST(CAST(SUM((CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                        * (10000 - CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))) % 2147483648) AS BIGINT) AS DOUBLE))
                   / 100000000.0 AS sum_disc_price,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q6_forecast_revenue": """
        SELECT (CAST(CAST(SUM((CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                    * (CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))) // 2147483648) AS BIGINT) AS DOUBLE)
                    * 2147483648.0
                + CAST(CAST(SUM((CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                    * (CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))) % 2147483648) AS BIGINT) AS DOUBLE))
                   / 100000000.0 AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT) BETWEEN 500 AND 700
          AND l_quantity < 24.0
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey,
               epoch_us(o_orderdate) AS o_orderdate_us,
               (CAST(CAST(SUM((CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                        * (10000 - CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))) // 2147483648) AS BIGINT) AS DOUBLE)
                    * 2147483648.0
                + CAST(CAST(SUM((CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                        * (10000 - CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))) % 2147483648) AS BIGINT) AS DOUBLE))
                   / 100000000.0 AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate  > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "q5_region_revenue": """
        SELECT n_name,
               (CAST(CAST(SUM((CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                        * (10000 - CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))) // 2147483648) AS BIGINT) AS DOUBLE)
                    * 2147483648.0
                + CAST(CAST(SUM((CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                        * (10000 - CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))) % 2147483648) AS BIGINT) AS DOUBLE))
                   / 100000000.0 AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC
    """,
    "top3_orders_per_customer": """
        SELECT o_custkey, o_orderkey, o_totalprice, price_rank FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS price_rank
            FROM orders
        ) WHERE price_rank <= 3
    """,
    "events_sessionize": """
        WITH flagged AS (
            SELECT user_id, event_id, epoch_us(ts) AS us,
                   CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ), sess AS (
            SELECT user_id, us,
                   CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id,
               MIN(us) AS session_start_us, MAX(us) AS session_end_us,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sess GROUP BY user_id, session_id
    """,
    "events_segments": """
        WITH flagged AS (
            SELECT user_id, event_id, epoch_us(ts) AS us,
                   CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 30.0 * 60000000
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ), seg AS (
            SELECT user_id, us,
                   CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS segment_id
            FROM flagged
        )
        SELECT user_id, segment_id,
               MIN(us) AS ts_start, MAX(us) + 60000000 AS ts_stop,
               CAST(COUNT(*) AS BIGINT) AS n_samples
        FROM seg GROUP BY user_id, segment_id
    """,
    "events_gap_lengths": """
        WITH flagged AS (
            SELECT user_id, event_id, epoch_us(ts) AS us,
                   CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 30.0 * 60000000
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ), seg AS (
            SELECT user_id, us,
                   CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS segment_id
            FROM flagged
        ), segments AS (
            SELECT user_id, segment_id,
                   MIN(us) AS ts_start, MAX(us) + 60000000 AS ts_stop
            FROM seg GROUP BY user_id, segment_id
        )
        SELECT user_id, segment_id,
               ts_stop AS gap_start,
               LEAD(ts_start) OVER (PARTITION BY user_id ORDER BY ts_start) AS gap_stop,
               LEAD(ts_start) OVER (PARTITION BY user_id ORDER BY ts_start) - ts_stop AS gap_len
        FROM segments
        QUALIFY gap_stop IS NOT NULL
    """,
    "events_dedup_first": """
        SELECT user_id, event_type, event_id, us, value FROM (
            SELECT user_id, event_type, event_id, epoch_us(ts) AS us, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                        ORDER BY epoch_us(ts), event_id) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "events_interpolate": """
        WITH dedup AS (
            SELECT user_id, minute, value FROM (
                SELECT user_id, epoch_us(ts) // 60000000 AS minute, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts) // 60000000
                            ORDER BY epoch_us(ts), event_id) AS rn
                FROM events
            ) WHERE rn = 1
        ), pairs AS (
            SELECT user_id, minute AS l_ts, value AS l_v,
                   LEAD(minute) OVER (PARTITION BY user_id ORDER BY minute) AS r_ts,
                   LEAD(value)  OVER (PARTITION BY user_id ORDER BY minute) AS r_v
            FROM dedup
        ), filled AS (
            SELECT user_id, CAST(t.ts AS BIGINT) AS minute,
                   l_v + (r_v - l_v) * ((t.ts - l_ts) / (r_ts - l_ts)) AS value
            FROM pairs, UNNEST(generate_series(l_ts + 1, r_ts - 1)) AS t(ts)
            WHERE r_ts - l_ts - 1 BETWEEN 1 AND 5
        )
        SELECT user_id, minute, value FROM dedup
        UNION ALL
        SELECT user_id, minute, value FROM filled
    """,
    "events_crossings": """
        SELECT user_id, event_id, us, value, next_value FROM (
            SELECT user_id, event_id, epoch_us(ts) AS us, value,
                   LEAD(value) OVER (PARTITION BY user_id
                        ORDER BY epoch_us(ts), event_id) AS next_value
            FROM events
        ) WHERE value > 100.0 AND next_value > 100.0
    """,
    "events_fir_smooth": """
        SELECT user_id, event_id, us, value, smoothed FROM (
            SELECT user_id, event_id, epoch_us(ts) AS us, value,
                   ((((0.1 * LAG(value, 2) OVER w + 0.2 * LAG(value, 1) OVER w)
                      + 0.4 * value)
                      + 0.2 * LEAD(value, 1) OVER w)
                      + 0.1 * LEAD(value, 2) OVER w) AS smoothed
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ) WHERE smoothed IS NOT NULL
    """,
    "events_mad_threshold": """
        SELECT event_type,
               CAST(MEDIAN(ABS(value)) AS DOUBLE) AS mad_median,
               CAST(4.0 * CAST(MEDIAN(ABS(value)) AS DOUBLE) / 0.6745 AS DOUBLE) AS threshold,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
    """,
    "events_stream_bounds": """
        SELECT event_type,
               MIN(epoch_us(ts)) AS ts_first,
               MAX(epoch_us(ts)) AS ts_last,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY event_type
    """,
    "docs_exact_dedup": """
        SELECT md5(text) AS text_hash,
               MIN(doc_id) AS canonical_id,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    "docs_token_stats": """
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
                   AS n_distinct_tokens,
               CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS BIGINT) AS n_token_chars,
               CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
                   / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS avg_token_len
        FROM documents
    """,
    "docs_quality": """
        SELECT doc_id,
               CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                   / nullif(CAST(length(text) AS DOUBLE), 0.0) AS alpha_ratio,
               CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                   / nullif(CAST(length(text) AS DOUBLE), 0.0) AS digit_ratio,
               CAST(length(regexp_replace(text, '[^\\s]', '', 'g')) AS DOUBLE)
                   / nullif(CAST(length(text) AS DOUBLE), 0.0) AS space_ratio,
               CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                        t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
                   / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS stopword_ratio,
               0.4 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                      / nullif(CAST(length(text) AS DOUBLE), 0.0))
             + 0.3 * (CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                        t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
                      / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE))
             + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                      / nullif(CAST(length(text) AS DOUBLE), 0.0)) AS quality_score
        FROM documents
    """,
}

def _detect_cte(multiplier: float, width: int, chan_pred: str) -> str:
    """CTE chain replaying the spike-detection pipeline in SQL:
    per-user rn streams → exact-median MAD threshold → debounced
    crossings (LEAD) → greedy censor as a RECURSIVE CTE (each iteration
    keeps, per user, the first crossing strictly more than ``width``
    after the last kept edge — the reference's sequential loop) →
    peak re-location as first-argmax over the ±4 center window."""
    mult = repr(float(multiplier))
    return f"""
        WITH RECURSIVE {_ORDERED_LISTS_CTE}, thr AS (
            SELECT user_id,
                   ({mult} * CAST(MEDIAN(ABS(value)) AS DOUBLE)) / 0.6745 AS threshold
            FROM ordered WHERE {chan_pred} GROUP BY user_id
        ), nxt AS (
            SELECT user_id, rn, value,
                   LEAD(value) OVER (PARTITION BY user_id ORDER BY rn) AS next_value
            FROM ordered WHERE {chan_pred}
        ), cr AS (
            SELECT n.user_id, n.rn
            FROM nxt n JOIN thr t ON n.user_id = t.user_id
            WHERE n.value > t.threshold AND n.next_value > t.threshold
        ), kept AS (
            SELECT c.user_id, c.rn FROM cr c
            WHERE NOT EXISTS (
                SELECT 1 FROM cr c2 WHERE c2.user_id = c.user_id AND c2.rn < c.rn)
            UNION ALL
            SELECT c.user_id, c.rn
            FROM cr c JOIN kept k ON c.user_id = k.user_id AND c.rn > k.rn + {width}
            WHERE NOT EXISTS (
                SELECT 1 FROM cr c2
                WHERE c2.user_id = c.user_id AND c2.rn > k.rn + {width} AND c2.rn < c.rn)
        ), located AS (
            SELECT k.user_id, k.rn AS crossing_seq, l.xs, l.n,
                   GREATEST(k.rn - 4, 0)
                     + CAST(list_position(
                           list_slice(l.xs, GREATEST(k.rn - 4, 0) + 1, LEAST(k.rn + 4, l.n)),
                           list_max(list_slice(l.xs, GREATEST(k.rn - 4, 0) + 1, LEAST(k.rn + 4, l.n)))
                       ) AS BIGINT) - 1 AS peak_seq
            FROM kept k JOIN lists l ON k.user_id = l.user_id
        )"""


def _signal_oracles() -> dict[str, str]:
    """Exact oracles for the filter/detection chain. The FIR queries
    reproduce dsp.fir_zero_phase's ascending-tap left fold bit-for-bit;
    the detection queries replay threshold→crossings→censor→extract with
    a recursive-CTE censor; align adds the closed-form parabola vertex +
    np.interp-convention piecewise-linear resample (float32-rounded like
    the pandas kernel)."""
    filtfilt = f"""
        WITH {_ORDERED_LISTS_CTE}
        SELECT o.user_id, o.rn AS seq, {_fir_chain_sql(_BP_TAPS)} AS filtered
        FROM ordered o JOIN lists l ON o.user_id = l.user_id"""

    decimate = f"""
        WITH {_ORDERED_LISTS_CTE}
        SELECT o.user_id, o.rn AS seq, {_fir_chain_sql(_LP_TAPS)} AS filtered
        FROM ordered o JOIN lists l ON o.user_id = l.user_id
        WHERE o.rn % 4 = 0"""

    detect = f"""{_detect_cte(2.0, 5, "TRUE")}
        SELECT d.user_id, d.crossing_seq, d.peak_seq, CAST(t.j AS BIGINT) AS idx,
               CASE WHEN d.peak_seq - 4 + t.j BETWEEN 0 AND d.n - 1
                    THEN d.xs[d.peak_seq - 4 + t.j + 1] ELSE 0.0 END AS wv
        FROM located d, UNNEST(generate_series(0, 7)) AS t(j)"""

    tetrode = f"""{_detect_cte(1.0, 5, "user_id = 0")}, pk AS (
            SELECT DISTINCT peak_seq FROM located
        ), patches AS (
            SELECT p.peak_seq, l.user_id AS ch, l.xs,
                   GREATEST(p.peak_seq - 4, 0) AS lo,
                   LEAST(p.peak_seq + 4, l.n) AS hi
            FROM pk p, lists l WHERE l.user_id < 4
        ), ok AS (
            SELECT peak_seq FROM patches GROUP BY peak_seq
            HAVING COUNT(*) = 4 AND MIN(hi - lo) > 0
        )
        SELECT p.peak_seq, CAST(p.ch * 8 + t.j AS BIGINT) AS idx,
               CAST(CAST(CASE WHEN t.j < p.hi - p.lo
                    THEN p.xs[p.lo + t.j + 1] ELSE 0.0 END AS FLOAT) AS DOUBLE) AS wv
        FROM patches p, ok o, UNNEST(generate_series(0, 7)) AS t(j)
        WHERE p.peak_seq = o.peak_seq"""

    align = f"""{_detect_cte(2.0, 5, "user_id < 32")}, wvs AS (
            SELECT user_id, crossing_seq, peak_seq,
                   list_transform(generate_series(0, 7), j ->
                       CAST(CAST(CASE WHEN peak_seq - 4 + j BETWEEN 0 AND n - 1
                            THEN xs[peak_seq - 4 + j + 1] ELSE 0.0 END AS FLOAT) AS DOUBLE)) AS w
            FROM located
        ), pk2 AS (
            SELECT user_id, crossing_seq, peak_seq, w,
                   CAST(list_position(w, list_max(w)) AS BIGINT) - 1 AS p
            FROM wvs
        ), fr AS (
            SELECT user_id, crossing_seq, peak_seq, w,
                   CASE WHEN p BETWEEN 1 AND 6
                             AND ((w[p] - 2.0 * w[p+1]) + w[p+2]) != 0.0
                        THEN CAST(p AS DOUBLE)
                             + (w[p] - w[p+2]) / (2.0 * ((w[p] - 2.0 * w[p+1]) + w[p+2]))
                        ELSE CAST(p AS DOUBLE) END AS frac
            FROM pk2
        ), grid AS (
            SELECT user_id, crossing_seq, peak_seq, w, CAST(t.i AS BIGINT) AS idx,
                   LEAST(GREATEST(frac + CAST(t.i - 4 AS DOUBLE), 0.0), 7.0) AS q
            FROM fr, UNNEST(generate_series(0, 7)) AS t(i)
        )
        SELECT user_id, peak_seq, idx,
               CAST(CAST(CASE WHEN q >= 7.0 THEN w[8]
                    ELSE (w[CAST(FLOOR(q) AS BIGINT) + 2] - w[CAST(FLOOR(q) AS BIGINT) + 1])
                         * (q - FLOOR(q)) + w[CAST(FLOOR(q) AS BIGINT) + 1]
               END AS FLOAT) AS DOUBLE) AS av
        FROM grid"""

    # W6 cspline: the n=8 natural-cubic tridiagonal solve (b=4, a=c=1)
    # has CONSTANT Thomas coefficients — compute them with the exact
    # float ops dsp.cubic_spline_eval uses and embed their reprs, so the
    # unrolled forward sweep / back substitution is bit-identical.
    _n = 8
    _cp = [0.0] * (_n - 2)
    _m = [4.0] * (_n - 2)
    _cp[0] = 1.0 / 4.0
    for _i in range(1, _n - 2):
        _m[_i] = 4.0 - 1.0 * _cp[_i - 1]
        _cp[_i] = (1.0 / _m[_i]) if _i < _n - 3 else 0.0
    _rhs = [
        f"(6.0 * ((w[{_j + 3}] - 2.0 * w[{_j + 2}]) + w[{_j + 1}]))"
        for _j in range(_n - 2)
    ]
    _dp_exprs = [f"({_rhs[0]} / 4.0) AS dp0"] + [
        f"(({_rhs[_i]} - dp{_i - 1}) / {_m[_i]!r}) AS dp{_i}"
        for _i in range(1, _n - 2)
    ]
    _m_exprs = ["dp5 AS M6"] + [
        f"(dp{_i} - {_cp[_i]!r} * M{_i + 2}) AS M{_i + 1}"
        for _i in range(_n - 4, -1, -1)
    ]
    _tt = "(q - CAST(j AS DOUBLE))"
    _u = f"(1.0 - {_tt})"
    _av = (
        f"((((Ml[j+1] * (({_u} * {_u}) * {_u})) / 6.0)"
        f" + ((Ml[j+2] * (({_tt} * {_tt}) * {_tt})) / 6.0))"
        f" + ((w[j+1] - Ml[j+1] / 6.0) * {_u}))"
        f" + ((w[j+2] - Ml[j+2] / 6.0) * {_tt})"
    )
    align_cspline = f"""{_detect_cte(1.5, 5, "user_id < 16")}, wvs AS (
            SELECT user_id, crossing_seq, peak_seq,
                   list_transform(generate_series(0, 7), j ->
                       CAST(CAST(CASE WHEN peak_seq - 4 + j BETWEEN 0 AND n - 1
                            THEN xs[peak_seq - 4 + j + 1] ELSE 0.0 END AS FLOAT) AS DOUBLE)) AS w
            FROM located
        ), pk2 AS (
            SELECT user_id, crossing_seq, peak_seq, w,
                   CAST(list_position(w, list_max(w)) AS BIGINT) - 1 AS p
            FROM wvs
        ), fr AS (
            SELECT user_id, crossing_seq, peak_seq, w,
                   CASE WHEN p BETWEEN 1 AND 6
                             AND ((w[p] - 2.0 * w[p+1]) + w[p+2]) != 0.0
                        THEN CAST(p AS DOUBLE)
                             + (w[p] - w[p+2]) / (2.0 * ((w[p] - 2.0 * w[p+1]) + w[p+2]))
                        ELSE CAST(p AS DOUBLE) END AS frac
            FROM pk2
        ), spl AS (
            SELECT user_id, crossing_seq, peak_seq, w, frac,
                   {', '.join(_dp_exprs)},
                   {', '.join(_m_exprs)}
            FROM fr
        ), msl AS (
            SELECT user_id, crossing_seq, peak_seq, w, frac,
                   [0.0, M1, M2, M3, M4, M5, M6, 0.0] AS Ml
            FROM spl
        ), grid AS (
            SELECT user_id, crossing_seq, peak_seq, w, Ml, CAST(t.i AS BIGINT) AS idx,
                   LEAST(GREATEST(frac + CAST(t.i - 4 AS DOUBLE), 0.0), 7.0) AS q
            FROM msl, UNNEST(generate_series(0, 7)) AS t(i)
        ), ev AS (
            SELECT user_id, peak_seq, idx, w, Ml, q,
                   LEAST(CAST(FLOOR(q) AS BIGINT), 6) AS j
            FROM grid
        )
        SELECT user_id, peak_seq, idx,
               CAST(CAST(({_av}) AS FLOAT) AS DOUBLE) AS av
        FROM ev"""

    return {
        "events_filtfilt": filtfilt,
        "events_decimate": decimate,
        "events_detect_spikes": detect,
        "events_tetrode": tetrode,
        "events_align": align,
        "events_align_cspline": align_cspline,
    }


def _extension_oracles() -> dict[str, str]:
    """Oracles for the common-ref/ANN/multimodal extension queries."""
    dedup_cte = """
        WITH dedup AS (
            SELECT user_id, minute, value FROM (
                SELECT user_id, epoch_us(ts) // 60000000 AS minute, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts) // 60000000
                            ORDER BY epoch_us(ts), event_id) AS rn
                FROM events
            ) WHERE rn = 1
        )"""
    common_ref = f"""{dedup_cte}, iv AS (
            SELECT user_id, minute, CAST(floor(value * 1000) AS BIGINT) AS iv FROM dedup
        ), ref AS (
            SELECT minute, AVG(iv) AS m FROM iv GROUP BY minute
        )
        SELECT i.user_id, i.minute, i.iv,
               CAST(i.iv - r.m AS DOUBLE) AS value_ref
        FROM iv i JOIN ref r ON i.minute = r.minute"""

    def _lsh_parts(n_planes: int):
        terms = []
        for j in range(n_planes):
            signs = "[" + ", ".join(str(sim._plane_sign(j, i)) for i in range(64)) + "]"
            terms.append(
                f"CAST(list_sum(list_transform(generate_series(1, 64), i -> ({signs}[i]) * iv[i])) AS BIGINT) AS p{j}"
            )
        bexpr = " + ".join(f"(CASE WHEN p{j} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(n_planes))
        msks = ", ".join(str(m) for m in [0] + [1 << j for j in range(n_planes)])
        return terms, bexpr, msks

    plane_terms, bucket_expr, _ = _lsh_parts(8)
    # the top-k query runs 6 planes (64 buckets): at fixture scale the
    # 8-plane table is so sparse (~2 vectors/bucket) that even
    # multi-probe recall collapses — 6 planes keeps the sub-linear
    # bucket-join shape with usable occupancy (recall audited by
    # emb_ann_recall)
    plane_terms6, bucket_expr6, masks6 = _lsh_parts(6)
    pair_dot = (
        "CAST(list_sum(list_transform(generate_series(1, len(q.iv)), "
        "i -> q.iv[i] * c.iv[i])) AS BIGINT)"
    )
    ann_lsh = f"""
        WITH base AS (
            SELECT vec_id, list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * {sim.EMB_SCALE}) AS BIGINT)) AS iv
            FROM embeddings
        ), normed AS (
            SELECT vec_id, iv,
                   CAST(list_sum(list_transform(generate_series(1, len(iv)),
                        i -> iv[i] * iv[i])) AS BIGINT) AS nrm
            FROM base
        ), proj AS (
            SELECT vec_id, {', '.join(plane_terms6)} FROM base
        ), bucketed AS (
            SELECT vec_id, CAST({bucket_expr6} AS BIGINT) AS bucket FROM proj
        ), qprobes AS (
            -- multi-probe: the probe's own bucket + every Hamming-1 flip
            SELECT b.vec_id, xor(b.bucket, t.m) AS pb
            FROM bucketed b, UNNEST([{masks6}]) AS t(m)
            WHERE b.vec_id < 20
        ), scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {pair_dot} AS dot,
                   q.nrm AS nrm_a, c.nrm AS nrm_b
            FROM qprobes p
            JOIN normed q ON q.vec_id = p.vec_id
            JOIN bucketed cb ON cb.bucket = p.pb AND cb.vec_id != p.vec_id
            JOIN normed c ON c.vec_id = cb.vec_id
        ), ranked AS (
            SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY dot DESC, neighbor_id ASC) AS BIGINT) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, rank,
               dot / (sqrt(CAST(nrm_a AS DOUBLE)) * sqrt(CAST(nrm_b AS DOUBLE))) AS cos
        FROM ranked WHERE rank <= 5"""

    media_stats = """
        WITH b AS (
            SELECT doc_id AS media_id,
                   CAST(length(text) AS BIGINT) AS n_bytes,
                   CAST(COALESCE(list_sum(list_transform(generate_series(1, length(text)),
                        i -> ord(substr(text, i, 1)))), 0) AS BIGINT) AS byte_sum
            FROM documents WHERE length(text) = strlen(text)
        )
        SELECT media_id, n_bytes, byte_sum,
               CASE WHEN n_bytes = 0 THEN 0.0
                    ELSE CAST(byte_sum AS DOUBLE) / CAST(n_bytes * 255 AS DOUBLE)
               END AS mean_px
        FROM b"""

    masks = ", ".join(str(m) for m in [0] + [1 << j for j in range(8)])
    neardup_lsh = f"""
        WITH base AS (
            SELECT vec_id, list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * {sim.EMB_SCALE}) AS BIGINT)) AS iv
            FROM embeddings
        ), normed AS (
            SELECT vec_id, iv,
                   CAST(list_sum(list_transform(generate_series(1, len(iv)),
                        i -> iv[i] * iv[i])) AS BIGINT) AS nrm
            FROM base
        ), proj AS (
            SELECT vec_id, {', '.join(plane_terms)} FROM base
        ), bucketed AS (
            SELECT vec_id, CAST({bucket_expr} AS BIGINT) AS bucket FROM proj
        ), probes AS (
            SELECT b.vec_id, xor(b.bucket, t.m) AS pb
            FROM bucketed b, UNNEST([{masks}]) AS t(m)
        ), scored AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b, {pair_dot.replace('q.', 'a.').replace('c.', 'b.')} AS dot,
                   a.nrm AS nrm_a, b.nrm AS nrm_b
            FROM probes p
            JOIN bucketed cb ON cb.bucket = p.pb AND p.vec_id < cb.vec_id
            JOIN normed a ON a.vec_id = p.vec_id
            JOIN normed b ON b.vec_id = cb.vec_id
        )
        SELECT id_a, id_b,
               dot / (sqrt(CAST(nrm_a AS DOUBLE)) * sqrt(CAST(nrm_b AS DOUBLE))) AS cos
        FROM scored
        WHERE dot / (sqrt(CAST(nrm_a AS DOUBLE)) * sqrt(CAST(nrm_b AS DOUBLE))) >= 0.35"""

    return {
        "events_common_ref": common_ref,
        "emb_ann_topk_lsh": ann_lsh,
        "docs_media_stats": media_stats,
        "emb_cosine_neardup_lsh": neardup_lsh,
    }


ORACLE_SQL.update(_similarity_oracles())
ORACLE_SQL.update(_text_oracles())
ORACLE_SQL.update(_extension_oracles())
ORACLE_SQL.update(_signal_oracles())
ORACLE_SQL["docs_curation_funnel"] = _funnel_oracle()

# v2: the funnel over the keep-first substring-cut corpus (Lee et al.
# detection + canonical-occurrence exemption + surgery as prefix CTEs
# — the same SQL as docs_substring_dedup_keepfirst, CTEs suffixed '0'
# to avoid colliding with the funnel's toks/d — then documents the
# surgery emptied are dropped and the whole funnel runs on the cut
# text, emitting the cleaned text alongside the score).
_SSD_KEEPFIRST_PREFIX = """toks0 AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), win0 AS MATERIALIZED (
        SELECT doc_id, CAST(s.i AS BIGINT) AS pos,
               md5(array_to_string(list_slice(t, s.i + 1, s.i + 8), ' ')) AS h
        FROM toks0, UNNEST(generate_series(0, len(t) - 8)) AS s(i)
        WHERE len(t) >= 8
    ), dup0 AS MATERIALIZED (
        SELECT h, MIN(struct_pack(id := doc_id, pos := pos)) AS firstkey
        FROM win0 GROUP BY h HAVING count(*) >= 2
    ), d0 AS (
        SELECT w.doc_id, w.pos FROM win0 w JOIN dup0 USING (h)
        WHERE struct_pack(id := w.doc_id, pos := w.pos) <> dup0.firstkey
    ), isl0 AS (
        SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM d0
    ), spans0 AS (
        SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS a,
               CAST(MAX(pos) - MIN(pos) + 8 AS BIGINT) AS l
        FROM isl0 GROUP BY doc_id, grp
    ), sp0 AS (
        SELECT doc_id, list(struct_pack(a := a, l := l)) AS sps
        FROM spans0 GROUP BY doc_id
    ), cleaned0 AS (
        SELECT t.doc_id, array_to_string(
            CASE WHEN p.sps IS NULL THEN t.t
                 ELSE list_filter(t.t, (x, i) ->
                      len(list_filter(p.sps, q ->
                          i - 1 >= q.a AND i - 1 < q.a + q.l)) = 0)
            END, ' ') AS text
        FROM toks0 t LEFT JOIN sp0 p USING (doc_id)
    ), base0 AS MATERIALIZED (
        SELECT doc_id, text FROM cleaned0 WHERE length(text) > 0
    ), """

ORACLE_SQL["docs_curation_funnel_v2"] = _funnel_oracle(
    prefix_ctes=_SSD_KEEPFIRST_PREFIX,
    corpus="base0",
    final_cols="doc_id, text AS clean_text, quality_score",
)


def _stream_curation_oracle() -> str:
    """The streamed funnel's replay (r18): score → quality/language
    filter → DISTINCT content hash (exact dedup — quality_score is a
    pure function of the text, so DISTINCT over (hash, score) is the
    whichever-arrival-wins streaming dedup's deterministic image) →
    md5 hash-sample keyed on the content hash. No near-dup stage (the
    streamed operator deliberately omits it — a connected component is
    a global property of the pair graph)."""
    ratio = _curation_ratio()
    return f"""
    WITH scored AS (
        SELECT text, {_CURATION_QUALITY} AS quality_score,
               {ratio['en']} AS s_en, {ratio['fr']} AS s_fr,
               {ratio['de']} AS s_de, {ratio['es']} AS s_es
        FROM documents
    ), f1 AS (
        SELECT text, quality_score FROM scored
        WHERE quality_score >= 0.6 AND {_CURATION_CASE_LANG} = 'en'
    ), d AS (
        SELECT DISTINCT md5(text) AS content_hash, quality_score FROM f1
    )
    SELECT content_hash, quality_score FROM d
    WHERE ('0x' || substr(md5(content_hash), 1, 8))::BIGINT < {1 << 31}"""


ORACLE_SQL["docs_curation_streamed"] = _stream_curation_oracle()

# As-of join: the oracle is DuckDB's NATIVE ASOF LEFT JOIN — an
# independent implementation of the same semantics, cross-validating
# the engine's union+window-carry formulation.
ORACLE_SQL["events_asof"] = """
    WITH v AS (
        SELECT user_id, epoch_us(ts) AS us, event_id AS view_id, value
        FROM events WHERE event_type = 'view'
    ), p0 AS (
        SELECT user_id, epoch_us(ts) AS us, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts)
                    ORDER BY event_id) AS rn
        FROM events WHERE event_type = 'purchase'
    ), p AS (
        SELECT user_id, us, value FROM p0 WHERE rn = 1
    )
    SELECT v.user_id, v.us AS view_us, v.view_id,
           p.us AS purchase_us, p.value AS purchase_value
    FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.us >= p.us"""

# nearest = closer of DuckDB's native backward and forward ASOF joins,
# backward on exact ties (pandas merge_asof semantics)
ORACLE_SQL["events_asof_nearest"] = """
    WITH v AS (
        SELECT user_id, epoch_us(ts) AS us, event_id AS view_id, value
        FROM events WHERE event_type = 'view'
    ), p0 AS (
        SELECT user_id, epoch_us(ts) AS us, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts)
                    ORDER BY event_id) AS rn
        FROM events WHERE event_type = 'purchase'
    ), p AS (
        SELECT user_id, us, value FROM p0 WHERE rn = 1
    ), b AS (
        SELECT v.user_id, v.us, v.view_id, p.us AS bus, p.value AS bval
        FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.us >= p.us
    ), f AS (
        SELECT v.user_id, v.us, v.view_id, p.us AS fus, p.value AS fval
        FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.us <= p.us
    )
    SELECT b.user_id, b.us AS view_us, b.view_id,
           CASE WHEN b.bus IS NULL THEN f.fus
                WHEN f.fus IS NULL THEN b.bus
                WHEN (b.us - b.bus) <= (f.fus - f.us) THEN b.bus
                ELSE f.fus END AS purchase_us,
           CASE WHEN b.bus IS NULL THEN f.fval
                WHEN f.fus IS NULL THEN b.bval
                WHEN (b.us - b.bus) <= (f.fus - f.us) THEN b.bval
                ELSE f.fval END AS purchase_value
    FROM b JOIN f ON b.user_id = f.user_id AND b.us = f.us AND b.view_id = f.view_id"""
# S11/A9 audit: one hash aggregation per user.
ORACLE_SQL["events_audit"] = """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT epoch_us(ts)) AS BIGINT) AS n_distinct,
           MIN(epoch_us(ts)) AS ts_min,
           MAX(epoch_us(ts)) AS ts_max,
           COUNT(*) != COUNT(DISTINCT epoch_us(ts)) AS has_duplicates
    FROM events GROUP BY user_id"""

# Frame sampling: every 3rd 16-byte frame, exact integer byte stats.
ORACLE_SQL["docs_media_frames"] = """
    WITH b AS (
        SELECT doc_id AS media_id, text, length(text) AS n_chars
        FROM documents WHERE length(text) = strlen(text)
    ), f AS (
        SELECT media_id, CAST(t.fi AS BIGINT) AS frame_idx,
               substr(text, CAST(t.fi * 16 + 1 AS BIGINT), 16) AS fr
        FROM b, UNNEST(generate_series(0, CAST(n_chars // 16 AS BIGINT) - 1, 3)) AS t(fi)
        WHERE n_chars >= 16
    )
    SELECT media_id, frame_idx, CAST(16 AS BIGINT) AS n_bytes,
           CAST(list_sum(list_transform(generate_series(1, 16),
                i -> ord(substr(fr, i, 1)))) AS BIGINT) AS byte_sum,
           CAST(list_sum(list_transform(generate_series(1, 16),
                i -> ord(substr(fr, i, 1)))) AS DOUBLE) / (16 * 255) AS mean_px
    FROM f"""

# Audio windowing: every full 32-byte window, exact integer deviation
# stats; rms is a fixed double chain (/32 and /128 are powers of two,
# sqrt is IEEE-correctly-rounded, so both engines agree bit-for-bit).
ORACLE_SQL["docs_media_audio"] = """
    WITH b AS (
        SELECT doc_id AS media_id, text, length(text) AS n
        FROM documents WHERE length(text) = strlen(text)
    ), w AS (
        SELECT media_id, CAST(t.wi AS BIGINT) AS window_idx,
               substr(text, CAST(t.wi * 32 + 1 AS BIGINT), 32) AS seg
        FROM b, UNNEST(generate_series(0, CAST(n // 32 AS BIGINT) - 1)) AS t(wi)
        WHERE n >= 32
    ), s AS (
        SELECT media_id, window_idx,
               CAST(list_sum(list_transform(generate_series(1, 32),
                    i -> (ord(substr(seg, i, 1)) - 128) * (ord(substr(seg, i, 1)) - 128))) AS BIGINT) AS sum_dev2,
               CAST(list_max(list_transform(generate_series(1, 32),
                    i -> abs(ord(substr(seg, i, 1)) - 128))) AS BIGINT) AS peak_dev,
               CAST(len(list_filter(generate_series(1, 32),
                    i -> abs(ord(substr(seg, i, 1)) - 128) >= 127)) AS BIGINT) AS n_clipped
        FROM w
    )
    SELECT media_id, window_idx, sum_dev2, peak_dev, n_clipped,
           sqrt(CAST(sum_dev2 AS DOUBLE) / 32) / 128 AS rms
    FROM s"""

# wav round-trip is lossless over byte-128 samples: same oracle as raw8
ORACLE_SQL["docs_media_wav_roundtrip"] = ORACLE_SQL["docs_media_audio"]
# FLAC round-trip is lossless over the same samples: same oracle again
ORACLE_SQL["docs_media_flac_roundtrip"] = ORACLE_SQL["docs_media_audio"]


def _mulaw_roundtrip_lut() -> list[int]:
    """decode(encode((b-128)*256)) for every byte b, from a scalar
    G.711 implementation written independently of the vectorized codec
    in operators/audio_codecs.py — the oracle's ground truth for the
    mu-law roundtrip query."""
    out = []
    for b in range(256):
        x = (b - 128) * 256
        s = 0x80 if x < 0 else 0
        m = min(abs(x), 32635) + 132
        e = (m >> 7).bit_length() - 1
        code = ~(s | (e << 4) | ((m >> (e + 3)) & 0xF)) & 0xFF
        c = ~code & 0xFF
        t = ((((c & 0xF) << 3) + 132) << ((c >> 4) & 7)) - 132
        out.append(-t if c & 0x80 else t)
    return out


# mu-law is stateless: the decoded sample is a pure function of the
# input byte, so the lossy roundtrip replays EXACTLY via the lookup.
_MULAW_LUT = "[" + ", ".join(str(v) for v in _mulaw_roundtrip_lut()) + "]"
ORACLE_SQL["docs_media_mulaw_roundtrip"] = f"""
    WITH lut AS (SELECT {_MULAW_LUT} AS l), b AS (
        SELECT doc_id AS media_id, text, length(text) AS n
        FROM documents WHERE length(text) = strlen(text)
    ), w AS (
        SELECT media_id, CAST(t.wi AS BIGINT) AS window_idx,
               substr(text, CAST(t.wi * 32 + 1 AS BIGINT), 32) AS seg
        FROM b, UNNEST(generate_series(0, CAST(n // 32 AS BIGINT) - 1)) AS t(wi)
        WHERE n >= 32
    ), s AS (
        SELECT media_id, window_idx,
               CAST(list_sum(list_transform(generate_series(1, 32),
                    i -> l[ord(substr(seg, i, 1)) + 1] * l[ord(substr(seg, i, 1)) + 1])) AS BIGINT) AS sum_dec2,
               CAST(list_max(list_transform(generate_series(1, 32),
                    i -> abs(l[ord(substr(seg, i, 1)) + 1]))) AS BIGINT) AS peak_dec,
               CAST(list_sum(list_transform(generate_series(1, 32),
                    i -> (l[ord(substr(seg, i, 1)) + 1] - (ord(substr(seg, i, 1)) - 128) * 256)
                       * (l[ord(substr(seg, i, 1)) + 1] - (ord(substr(seg, i, 1)) - 128) * 256))) AS BIGINT) AS sum_err2
        FROM w, lut
    )
    SELECT media_id, window_idx, sum_dec2, peak_dec, sum_err2,
           sqrt(CAST(sum_dec2 AS DOUBLE) / 32) / 32768 AS rms
    FROM s"""

# ADPCM is stateful (not per-sample SQL-expressible); the oracle checks
# exact original-sample stats, the 4-bit rate law, and hardcodes the
# decode_exact invariant the kernel computes bit-exactly (any codec bug
# flips it and the driver hash goes red).
ORACLE_SQL["docs_media_adpcm_roundtrip"] = """
    WITH b AS (
        SELECT doc_id AS media_id, text, length(text) AS n
        FROM documents WHERE length(text) = strlen(text) AND length(text) >= 1
    ), s AS (
        SELECT media_id, CAST(n AS BIGINT) AS n_samples,
               CAST((n + 1) // 2 AS BIGINT) AS n_adpcm_bytes,
               CAST(list_sum(list_transform(generate_series(1, n),
                    i -> (ord(substr(text, i, 1)) - 128) * 256)) AS BIGINT) AS orig_sum,
               CAST(list_max(list_transform(generate_series(1, n),
                    i -> abs((ord(substr(text, i, 1)) - 128) * 256))) AS BIGINT) AS orig_peak
        FROM b
    )
    SELECT media_id, n_samples, n_adpcm_bytes, orig_sum, orig_peak,
           CAST(orig_sum AS DOUBLE) / n_samples AS mean_sample,
           TRUE AS decode_exact
    FROM s"""

# Nearest-neighbor resize to 4x8: per-output-pixel byte fetch with the
# same trunc(i*in/out) index mapping the kernel uses.
ORACLE_SQL["docs_media_resize"] = """
    WITH b AS (
        SELECT doc_id AS media_id, text,
               CAST(length(text) // 16 AS BIGINT) AS h
        FROM documents WHERE length(text) >= 16 AND length(text) = strlen(text)
    ), g AS (
        SELECT media_id, text, h, CAST(t.r AS BIGINT) AS r, CAST(t2.c AS BIGINT) AS c
        FROM b, UNNEST(generate_series(0, 3)) AS t(r),
                UNNEST(generate_series(0, 7)) AS t2(c)
    )
    SELECT media_id, r, c,
           CAST(ord(substr(text,
                CAST(LEAST(CAST(floor(r * h / 4.0) AS BIGINT), h - 1) * 16
                     + LEAST(CAST(floor(c * 16 / 8.0) AS BIGINT), 15) + 1 AS BIGINT),
                1)) AS BIGINT) AS px
    FROM g"""

# IVF with frozen integer centroids: assignment, nprobe selection and
# ranking replayed in exact BIGINT arithmetic.
_ivf_cent_rows = ",\n            ".join(
    f"({ci}, [{', '.join(str(v) for v in c)}])"
    for ci, c in enumerate(_IVF_FROZEN_CENTS)
)
ORACLE_SQL["emb_ann_topk_ivf_frozen"] = f"""
    WITH base AS (
        SELECT vec_id, list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * {sim.EMB_SCALE}) AS BIGINT)) AS iv
        FROM embeddings
    ), normed AS (
        SELECT vec_id, iv,
               CAST(list_sum(list_transform(generate_series(1, len(iv)),
                    i -> iv[i] * iv[i])) AS BIGINT) AS nrm
        FROM base
    ), cents(c, civ) AS (
        VALUES {_ivf_cent_rows}
    ), dists AS (
        SELECT n.vec_id, n.iv, n.nrm, c.c,
               CAST(list_sum(list_transform(generate_series(1, 64),
                    i -> (n.iv[i] - c.civ[i]) * (n.iv[i] - c.civ[i]))) AS BIGINT) AS d
        FROM normed n CROSS JOIN cents c
    ), corpus AS (
        SELECT vec_id, iv, nrm, c AS cl FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
            FROM dists
        ) WHERE rn = 1
    ), probes AS (
        SELECT vec_id, iv, nrm, c AS pcl FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
            FROM dists WHERE vec_id < 20
        ) WHERE rn <= 2
    ), scored AS (
        SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
               CAST(list_sum(list_transform(generate_series(1, len(q.iv)),
                    i -> q.iv[i] * t.iv[i])) AS BIGINT) AS dot,
               q.nrm AS nrm_a, t.nrm AS nrm_b
        FROM probes q JOIN corpus t ON q.pcl = t.cl AND t.vec_id != q.vec_id
    ), ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY dot DESC, neighbor_id ASC) AS BIGINT) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, rank,
           dot / (sqrt(CAST(nrm_a AS DOUBLE)) * sqrt(CAST(nrm_b AS DOUBLE))) AS cos
    FROM ranked WHERE rank <= 5"""

# Fitted IVF: the integer-quantized Lloyd fit unrolled as chained CTEs
# (seeds = 16 smallest vec_ids; per iteration: exact int64 argmin
# assignment → per-dim integer sums → floor-divided centroid update;
# empty clusters keep their previous centroid), then the same frozen
# search shape (nprobe=4). Bit-exact vs sim.ivf_fit_centroids +
# sim.ann_topk_ivf because every quantity on both sides is int64.
def _ivf_fit_prefix(
    k: int, n_iter: int, fit_fraction: float, fit_rows: int | None = None,
    fit_where: str = "TRUE",
) -> str:
    """WITH-prefix replaying the sampled integer IVF coarse fit:
    base → normed → fitset (the engine-portable md5 hash-sample, the
    Spark side's operators/sampling.hash_bucket construction; with
    ``fit_rows`` the ABSOLUTE variant — exactly the fit_rows
    smallest-hash rows, sampling.hash_sample_rows' ORDER BY bucket, id
    LIMIT n) → cents0..cents{n_iter}. The search half of each consumer
    still runs over the FULL corpus. ``fit_where`` restricts the FIT
    BASE only (the lifecycle query fits on the initially-written half
    and appends the rest with the frozen model — the sample filter
    composes with the hash threshold exactly like Spark's
    ivf_write_index(df.where(...)))."""
    fit_thr = int(fit_fraction * (1 << 32))
    fitset = (
        f"""
        SELECT vec_id, iv FROM normed WHERE ({fit_where})
        ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
                 vec_id
        LIMIT {fit_rows}"""
        if fit_rows is not None
        else f"""
        SELECT vec_id, iv FROM normed
        WHERE ({fit_where})
          AND ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT < {fit_thr}"""
    )
    its = []
    for i in range(n_iter):
        its.append(f"""
    , d{i} AS (
        SELECT n.vec_id, c.c,
               CAST(list_sum(list_transform(generate_series(1, 64),
                    j -> (n.iv[j] - c.civ[j]) * (n.iv[j] - c.civ[j]))) AS BIGINT) AS d
        FROM fitset n CROSS JOIN cents{i} c
    ), a{i} AS (
        SELECT vec_id, c FROM (
            SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
            FROM d{i}
        ) WHERE rn = 1
    ), s{i} AS (
        SELECT a.c, t.j, SUM(n.iv[t.j]) AS sv, COUNT(*) AS cnt
        FROM a{i} a JOIN fitset n USING (vec_id), UNNEST(generate_series(1, 64)) AS t(j)
        GROUP BY a.c, t.j
    ), cents{i + 1} AS (
        SELECT p.c, COALESCE(u.civ, p.civ) AS civ
        FROM cents{i} p LEFT JOIN (
            SELECT c, list(CAST(floor(CAST(sv AS DOUBLE) / cnt) AS BIGINT) ORDER BY j) AS civ
            FROM s{i} GROUP BY c
        ) u ON p.c = u.c
    )""")
    return f"""
    WITH base AS (
        SELECT vec_id, list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * {sim.EMB_SCALE}) AS BIGINT)) AS iv
        FROM embeddings
    ), normed AS (
        SELECT vec_id, iv,
               CAST(list_sum(list_transform(generate_series(1, len(iv)),
                    i -> iv[i] * iv[i])) AS BIGINT) AS nrm
        FROM base
    ), fitset AS ({fitset}
    ), cents0 AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS c, iv AS civ
        FROM (SELECT vec_id, iv FROM fitset ORDER BY vec_id LIMIT {k})
    ){''.join(its)}"""


def _ivf_fitted_oracle(
    k: int = 16,
    n_iter: int = 3,
    nprobe: int = 4,
    fit_fraction: float = 0.5,
    fit_rows: int | None = None,
    fit_where: str = "TRUE",
) -> str:
    return f"""{_ivf_fit_prefix(k, n_iter, fit_fraction, fit_rows, fit_where)}
    , fdist AS (
        SELECT n.vec_id, n.iv, n.nrm, c.c,
               CAST(list_sum(list_transform(generate_series(1, 64),
                    j -> (n.iv[j] - c.civ[j]) * (n.iv[j] - c.civ[j]))) AS BIGINT) AS d
        FROM normed n CROSS JOIN cents{n_iter} c
    ), corpus AS (
        SELECT vec_id, iv, nrm, c AS cl FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
            FROM fdist
        ) WHERE rn = 1
    ), probes AS (
        SELECT vec_id, iv, nrm, c AS pcl FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
            FROM fdist WHERE vec_id < 20
        ) WHERE rn <= {nprobe}
    ), scored AS (
        SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
               CAST(list_sum(list_transform(generate_series(1, len(q.iv)),
                    i -> q.iv[i] * t.iv[i])) AS BIGINT) AS dot,
               q.nrm AS nrm_a, t.nrm AS nrm_b
        FROM probes q JOIN corpus t ON q.pcl = t.cl AND t.vec_id != q.vec_id
    ), ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY dot DESC, neighbor_id ASC) AS BIGINT) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, rank,
           dot / (sqrt(CAST(nrm_a AS DOUBLE)) * sqrt(CAST(nrm_b AS DOUBLE))) AS cos
    FROM ranked WHERE rank <= 5"""


ORACLE_SQL["emb_ann_topk_ivf"] = _ivf_fitted_oracle()
# the persisted-index variant is bit-identical to the inline pipeline
# (same fit, same probes, same exact-integer scoring — only the
# physical layout differs: cell-partitioned parquet + static partition
# pruning), so it shares the fitted oracle verbatim
ORACLE_SQL["emb_ann_topk_ivf_prebuilt"] = ORACLE_SQL["emb_ann_topk_ivf"]

# Absolute-fit-budget variant (r13): identical fitted pipeline, but the
# fit sample is EXACTLY the 300 smallest-hash vectors (ORDER BY bucket,
# id LIMIT 300) — the fixed-size 100-TB fit shape as a first-class,
# hash-verified driver row.
ORACLE_SQL["emb_ann_topk_ivf_fitrows"] = _ivf_fitted_oracle(fit_rows=300)

# Index-lifecycle composition (r17): build on the even half (the fit
# sample is therefore the md5 hash-sample OF THE EVEN HALF), append the
# odd half with the FROZEN model, stats-driven compaction, then the
# partition-pruned search. Assignment uses the same frozen-centroid
# argmin for written and appended rows alike, and compaction is
# data-identical by construction — so the oracle is the fitted pipeline
# with only the fit base restricted; the hash match certifies the whole
# write→append→stats→compact→search lifecycle loses and invents nothing.
ORACLE_SQL["emb_index_lifecycle"] = _ivf_fitted_oracle(
    fit_where="(vec_id % 2) = 0"
)

# SemDeDup: same sampled Lloyd fit prefix as the IVF oracle, full-corpus
# argmin assignment, within-cluster pairwise cosine (id_a < id_b), drop
# any vector with a smaller-id neighbor >= threshold.
def _semantic_dedup_oracle(
    k: int = 16, n_iter: int = 3, threshold: float = 0.35,
    fit_fraction: float = 0.5, max_cluster: int | None = None,
) -> str:
    # Mirrors the engine's hot-cluster guard: rank every vector within
    # its cluster by the salted md5 hash (ties by id — the exact
    # hash_bucket construction), then sub-split into cells of at most
    # max_cluster; pairs are examined only within a (cluster, sub) cell.
    if max_cluster is None:
        sub_expr = "CAST(0 AS BIGINT)"
    else:
        sub_expr = (
            "CAST((ROW_NUMBER() OVER (PARTITION BY cl ORDER BY "
            "('0x' || substr(md5('#sub' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT, "
            f"vec_id) - 1) // {max_cluster} AS BIGINT)"
        )
    return f"""{_ivf_fit_prefix(k, n_iter, fit_fraction)}
    , fdist AS (
        SELECT n.vec_id, n.iv, n.nrm, c.c,
               CAST(list_sum(list_transform(generate_series(1, 64),
                    j -> (n.iv[j] - c.civ[j]) * (n.iv[j] - c.civ[j]))) AS BIGINT) AS d
        FROM normed n CROSS JOIN cents{n_iter} c
    ), corpus0 AS (
        SELECT vec_id, iv, nrm, CAST(c AS BIGINT) AS cl FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
            FROM fdist
        ) WHERE rn = 1
    ), corpus AS (
        SELECT vec_id, iv, nrm, cl, {sub_expr} AS sub FROM corpus0
    ), pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST(list_sum(list_transform(generate_series(1, len(a.iv)),
                    i -> a.iv[i] * b.iv[i])) AS BIGINT) AS dot,
               a.nrm AS nrm_a, b.nrm AS nrm_b
        FROM corpus a JOIN corpus b
          ON a.cl = b.cl AND a.sub = b.sub AND a.vec_id < b.vec_id
    ), dropped AS (
        SELECT DISTINCT id_b AS vec_id FROM pairs
        WHERE dot / (sqrt(CAST(nrm_a AS DOUBLE)) * sqrt(CAST(nrm_b AS DOUBLE)))
              >= {threshold}
    )
    SELECT c.vec_id, c.cl AS cluster, d.vec_id IS NULL AS kept
    FROM corpus c LEFT JOIN dropped d USING (vec_id)"""


ORACLE_SQL["emb_semantic_dedup"] = _semantic_dedup_oracle(
    max_cluster=_SEMDEDUP_MAX_CLUSTER
)


def _pq_fitted_oracle(
    k: int = 5,
    n_centroids: int = 16,
    n_iter: int = 3,
    nprobe: int = 4,
    m: int = 4,
    pq_k: int = 16,
    pq_iter: int = 2,
    refine: int = 32,
    fit_fraction: float = 0.5,
    dim: int = 64,
) -> str:
    """DuckDB replay of the WHOLE IVFADC pipeline: sampled integer IVF
    fit (shared prefix), sampled per-subspace integer PQ fits (subspace
    rides the CTEs as a key column — one Lloyd chain covers all ``m``
    codebooks), corpus cell assignment + PQ encode, per-probe ADC dot
    tables, cell-restricted ADC shortlist of ``refine``, exact integer
    re-rank."""
    d = dim // m
    pq_its = []
    for i in range(pq_iter):
        pq_its.append(f"""
    , pd{i} AS (
        SELECT n.vec_id, n.j, c.c,
               CAST(list_sum(list_transform(generate_series(1, {d}),
                    t -> (n.siv[t] - c.civ[t]) * (n.siv[t] - c.civ[t]))) AS BIGINT) AS dd
        FROM fitsub n JOIN pcents{i} c ON n.j = c.j
    ), pa{i} AS (
        SELECT vec_id, j, c FROM (
            SELECT vec_id, j, c, ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY dd, c) AS rn
            FROM pd{i}
        ) WHERE rn = 1
    ), ps{i} AS (
        SELECT a.j, a.c, t.t, SUM(n.siv[t.t]) AS sv, COUNT(*) AS cnt
        FROM pa{i} a JOIN fitsub n ON a.vec_id = n.vec_id AND a.j = n.j,
             UNNEST(generate_series(1, {d})) AS t(t)
        GROUP BY a.j, a.c, t.t
    ), pcents{i + 1} AS (
        SELECT p.j, p.c, COALESCE(u.civ, p.civ) AS civ
        FROM pcents{i} p LEFT JOIN (
            SELECT j, c, list(CAST(floor(CAST(sv AS DOUBLE) / cnt) AS BIGINT) ORDER BY t) AS civ
            FROM ps{i} GROUP BY j, c
        ) u ON p.j = u.j AND p.c = u.c
    )""")
    return f"""{_ivf_fit_prefix(n_centroids, n_iter, fit_fraction)}
    , fitsub AS (
        SELECT vec_id, sj.j, list_slice(iv, sj.j * {d} + 1, sj.j * {d} + {d}) AS siv
        FROM fitset, UNNEST(generate_series(0, {m - 1})) AS sj(j)
    ), pcents0 AS (
        SELECT s.j, CAST(ROW_NUMBER() OVER (PARTITION BY s.j ORDER BY s.vec_id) - 1 AS INT) AS c,
               s.siv AS civ
        FROM fitsub s
        WHERE s.vec_id IN (SELECT vec_id FROM fitset ORDER BY vec_id LIMIT {pq_k})
    ){''.join(pq_its)}
    , fdist AS (
        SELECT n.vec_id, n.nrm, c.c,
               CAST(list_sum(list_transform(generate_series(1, {dim}),
                    j -> (n.iv[j] - c.civ[j]) * (n.iv[j] - c.civ[j]))) AS BIGINT) AS d
        FROM normed n CROSS JOIN cents{n_iter} c
    ), cells AS (
        SELECT vec_id, c AS cl FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
            FROM fdist
        ) WHERE rn = 1
    ), allsub AS (
        SELECT vec_id, sj.j, list_slice(iv, sj.j * {d} + 1, sj.j * {d} + {d}) AS siv
        FROM normed, UNNEST(generate_series(0, {m - 1})) AS sj(j)
    ), ecodes AS (
        SELECT vec_id, j, c AS cj FROM (
            SELECT n.vec_id, n.j, c.c,
                   ROW_NUMBER() OVER (PARTITION BY n.vec_id, n.j ORDER BY
                        CAST(list_sum(list_transform(generate_series(1, {d}),
                             t -> (n.siv[t] - c.civ[t]) * (n.siv[t] - c.civ[t]))) AS BIGINT), c.c) AS rn
            FROM allsub n JOIN pcents{pq_iter} c ON n.j = c.j
        ) WHERE rn = 1
    ), pcells AS (
        SELECT vec_id, c AS pcl FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
            FROM fdist WHERE vec_id < 20
        ) WHERE rn <= {nprobe}
    ), ptab AS (
        SELECT q.vec_id, c.j, c.c,
               CAST(list_sum(list_transform(generate_series(1, {d}),
                    t -> q.siv[t] * c.civ[t])) AS BIGINT) AS tv
        FROM allsub q JOIN pcents{pq_iter} c ON q.j = c.j
        WHERE q.vec_id < 20
    ), adc AS (
        SELECT p.vec_id AS query_id, t.vec_id AS neighbor_id,
               CAST(SUM(pt.tv) AS BIGINT) AS adc
        FROM pcells p
        JOIN cells t ON p.pcl = t.cl AND t.vec_id != p.vec_id
        JOIN ecodes e ON e.vec_id = t.vec_id
        JOIN ptab pt ON pt.vec_id = p.vec_id AND pt.j = e.j AND pt.c = e.cj
        GROUP BY p.vec_id, t.vec_id
    ), shortlist AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY adc DESC, neighbor_id ASC) AS rr
            FROM adc
        ) WHERE rr <= {refine}
    ), rescored AS (
        SELECT s.query_id, s.neighbor_id,
               CAST(list_sum(list_transform(generate_series(1, {dim}),
                    i -> q.iv[i] * t.iv[i])) AS BIGINT) AS dot,
               q.nrm AS nrm_a, t.nrm AS nrm_b
        FROM shortlist s
        JOIN normed q ON q.vec_id = s.query_id
        JOIN normed t ON t.vec_id = s.neighbor_id
    ), rranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY dot DESC, neighbor_id ASC) AS BIGINT) AS rank
        FROM rescored
    )
    SELECT query_id, neighbor_id, rank,
           dot / (sqrt(CAST(nrm_a AS DOUBLE)) * sqrt(CAST(nrm_b AS DOUBLE))) AS cos
    FROM rranked WHERE rank <= {k}"""


ORACLE_SQL["emb_ann_topk_ivf_pq"] = _pq_fitted_oracle()
# the persisted codes-index variant is bit-identical to the inline
# IVFADC pipeline (same one-collect fit, same ADC + exact re-rank —
# only the physical layout differs: cell-partitioned codes parquet +
# static partition pruning), so it shares the fitted oracle verbatim
ORACLE_SQL["emb_ann_topk_ivf_pq_prebuilt"] = ORACLE_SQL["emb_ann_topk_ivf_pq"]

# F2 chunked: core-exact halo contract — same oracle as whole-epoch FIR.
ORACLE_SQL["events_filtfilt_chunked"] = ORACLE_SQL["events_filtfilt"]

# W1 chunked: result is exactly the global-window debounce — the oracle
# replays threshold + LEAD on the dense rn streams.
ORACLE_SQL["events_crossings_chunked"] = f"""
    WITH {_ORDERED_LISTS_CTE}, thr AS (
        SELECT user_id, CAST(MEDIAN(ABS(value)) AS DOUBLE) / 0.6745 AS threshold
        FROM ordered GROUP BY user_id
    ), led AS (
        SELECT user_id, rn, value,
               LEAD(value) OVER (PARTITION BY user_id ORDER BY rn) AS nv
        FROM ordered
    )
    SELECT o.user_id, o.rn AS seq, CAST(o.value AS DOUBLE) AS value
    FROM led o JOIN thr t ON o.user_id = t.user_id
    WHERE o.value > t.threshold AND o.nv > t.threshold"""

# chunk-level dedup over the same windows; canonical = (min doc, min
# chunk) lexicographic, matching min(struct) on the Spark side
ORACLE_SQL["docs_chunk_dedup"] = """
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), ck AS (
        SELECT doc_id, CAST(s.i AS BIGINT) AS chunk_idx,
               md5(array_to_string(list_slice(t, s.i * 24 + 1, s.i * 24 + 32), ' ')) AS chunk_hash
        FROM toks, UNNEST(generate_series(0, (len(t) - 1) // 24)) AS s(i)
    )
    SELECT chunk_hash, n_copies,
           CAST(mp // 4294967296 AS BIGINT) AS canonical_doc,
           CAST(mp % 4294967296 AS BIGINT) AS canonical_chunk
    FROM (
        SELECT chunk_hash, CAST(COUNT(*) AS BIGINT) AS n_copies,
               MIN(doc_id * 4294967296 + chunk_idx) AS mp
        FROM ck GROUP BY chunk_hash
    )"""

ORACLE_SQL["docs_repetition"] = """
    WITH g AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3 THEN
                   list_transform(generate_series(1, len(t) - 2),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
               ELSE [] END AS grams
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents)
    ), c AS (
        SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
               CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_grams
        FROM g
    )
    SELECT doc_id, n_grams, n_distinct_grams,
           CASE WHEN n_grams > 0
                THEN CAST(n_grams - n_distinct_grams AS DOUBLE) / CAST(n_grams AS DOUBLE)
                ELSE 0.0 END AS dup_frac,
           (CASE WHEN n_grams > 0
                THEN CAST(n_grams - n_distinct_grams AS DOUBLE) / CAST(n_grams AS DOUBLE)
                ELSE 0.0 END) > 0.05 AS is_repetitive
    FROM c"""

ORACLE_SQL["docs_decontaminate"] = f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sh AS (
        SELECT doc_id, CASE WHEN len(t) >= 8 THEN
            list_distinct(list_transform(generate_series(1, len(t) - 7),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' '
                  || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7]))
            ELSE [] END AS shingles FROM toks
    ), hashes AS (
        SELECT doc_id, ('0x' || substr(md5(s.s), 1, 8))::BIGINT % {sim.P} AS h
        FROM sh, UNNEST(shingles) AS s(s)
    ), ev AS (
        SELECT DISTINCT h FROM hashes WHERE doc_id % 50 = 0
    ), shared AS (
        SELECT t.doc_id, CAST(COUNT(DISTINCT t.h) AS BIGINT) AS n_shared
        FROM hashes t JOIN ev USING (h)
        WHERE t.doc_id % 50 != 0
        GROUP BY t.doc_id
    )
    SELECT d.doc_id, COALESCE(s.n_shared, 0) AS n_shared,
           COALESCE(s.n_shared, 0) >= 2 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 50 != 0) d
    LEFT JOIN shared s ON d.doc_id = s.doc_id"""

# Sequence packing: chunk starts every 24 tokens, 32-token windows
# (ragged tail kept); DuckDB list_slice clamps exactly like Spark slice
# PNG round-trip is lossless: the oracle is the plain raw-byte stats
ORACLE_SQL["docs_media_png_roundtrip"] = """
    WITH b AS (
        SELECT doc_id AS media_id,
               CAST(length(text) AS BIGINT) AS n_bytes,
               CAST(COALESCE(list_sum(list_transform(generate_series(1, length(text)),
                    i -> ord(substr(text, i, 1)))), 0) AS BIGINT) AS byte_sum
        FROM documents WHERE length(text) = strlen(text)
    )
    SELECT media_id, n_bytes, byte_sum,
           CASE WHEN n_bytes = 0 THEN 0.0
                ELSE CAST(byte_sum AS DOUBLE) / CAST(n_bytes * 255 AS DOUBLE)
           END AS mean_px
    FROM b"""

# JPEG round-trip: lossy, so the oracle scores the ORIGINAL pixel
# statistics (zero padding adds nothing to the sum) and the constant
# tolerance flag the kernel asserts; a codec bug flips roundtrip_ok and
# breaks the hash. Dims: width 24, height = ceil(bytes/24) (min 1).
ORACLE_SQL["docs_media_jpeg_stats"] = """
    WITH b AS (
        SELECT doc_id AS media_id,
               CAST(length(text) AS BIGINT) AS n_bytes,
               CAST(COALESCE(list_sum(list_transform(generate_series(1, length(text)),
                    i -> ord(substr(text, i, 1)))), 0) AS BIGINT) AS byte_sum
        FROM documents WHERE length(text) = strlen(text)
    )
    SELECT media_id,
           CAST(GREATEST(1, CAST(ceil(n_bytes / 24.0) AS BIGINT)) AS INT) AS height,
           24 AS width,
           GREATEST(1, CAST(ceil(n_bytes / 24.0) AS BIGINT)) * 24 AS n_px,
           byte_sum AS orig_sum,
           CAST(byte_sum AS DOUBLE)
               / CAST(GREATEST(1, CAST(ceil(n_bytes / 24.0) AS BIGINT)) * 24 * 255
                      AS DOUBLE) AS mean_px,
           TRUE AS roundtrip_ok
    FROM b"""

# Progressive twin: identical oracle — the encoder writes the same
# quantized coefficients under a multi-scan script, so the decoded
# pixels (hence the tolerance flag) must match the baseline path.
ORACLE_SQL["docs_media_jpeg_progressive"] = ORACLE_SQL["docs_media_jpeg_stats"]

# GIF roundtrip is lossless with an identity gray palette — the oracle
# is the same plain raw-byte statistics as PNG's.
ORACLE_SQL["docs_media_gif_roundtrip"] = ORACLE_SQL["docs_media_png_roundtrip"]

# MJPEG video roundtrip: one row per 256-byte (16x16) frame with exact
# original-byte stats; the frame_ok flag (container header survival +
# per-pixel tolerance) is the hash-verified codec signal.
ORACLE_SQL["docs_media_mjpeg_video"] = """
    WITH b AS (
        SELECT doc_id AS media_id,
               CAST(length(text) // 256 AS BIGINT) AS nf, text
        FROM documents WHERE length(text) = strlen(text) AND length(text) >= 256
    ), f AS (
        SELECT media_id, CAST(s.i AS BIGINT) AS frame_idx,
               CAST(list_sum(list_transform(
                        generate_series(s.i * 256 + 1, s.i * 256 + 256),
                        j -> ord(substr(text, j, 1)))) AS BIGINT) AS orig_sum
        FROM b, UNNEST(generate_series(0, nf - 1)) AS s(i)
    )
    SELECT media_id, frame_idx, 16 AS height, 16 AS width, orig_sum,
           CAST(orig_sum AS DOUBLE) / (256 * 255) AS mean_px,
           TRUE AS frame_ok
    FROM f"""

# MPEG-1 intra video shares MJPEG's frame geometry and output shape —
# identical oracle; the codec signal is the hash-verified frame_ok.
ORACLE_SQL["docs_media_mpeg1_video"] = ORACLE_SQL["docs_media_mjpeg_video"]

# Motion-compensated MPEG-1 (I+P): 32x8 frames (256 B — two
# macroblock ROWS so the in-plane dy=+8 match exists, 8 columns so
# the ~550-byte-max ASCII corpus yields MULTI-frame streams with real
# P pictures) cut at an 8-row/64-byte overlap stride (frame i covers
# bytes [i*64, i*64+256) -> nf = (len-256)//64 + 1), so consecutive
# frames are 8-row vertical shifts of each other and the P pictures
# genuinely motion-compensate. frame_ok is the hash-verified
# decode == closed-loop-reconstruction flag.
ORACLE_SQL["docs_media_mpeg1_pframes"] = """
    WITH b AS (
        SELECT doc_id AS media_id,
               CAST((length(text) - 256) // 64 + 1 AS BIGINT) AS nf, text
        FROM documents WHERE length(text) = strlen(text) AND length(text) >= 256
    ), f AS (
        SELECT media_id, CAST(s.i AS BIGINT) AS frame_idx,
               CAST(list_sum(list_transform(
                        generate_series(s.i * 64 + 1, s.i * 64 + 256),
                        j -> ord(substr(text, j, 1)))) AS BIGINT) AS orig_sum
        FROM b, UNNEST(generate_series(0, nf - 1)) AS s(i)
    )
    SELECT media_id, frame_idx, 32 AS height, 8 AS width, orig_sum,
           CAST(orig_sum AS DOUBLE) / (256 * 255) AS mean_px,
           TRUE AS frame_ok
    FROM f"""

# B-picture MPEG-1 (r13): identical frame geometry and byte stats to
# the pframes oracle — the codec signal is the hash-verified frame_ok
# column, which the engine sets only when decode == the closed-loop
# reconstruction bit-exactly IN DISPLAY ORDER (so a broken reorder, a
# wrong vector predictor, or a bad interpolation rounding all flip it).
ORACLE_SQL["docs_media_mpeg1_bframes"] = """
    WITH b AS (
        SELECT doc_id AS media_id,
               CAST((length(text) - 256) // 64 + 1 AS BIGINT) AS nf, text
        FROM documents WHERE length(text) = strlen(text) AND length(text) >= 256
    ), f AS (
        SELECT media_id, CAST(s.i AS BIGINT) AS frame_idx,
               CAST(list_sum(list_transform(
                        generate_series(s.i * 64 + 1, s.i * 64 + 256),
                        j -> ord(substr(text, j, 1)))) AS BIGINT) AS orig_sum
        FROM b, UNNEST(generate_series(0, nf - 1)) AS s(i)
    )
    SELECT media_id, frame_idx, 32 AS height, 8 AS width, orig_sum,
           CAST(orig_sum AS DOUBLE) / (256 * 255) AS mean_px,
           TRUE AS frame_ok
    FROM f"""

# Half-pel MPEG-1 (r13): frames step by HALF a row — even frames are
# plain 32x8 row windows at offset t/2 rows, odd frames the
# §2.4.4.2-rounded average of adjacent rows ((a+b+1)//2, exact integer
# floor on both engines). R = length//8 usable rows; nf = 2R-63 (max
# even t = 2(R-32); odd t needs one extra row). frame_ok is the
# hash-verified codec signal: decode == closed-loop recon bit-exactly
# through the half-pel interpolation path. Frame count capped at 8
# per doc (the half-row stride yields ~2 frames/payload-row; 8 still
# carries 4 odd half-pel steps per stream, and the per-frame encode
# cost is what bounds the bench).
ORACLE_SQL["docs_media_mpeg1_halfpel"] = """
    WITH b AS (
        SELECT doc_id AS media_id,
               CAST(length(text) // 8 AS BIGINT) AS r, text
        FROM documents WHERE length(text) = strlen(text) AND length(text) >= 272
    ), f AS (
        SELECT media_id, CAST(s.t AS BIGINT) AS frame_idx,
               CAST(CASE WHEN s.t % 2 = 0 THEN
                   list_sum(list_transform(
                       generate_series((s.t // 2) * 8 + 1, (s.t // 2) * 8 + 256),
                       j -> ord(substr(text, j, 1))))
               ELSE
                   list_sum(list_transform(
                       generate_series(1, 256),
                       j -> (ord(substr(text, (s.t // 2) * 8 + j, 1))
                             + ord(substr(text, (s.t // 2) * 8 + 8 + j, 1))
                             + 1) // 2))
               END AS BIGINT) AS orig_sum
        FROM b, UNNEST(generate_series(0, least(2 * r - 64, 7))) AS s(t)
    )
    SELECT media_id, frame_idx, 32 AS height, 8 AS width, orig_sum,
           CAST(orig_sum AS DOUBLE) / (256 * 255) AS mean_px,
           TRUE AS frame_ok
    FROM f"""

# Color MPEG-1: one row per 192-byte (8x8 RGB) frame — sized so real
# corpus docs qualify (the former 768 B gate matched zero docs at
# every shipped sf); exact original byte stats + the hash-verified
# y_ok/chroma_ok codec flags.
ORACLE_SQL["docs_media_mpeg1_color"] = """
    WITH b AS (
        SELECT doc_id AS media_id,
               CAST(length(text) // 192 AS BIGINT) AS nf, text
        FROM documents WHERE length(text) = strlen(text) AND length(text) >= 192
    ), f AS (
        SELECT media_id, CAST(s.i AS BIGINT) AS frame_idx,
               CAST(list_sum(list_transform(
                        generate_series(s.i * 192 + 1, s.i * 192 + 192),
                        j -> ord(substr(text, j, 1)))) AS BIGINT) AS orig_sum
        FROM b, UNNEST(generate_series(0, nf - 1)) AS s(i)
    )
    SELECT media_id, frame_idx, 8 AS height, 8 AS width, orig_sum,
           CAST(orig_sum AS DOUBLE) / (192 * 255) AS mean_px,
           TRUE AS y_ok, TRUE AS chroma_ok
    FROM f"""

# Color 4:2:0 roundtrip: exact byte stats over the (n//48)*48 bytes the
# kernel consumes; the y_ok/chroma_ok tolerance flags are the
# hash-verified codec signal (TRUE for a correct codec on this corpus).
ORACLE_SQL["docs_media_jpeg_color"] = """
    WITH b AS (
        SELECT doc_id AS media_id,
               CAST(length(text) // 48 AS BIGINT) AS h,
               CAST((length(text) // 48) * 48 AS BIGINT) AS n_bytes,
               text
        FROM documents WHERE length(text) = strlen(text) AND length(text) >= 48
    ), s AS (
        SELECT media_id, h, n_bytes,
               CAST(list_sum(list_transform(generate_series(1, n_bytes),
                    i -> ord(substr(text, i, 1)))) AS BIGINT) AS orig_sum
        FROM b
    )
    SELECT media_id, CAST(h AS INT) AS height, 16 AS width, n_bytes,
           orig_sum, CAST(orig_sum AS DOUBLE) / n_bytes AS mean_byte,
           TRUE AS y_ok, TRUE AS chroma_ok
    FROM s"""

# Substring dedup: duplicated 8-token windows (count >= 2 corpus-wide,
# intra-doc repeats included) merged to maximal spans per document via
# gaps-and-islands — mirrors text.repeated_kgram_spans exactly.
ORACLE_SQL["docs_substring_dedup"] = """
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), win AS MATERIALIZED (
        SELECT doc_id, CAST(s.i AS BIGINT) AS pos,
               md5(array_to_string(list_slice(t, s.i + 1, s.i + 8), ' ')) AS h
        FROM toks, UNNEST(generate_series(0, len(t) - 8)) AS s(i)
        WHERE len(t) >= 8
    ), dup AS (
        SELECT h FROM win GROUP BY h HAVING count(*) >= 2
    ), d AS (
        SELECT w.doc_id, w.pos FROM win w JOIN dup USING (h)
    ), isl AS (
        SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM d
    )
    SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) - MIN(pos) + 8 AS BIGINT) AS span_len,
           CAST(COUNT(*) AS BIGINT) AS n_windows
    FROM isl GROUP BY doc_id, grp"""

# The streamed twin emits the same duplicated-window marks, merged by
# the same span aggregate — identical oracle.
ORACLE_SQL["docs_substring_dedup_streamed"] = ORACLE_SQL["docs_substring_dedup"]

# Applied substring dedup: the detection CTEs above, then token-indexed
# surgery — every token whose 0-based position falls inside any span of
# its doc is dropped, survivors re-joined with single spaces. DuckDB
# lambda indexes are 1-BASED, hence the i - 1. Mirrors text.cut_spans.
# The template parameterizes the dup CTE so the keep-first variant
# (exempt the corpus-minimum struct(id, pos) occurrence of each window
# — mirrors repeated_kgram_spans(keep_first=True)) shares the rest of
# the replay verbatim. The window CTE is MATERIALIZED: it is consumed
# by both the dup aggregate and the flag-back join, and DuckDB's
# re-inlining of the window expansion per consumer turned the r11
# struct-MIN variant from seconds into minutes (and the composed
# funnel-v2 oracle into an OOM) at sf0.1 — one forced materialization
# restores single-scan cost, mirroring the engine's localCheckpoint.
_SSD_APPLIED_TEMPLATE = """
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), win AS MATERIALIZED (
        SELECT doc_id, CAST(s.i AS BIGINT) AS pos,
               md5(array_to_string(list_slice(t, s.i + 1, s.i + 8), ' ')) AS h
        FROM toks, UNNEST(generate_series(0, len(t) - 8)) AS s(i)
        WHERE len(t) >= 8
    ), {marks}, isl AS (
        SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM d
    ), spans AS (
        SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS a,
               CAST(MAX(pos) - MIN(pos) + 8 AS BIGINT) AS l
        FROM isl GROUP BY doc_id, grp
    ), sp AS (
        SELECT doc_id, list(struct_pack(a := a, l := l)) AS sps,
               CAST(COUNT(*) AS BIGINT) AS n_spans
        FROM spans GROUP BY doc_id
    ), cut AS (
        SELECT t.doc_id, t.t, p.n_spans,
               CASE WHEN p.sps IS NULL THEN t.t
                    ELSE list_filter(t.t, (x, i) ->
                         len(list_filter(p.sps, q ->
                             i - 1 >= q.a AND i - 1 < q.a + q.l)) = 0)
               END AS kept
        FROM toks t LEFT JOIN sp p USING (doc_id)
    )
    SELECT doc_id, COALESCE(n_spans, 0) AS n_spans,
           CAST(len(t) - len(kept) AS BIGINT) AS n_tokens_cut,
           COALESCE(array_to_string(kept, ' '), '') AS clean_text
    FROM cut"""

ORACLE_SQL["docs_substring_dedup_applied"] = _SSD_APPLIED_TEMPLATE.format(
    marks="""dup AS (
        SELECT h FROM win GROUP BY h HAVING count(*) >= 2
    ), d AS (
        SELECT w.doc_id, w.pos FROM win w JOIN dup USING (h)
    )"""
)

def _bm25_oracle() -> str:
    """DuckDB replay of bm25_topk: identical integer weight clearing
    (22·tf·T over 10·tf·T + 3·T + 9·dl·N), the same rational idf
    surrogate via //, the same fixed left-associated double sum, same
    (score DESC, doc_id) tiebreaks."""
    from jagular_spark.workload_params import _BM25_K, _BM25_QUANTA, _BM25_TERMS

    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN list_contains(t, '{t}') THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df{j}"
        for j, t in enumerate(_BM25_TERMS)
    )
    tf_cols = ", ".join(
        f"CAST(len(list_filter(t, x -> x = '{t}')) AS BIGINT) AS tf{j}"
        for j, t in enumerate(_BM25_TERMS)
    )
    parts = " + ".join(
        f"(CAST(((2 * n - 2 * df{j} + 1) * CAST({_BM25_QUANTA} AS BIGINT))"
        f" // (2 * df{j} + 1) AS DOUBLE)"
        f" * CAST(tf{j} * 22 * tt AS DOUBLE)"
        f" / CAST(10 * tf{j} * tt + 3 * tt + 9 * dl * n AS DOUBLE))"
        for j in range(len(_BM25_TERMS))
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(len(t)) AS BIGINT) AS tt,
               {df_cols}
        FROM toks
    ), rows_ AS (
        SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, {tf_cols} FROM toks
    ), scored AS (
        SELECT doc_id, dl, {parts} AS score FROM rows_ CROSS JOIN stats
    ), top AS (
        SELECT doc_id, dl, score FROM scored WHERE score > 0
        ORDER BY score DESC, doc_id LIMIT {_BM25_K}
    )
    SELECT doc_id, dl, score,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
    FROM top"""


ORACLE_SQL["docs_bm25_search"] = _bm25_oracle()


def _gopher_oracle() -> str:
    """DuckDB replay of text.gopher_rules — same token/line splits,
    same integer cross-multiplied thresholds."""
    stops_sum = " + ".join(
        f"CAST(list_contains(t, '{w}') AS BIGINT)" for w in txt.GOPHER_STOPS
    )
    return f"""
    WITH base AS (
        SELECT doc_id, text,
               string_split_regex(trim(text), '\\s+') AS t,
               string_split(text, chr(10)) AS l
        FROM documents
    ), m AS (
        SELECT doc_id,
               CAST(len(t) AS BIGINT) AS n_words,
               CAST(list_sum(list_transform(t, x -> strlen(x))) AS BIGINT)
                   AS word_chars,
               CAST(len(l) AS BIGINT) AS n_lines,
               CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
                   AS n_hash,
               CAST(len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT)
                   + CAST(len(regexp_extract_all(text, '…')) AS BIGINT)
                   AS n_ellipsis,
               CAST(len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]')))
                    AS BIGINT) AS n_alpha_words,
               CAST(len(list_filter(l, x -> starts_with(ltrim(x), '-') OR
                    starts_with(ltrim(x), '*') OR starts_with(ltrim(x), '•')))
                    AS BIGINT) AS n_bullet_lines,
               CAST(len(list_filter(l, x -> ends_with(rtrim(x), '...') OR
                    ends_with(rtrim(x), '…'))) AS BIGINT) AS n_ellipsis_lines,
               CAST({stops_sum} AS BIGINT) AS n_stops_present
        FROM base
    )
    SELECT *,
           (r1_word_count AND r2_mean_word_len AND r3_symbol_ratio AND
            r4_bullet_lines AND r5_ellipsis_lines AND r6_alpha_words AND
            r7_stop_words) AS keep
    FROM (
        SELECT doc_id, n_words, word_chars, n_lines, n_hash, n_ellipsis,
               n_alpha_words, n_bullet_lines, n_ellipsis_lines,
               n_stops_present,
               (n_words >= 50 AND n_words <= 100000) AS r1_word_count,
               (3 * n_words <= word_chars AND word_chars <= 10 * n_words)
                   AS r2_mean_word_len,
               -- paper: remove if ratio > 0.1 for EITHER symbol — two
               -- separate checks, not a summed count
               (10 * n_hash <= n_words AND 10 * n_ellipsis <= n_words)
                   AS r3_symbol_ratio,
               (10 * n_bullet_lines <= 9 * n_lines) AS r4_bullet_lines,
               (10 * n_ellipsis_lines <= 3 * n_lines) AS r5_ellipsis_lines,
               (10 * n_alpha_words >= 8 * n_words) AS r6_alpha_words,
               (n_stops_present >= 2) AS r7_stop_words
        FROM m
    )"""


ORACLE_SQL["docs_gopher_rules"] = _gopher_oracle()


ORACLE_SQL["docs_substring_dedup_keepfirst"] = _SSD_APPLIED_TEMPLATE.format(
    # MIN over a struct orders lexicographically by field in DuckDB
    # exactly as Spark's MIN(struct(id, pos)) does — total-order
    # correct for ANY id domain, matching the engine's r10 fix (the
    # previous packed doc_id*2^32+pos key was only equivalent on
    # small non-negative ids)
    marks="""dup AS (
        SELECT h, MIN(struct_pack(id := doc_id, pos := pos)) AS firstkey
        FROM win GROUP BY h HAVING count(*) >= 2
    ), d AS (
        SELECT w.doc_id, w.pos FROM win w JOIN dup USING (h)
        WHERE struct_pack(id := w.doc_id, pos := w.pos) <> dup.firstkey
    )"""
)

# Deterministic shuffle+shard: shard = salted md5 bucket mod 8,
# position = rank within shard by an independent salted hash (key
# tiebreak) — mirrors sampling.shuffle_shards exactly.
ORACLE_SQL["docs_shuffle_shards"] = """
    WITH h AS (
        SELECT doc_id,
               ('0x' || substr(md5('train-mix-v1' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 8 AS shard,
               ('0x' || substr(md5('train-mix-v1#pos' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   AS ord
        FROM documents
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord, doc_id) - 1
                AS BIGINT) AS pos_in_shard
    FROM h"""

ORACLE_SQL["docs_chunking"] = """
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), ck AS (
        SELECT doc_id, CAST(s.i AS BIGINT) AS chunk_idx,
               CAST(s.i * 24 AS BIGINT) AS start_tok,
               list_slice(t, s.i * 24 + 1, s.i * 24 + 32) AS w
        FROM toks, UNNEST(generate_series(0, (len(t) - 1) // 24)) AS s(i)
    )
    SELECT doc_id, chunk_idx, start_tok,
           CAST(len(w) AS BIGINT) AS n_tokens,
           md5(array_to_string(w, ' ')) AS chunk_hash
    FROM ck"""

ORACLE_SQL["docs_vocab_topdf"] = """
    WITH tok AS (
        SELECT lang AS grp, doc_id,
               unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS token
        FROM documents
    ), dfc AS (
        SELECT grp, token, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY grp, token
    ), r AS (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY grp
                ORDER BY df DESC, token ASC) AS BIGINT) AS rank
        FROM dfc
    )
    SELECT grp AS lang, token, df, rank FROM r WHERE rank <= 10"""

ORACLE_SQL["docs_domain_mixture"] = """
    WITH per AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang, source
    )
    SELECT lang, source, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / CAST(SUM(n_tokens) OVER () AS DOUBLE) AS token_share
    FROM per"""

def _spike_cluster_oracle(k: int = 4, n_iter: int = 2, dim: int = 8) -> str:
    """Replay detection → integer patch features → md5 fit-sample →
    integer Lloyd → assignment over ALL spikes (events_spike_clusters).
    The ``fitw`` CTE mirrors ``hash_sample(feats, "sid", fraction,
    salt)`` bit-for-bit: the Lloyd chain sees only the sample, the
    final assignment sees every spike."""
    fit_thr = int(_SPIKE_FIT_FRACTION * (1 << 32))
    its = []
    for i in range(n_iter):
        its.append(f"""
        , kd{i} AS (
            SELECT n.sid, c.c,
                   CAST(list_sum(list_transform(generate_series(1, {dim}),
                        t -> (n.iv[t] - c.civ[t]) * (n.iv[t] - c.civ[t]))) AS BIGINT) AS d
            FROM fitw n CROSS JOIN kc{i} c
        ), ka{i} AS (
            SELECT sid, c FROM (
                SELECT sid, c, ROW_NUMBER() OVER (PARTITION BY sid ORDER BY d, c) AS rn
                FROM kd{i}
            ) WHERE rn = 1
        ), ks{i} AS (
            SELECT a.c, t.t, SUM(n.iv[t.t]) AS sv, COUNT(*) AS cnt
            FROM ka{i} a JOIN fitw n USING (sid),
                 UNNEST(generate_series(1, {dim})) AS t(t)
            GROUP BY a.c, t.t
        ), kc{i + 1} AS (
            SELECT p.c, COALESCE(u.civ, p.civ) AS civ
            FROM kc{i} p LEFT JOIN (
                SELECT c, list(CAST(floor(CAST(sv AS DOUBLE) / cnt) AS BIGINT) ORDER BY t) AS civ
                FROM ks{i} GROUP BY c
            ) u ON p.c = u.c
        )""")
    return f"""{_detect_cte(2.0, 5, "user_id < 16")}
        , wvq AS (
            SELECT DISTINCT user_id, peak_seq,
                   list_transform(generate_series(0, {dim - 1}), j ->
                       CAST(CAST((CASE WHEN d.peak_seq - 4 + j BETWEEN 0 AND d.n - 1
                            THEN d.xs[d.peak_seq - 4 + j + 1] ELSE 0.0 END) AS DECIMAL(18,4))
                            * 100 AS BIGINT)) AS iv,
                   user_id * 4294967296 + peak_seq AS sid
            FROM located d
        ), fitw AS (
            SELECT * FROM wvq
            WHERE ('0x' || substr(md5('{_SPIKE_FIT_SALT}' || CAST(sid AS VARCHAR)), 1, 8))::BIGINT
                  < {fit_thr}
        ), kc0 AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY sid) - 1 AS INT) AS c, iv AS civ
            FROM (SELECT sid, iv FROM fitw ORDER BY sid LIMIT {k})
        ){''.join(its)}
        , fdist AS (
            SELECT n.user_id, n.peak_seq, c.c,
                   CAST(list_sum(list_transform(generate_series(1, {dim}),
                        t -> (n.iv[t] - c.civ[t]) * (n.iv[t] - c.civ[t]))) AS BIGINT) AS d
            FROM wvq n CROSS JOIN kc{n_iter} c
        )
        SELECT user_id, peak_seq, CAST(c AS BIGINT) AS cluster FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, peak_seq ORDER BY d, c) AS rn
            FROM fdist
        ) WHERE rn = 1"""


ORACLE_SQL["events_spike_clusters"] = _spike_cluster_oracle()

# W1 polarity='both' — the two-sided debounce on the constant-centered
# stream (MAD multiplier 1.0; the dense rn stream makes LEAD the ts+1
# sample, so the step gate is implied)
ORACLE_SQL["events_crossings_both"] = f"""
    WITH {_ORDERED_LISTS_CTE}, centered AS (
        SELECT user_id, rn, value - 245.0 AS value FROM ordered
    ), thr AS (
        SELECT user_id, CAST(0.75 * MEDIAN(ABS(value)) AS DOUBLE) / 0.6745 AS threshold
        FROM centered GROUP BY user_id
    ), led AS (
        SELECT user_id, rn, value,
               LEAD(value) OVER (PARTITION BY user_id ORDER BY rn) AS nv
        FROM centered
    )
    SELECT o.user_id, o.rn AS seq, CAST(o.value AS DOUBLE) AS value
    FROM led o JOIN thr t ON o.user_id = t.user_id
    WHERE ABS(o.value) > t.threshold AND ABS(o.nv) > t.threshold"""

# S9 round-trip: a correct sink/scan is invisible — the oracle is the
# detection oracle itself, scoped to the query's 16-channel subset (the
# sink surface needs correctness coverage, not full-corpus throughput).
ORACLE_SQL["events_spikes_roundtrip"] = f"""{_detect_cte(2.0, 5, "user_id < 16")}
        SELECT d.user_id, d.crossing_seq, d.peak_seq, CAST(t.j AS BIGINT) AS idx,
               CASE WHEN d.peak_seq - 4 + t.j BETWEEN 0 AND d.n - 1
                    THEN d.xs[d.peak_seq - 4 + t.j + 1] ELSE 0.0 END AS wv
        FROM located d, UNNEST(generate_series(0, 7)) AS t(j)"""

# Integer-exact tf·idf: idf_q = (N · 10^6) // df is floor division on
# both engines; score = tf · idf_q is BIGINT, ties (score DESC, token).
ORACLE_SQL["docs_tfidf_top"] = """
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ), tfc AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, token
    ), dfc AS (
        SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM tok GROUP BY token
    ), nn AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
    ), scored AS (
        SELECT t.doc_id, t.token, t.tf, d.df,
               CAST(t.tf * ((nn.n * 1000000) // d.df) AS BIGINT) AS score
        FROM tfc t JOIN dfc d USING (token) CROSS JOIN nn
    )
    SELECT doc_id, token, tf, df, score, CAST(rank AS BIGINT) AS rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY score DESC, token ASC) AS rank
        FROM scored
    ) WHERE rank <= 3"""

# Bigram-LM fluency: model = global bigram counts, score = mean corpus
# frequency of the doc's bigrams (BIGINT sums, one final division).
ORACLE_SQL["docs_bigram_fluency"] = """
    WITH bgs AS (
        SELECT doc_id, lang,
               unnest(list_transform(generate_series(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i + 1])) AS bg
        FROM (SELECT doc_id, lang,
                     string_split_regex(trim(text), '\\s+') AS t
              FROM documents)
    ), model AS (
        SELECT bg, CAST(COUNT(*) AS BIGINT) AS cnt FROM bgs GROUP BY bg
    ), agg AS (
        SELECT b.doc_id, b.lang,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(m.cnt) AS BIGINT) AS freq_sum
        FROM bgs b JOIN model m USING (bg)
        GROUP BY b.doc_id, b.lang
    )
    SELECT doc_id, lang, n_bigrams, freq_sum,
           CAST(freq_sum AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS fluency
    FROM agg"""

# DSIR targeted-selection scores (r13): hashed unigram+bigram count
# models over target (doc_id%50==0) and raw corpora, per-bucket integer
# cross-multiplied probability difference
# delta[b] = (tc+1)*Mr - (rc+1)*Mt, per-doc BIGINT sum over gram
# occurrences, two final IEEE divisions — mirrors
# operators/selection.py exactly (no transcendental anywhere).
# Empty tokens are filtered like the engine's _grams_expr (r13 advice:
# split('') yields ['']); a blank raw doc has ZERO grams, so the scored
# set is built by LEFT JOIN from the raw pool — it keeps the row with
# n_grams=0, score_num=0, score=0.0 exactly as the engine's row-local
# projection does.
def _dsir_ctes(x: str = "") -> str:
    """The DSIR fit + scoring CTE chain (docs_dsir_scores semantics:
    every-50th-doc target, 4096 md5 gram buckets, exact-BIGINT
    cross-multiplied probability-difference surrogate), with every CTE
    name suffixed ``x`` so the chain composes with other oracle bodies
    (docs_dsir_select_funnel prepends it to the funnel oracle, whose
    own first CTE is also named ``scored``). Ends with ``scored{x}``
    holding (doc_id, n_grams, score_num) for every raw-pool doc and
    ``tot{x}`` holding the smoothed totals."""
    return f"""tok{x} AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    ), grams{x} AS (
        SELECT doc_id,
               list_concat(t, CASE WHEN len(t) >= 2 THEN
                   list_transform(generate_series(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i + 1])
                   ELSE [] END) AS gs
        FROM tok{x}
    ), g{x} AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(u.g), 1, 8))::BIGINT % 4096 AS INT) AS b
        FROM grams{x}, UNNEST(gs) AS u(g)
    ), tcnt{x} AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM g{x}
        WHERE doc_id % 50 = 0 GROUP BY b
    ), rcnt{x} AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM g{x}
        WHERE doc_id % 50 <> 0 GROUP BY b
    ), tot{x} AS (
        SELECT CAST((SELECT COALESCE(SUM(c), 0) FROM tcnt{x}) + 4096 AS BIGINT) AS mt,
               CAST((SELECT COALESCE(SUM(c), 0) FROM rcnt{x}) + 4096 AS BIGINT) AS mr
    ), delta{x} AS (
        SELECT CAST(s.i AS INT) AS b,
               (COALESCE(tc.c, 0) + 1) * tot{x}.mr
                 - (COALESCE(rc.c, 0) + 1) * tot{x}.mt AS d
        FROM UNNEST(generate_series(0, 4095)) AS s(i)
        CROSS JOIN tot{x}
        LEFT JOIN tcnt{x} tc ON tc.b = s.i
        LEFT JOIN rcnt{x} rc ON rc.b = s.i
    ), gagg{x} AS (
        SELECT g{x}.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(delta{x}.d) AS BIGINT) AS score_num
        FROM g{x} JOIN delta{x} ON g{x}.b = delta{x}.b
        WHERE g{x}.doc_id % 50 <> 0
        GROUP BY g{x}.doc_id
    ), scored{x} AS (
        SELECT d.doc_id,
               COALESCE(a.n_grams, CAST(0 AS BIGINT)) AS n_grams,
               COALESCE(a.score_num, CAST(0 AS BIGINT)) AS score_num
        FROM documents d LEFT JOIN gagg{x} a ON d.doc_id = a.doc_id
        WHERE d.doc_id % 50 <> 0
    )"""


_DSIR_PREFIX = f"""
    WITH {_dsir_ctes()}
    SELECT doc_id, n_grams, score_num,
           CAST(score_num AS DOUBLE) / (SELECT CAST(mt AS DOUBLE) FROM tot)
               / (SELECT CAST(mr AS DOUBLE) FROM tot) AS score
    FROM scored"""

ORACLE_SQL["docs_dsir_scores"] = _DSIR_PREFIX

# the streaming twin is bit-identical to the batch scorer (frozen fit,
# stateless row-local serving) — same oracle verbatim
ORACLE_SQL["docs_dsir_scores_streamed"] = _DSIR_PREFIX

ORACLE_SQL["docs_dsir_topk"] = (
    _DSIR_PREFIX + "\n    ORDER BY score_num DESC, doc_id ASC LIMIT 100"
)

# Cross-source near-dup attribution: the docs_ngram_jaccard_lsh pair
# SQL (verbatim, as a derived table) labeled with both sides' sources
# and rolled up to the unordered source-pair matrix.
ORACLE_SQL["docs_neardup_source_matrix"] = (
    """
    SELECT LEAST(da.source, db.source) AS src_lo,
           GREATEST(da.source, db.source) AS src_hi,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(CASE WHEN da.source <> db.source THEN 1 END) AS BIGINT)
               AS n_cross
    FROM ("""
    + ORACLE_SQL["docs_ngram_jaccard_lsh"]
    + """) p
    JOIN documents da ON p.id_a = da.doc_id
    JOIN documents db ON p.id_b = db.doc_id
    GROUP BY 1, 2"""
)

# the token-budget streaming twin is bit-identical to the batch
# sampler (frozen thresholds, stateless row-local serving) — same
# oracle verbatim (assigned below, after the batch entry is defined)

# Token-budget mixture sampling: per-source exact token totals, then
# the threshold floor-division in HUGEINT — budget · 2^32 overflows
# int64 on large corpora, which is why the ENGINE computes the same
# division driver-side in arbitrary-precision Python ints; both land
# on the identical BIGINT threshold — then md5-threshold membership.
_BUDGET_ROWS = ", ".join(
    f"('{g}', {int(b)})" for g, b in sorted(_TOKEN_BUDGETS.items())
)
_BUDGET_SRCS = ", ".join(f"'{g}'" for g in sorted(_TOKEN_BUDGETS))
ORACLE_SQL["docs_token_budget_sample"] = f"""
    WITH nt AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
        FROM documents
    ), tg AS (
        SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS t FROM nt
        WHERE source IN ({_BUDGET_SRCS}) GROUP BY source
    ), thr AS (
        SELECT tg.source,
               LEAST(CAST(4294967296 AS HUGEINT),
                     (CAST(b.budget AS HUGEINT) * 4294967296) // tg.t) AS cut
        FROM tg JOIN (VALUES {_BUDGET_ROWS}) AS b(source, budget) USING (source)
    )
    SELECT n.doc_id, n.source, n.n_tokens
    FROM nt n JOIN thr ON n.source = thr.source
    WHERE CAST(n.h AS HUGEINT) < thr.cut"""
ORACLE_SQL["docs_token_budget_sample_streamed"] = ORACLE_SQL[
    "docs_token_budget_sample"
]

# BPE tokenizer fit + frozen encode, replayed END-TO-END: the fit
# sample is the fit_rows smallest-md5 docs (hash_sample_rows'
# ORDER BY bucket, id LIMIT n); each merge round is one unrolled CTE
# group (pair counts over the current symbolization -> the
# (cnt DESC, pair ASC) argmax -> boundary-safe literal replace applied
# to BOTH the fit sample (w-chain) and the corpus (e-chain)) — the
# integer-Lloyd-in-SQL precedent (_ivf_fit_prefix) on strings. The
# paren symbol representation '(h)(e)(l)(l)(o)(#)' makes replace
# merge application unambiguous on both engines (see operators/bpe.py).
# shared vocabulary convention of the BPE oracles: symbolized word and
# the (doc-optional) word extraction — one definition, both oracles
_BPE_SYM = (
    "'(' || array_to_string(list_transform(generate_series(1, length(w)),"
    " i -> w[i]), ')(') || ')(#)'"
)
_BPE_WORDS = (
    "SELECT {cols}lower(t) AS w FROM {src}, "
    "UNNEST(list_filter(string_split_regex(trim(text), '\\s+'), "
    "t -> regexp_matches(t, '^[A-Za-z]+$'))) AS u(t)"
)


def _bpe_rounds(n_merges: int, e_cols: str = "") -> str:
    """The unrolled per-merge CTE rounds both BPE oracles share: pair
    count over the FIT sample (p), argmax merge (m), fit-side replace
    (w) and corpus-side replace (e). ``e_cols`` prepends carried
    columns (e.g. ``"doc_id, "``) to the corpus chain — empty yields
    the docs_bpe_vocab text byte-identically."""
    rounds = []
    for r in range(n_merges):
        rounds.append(f"""
    , p{r} AS MATERIALIZED (
        SELECT pr, COUNT(*) AS cnt FROM (
            SELECT UNNEST(list_transform(generate_series(1, len(l) - 1),
                   i -> '(' || l[i] || ')(' || l[i + 1] || ')')) AS pr
            FROM (SELECT regexp_extract_all(sym, '\\(([^)]*)\\)', 1) AS l FROM w{r})
        ) GROUP BY pr
    ), m{r} AS MATERIALIZED (
        SELECT pr, replace(pr, ')(', '') AS mg
        FROM p{r} ORDER BY cnt DESC, pr ASC LIMIT 1
    ), w{r + 1} AS MATERIALIZED (
        SELECT replace(sym, (SELECT pr FROM m{r}), (SELECT mg FROM m{r})) AS sym
        FROM w{r}
    ), e{r + 1} AS MATERIALIZED (
        SELECT {e_cols}replace(sym, (SELECT pr FROM m{r}), (SELECT mg FROM m{r})) AS sym
        FROM e{r}
    )""")
    return "".join(rounds)


def _bpe_oracle(n_merges: int, fit_rows: int) -> str:
    sym = _BPE_SYM
    words = _BPE_WORDS.replace("{cols}", "")
    mt = " UNION ALL ".join(
        f"SELECT CAST({r + 1} AS BIGINT) AS rank, "
        f"(SELECT substr(mg, 2, length(mg) - 2) FROM m{r}) AS token"
        for r in range(n_merges)
    )
    return f"""
    WITH fitdocs AS (
        SELECT doc_id, text FROM documents
        ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                 doc_id
        LIMIT {fit_rows}
    ), w0 AS MATERIALIZED (
        SELECT {sym} AS sym FROM ({words.format(src='fitdocs')})
    ), e0 AS MATERIALIZED (
        SELECT {sym} AS sym FROM ({words.format(src='documents')})
    ){_bpe_rounds(n_merges)}
    , fin AS (
        SELECT UNNEST(regexp_extract_all(sym, '\\(([^)]*)\\)', 1)) AS token
        FROM e{n_merges}
    ), cnts AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n_final FROM fin GROUP BY token
    ), mt AS ({mt}), chk AS (
        -- loud spec guard mirroring bpe_fit's ValueError: if any fit
        -- round's pair table emptied before n_merges, its m{{r}} scalar
        -- subqueries go NULL and the replace() chain would silently
        -- null every row — error() here turns that into the same loud
        -- failure the engine raises (r15 advice)
        SELECT CASE WHEN (SELECT COUNT(*) FROM mt WHERE token IS NULL) > 0
                    THEN error('BPE oracle: fit sample exhausted before n_merges')
                    ELSE 1 END AS ok
    )
    SELECT mt.rank, mt.token, COALESCE(cnts.n_final, 0) AS n_final
    FROM mt LEFT JOIN cnts USING (token), chk"""


ORACLE_SQL["docs_bpe_vocab"] = _bpe_oracle(_BPE_MERGES, _BPE_FIT_ROWS)


def _bpe_corpus_encode_oracle(n_merges: int, fit_rows: int) -> str:
    """Replay of the corpus-encode serving path: same independently
    re-derived fit (the shared unrolled rounds), but the corpus chain
    carries doc_id per word OCCURRENCE and the final select rolls the
    encodings up to the per-document manifest — n_words occurrences,
    n_tokens total BPE symbols. The engine encodes each DISTINCT word
    once (rank encoder) and joins; the oracle encodes every occurrence
    through the literal replace chain — the hash match certifies the
    rank-vs-chain equivalence AND the map join drops/duplicates no
    occurrence."""
    sym = _BPE_SYM
    words = _BPE_WORDS.replace("{cols}", "doc_id, ")
    return f"""
    WITH fitdocs AS (
        SELECT doc_id, text FROM documents
        ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                 doc_id
        LIMIT {fit_rows}
    ), w0 AS MATERIALIZED (
        SELECT {sym} AS sym FROM ({_BPE_WORDS.replace("{cols}", "").format(src='fitdocs')})
    ), e0 AS MATERIALIZED (
        SELECT doc_id, {sym} AS sym FROM ({words.format(src='documents')})
    ){_bpe_rounds(n_merges, e_cols="doc_id, ")}
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(regexp_extract_all(sym, '\\(([^)]*)\\)', 1))) AS BIGINT)
               AS n_tokens
    FROM e{n_merges} GROUP BY doc_id"""


ORACLE_SQL["docs_bpe_corpus_encode"] = _bpe_corpus_encode_oracle(
    _BPE_MERGES, _BPE_FIT_ROWS
)

# Terminal "write the training shards" composition: token-budget
# mixture (HUGEINT threshold fit + md5 membership, as above) → the
# deterministic shard/rank layout (docs_shuffle_shards' salted-md5
# construction) → per-shard 2048-token sequence packing (window
# cumsum in shard order), rolled up to the 8-row shard manifest.
ORACLE_SQL["docs_training_shards"] = f"""
    WITH nt AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
        FROM documents
    ), tg AS (
        SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS t FROM nt
        WHERE source IN ({_BUDGET_SRCS}) GROUP BY source
    ), thr AS (
        SELECT tg.source,
               LEAST(CAST(4294967296 AS HUGEINT),
                     (CAST(b.budget AS HUGEINT) * 4294967296) // tg.t) AS cut
        FROM tg JOIN (VALUES {_BUDGET_ROWS}) AS b(source, budget) USING (source)
    ), samp AS (
        SELECT n.doc_id, n.n_tokens
        FROM nt n JOIN thr ON n.source = thr.source
        WHERE CAST(n.h AS HUGEINT) < thr.cut
    ), sh AS (
        SELECT doc_id, n_tokens,
               ('0x' || substr(md5('train-mix-v1' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 8 AS shard,
               ('0x' || substr(md5('train-mix-v1#pos' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   AS ord
        FROM samp
    ), pos AS (
        SELECT shard, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY shard ORDER BY ord, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens AS off
        FROM sh
    ), pd AS (
        SELECT shard, n_tokens AS nt, off // 2048 AS seq_id,
               ((off + n_tokens - 1) // 2048) > (off // 2048) AS straddles
        FROM pos
    )
    SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS n_tokens,
           CAST((SUM(nt) + 2047) // 2048 AS BIGINT) AS n_sequences,
           CAST(SUM(CASE WHEN straddles THEN 1 ELSE 0 END) AS BIGINT)
               AS n_straddle
    FROM pd GROUP BY shard"""

# the terminal composition's streaming twin packs each shard in the
# same deterministic (ord, id) order with the offset carried as state
# — bit-identical manifest under a one-pass drain, same oracle verbatim
ORACLE_SQL["docs_training_shards_streamed"] = ORACLE_SQL[
    "docs_training_shards"
]

# DSIR select-then-clean (the paper's actual pipeline): the suffixed
# DSIR CTE chain picks the top-200 raw docs, dsel joins their text
# back, and the whole curation funnel runs over that selection —
# one oracle replaying both halves in sequence.
ORACLE_SQL["docs_dsir_select_funnel"] = _funnel_oracle(
    prefix_ctes=_dsir_ctes("1")
    + """, dsel AS MATERIALIZED (
        SELECT d.doc_id, d.text
        FROM (SELECT doc_id FROM scored1
              ORDER BY score_num DESC, doc_id ASC LIMIT 200) s
        JOIN documents d USING (doc_id)
    ), """,
    corpus="dsel",
)

# k-NN label vote: exact integer dots, (dot DESC, neighbor) top-10,
# (votes DESC, label) argmax — all-integer output.
ORACLE_SQL["emb_knn_classify"] = f"""
    WITH base AS (
        SELECT vec_id, label, list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * {sim.EMB_SCALE}) AS BIGINT)) AS iv
        FROM embeddings
    ), scored AS (
        SELECT q.vec_id AS query_id, CAST(q.label AS BIGINT) AS true_label,
               c.vec_id AS neighbor_id, CAST(c.label AS BIGINT) AS nbr_label,
               CAST(list_sum(list_transform(generate_series(1, len(q.iv)),
                    i -> q.iv[i] * c.iv[i])) AS BIGINT) AS dot
        FROM base q JOIN base c ON q.vec_id < 50 AND c.vec_id != q.vec_id
    ), top AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY dot DESC, neighbor_id ASC) AS nrank
            FROM scored
        ) WHERE nrank <= 10
    ), votes AS (
        SELECT query_id, true_label, nbr_label, CAST(COUNT(*) AS BIGINT) AS votes
        FROM top GROUP BY query_id, true_label, nbr_label
    )
    SELECT query_id, true_label, nbr_label AS pred_label, votes FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY votes DESC, nbr_label ASC) AS vrank
        FROM votes
    ) WHERE vrank = 1"""

# Band power on the exact FIR chain: quanta floor is identical FLOOR()
# on both engines; Σq² needs CAST (DuckDB SUM promotes to HUGEINT).
ORACLE_SQL["events_band_power"] = f"""
    WITH {_ORDERED_LISTS_CTE}, filt AS (
        SELECT o.user_id, {_fir_chain_sql(_BP_TAPS)} AS filtered
        FROM ordered o JOIN lists l ON o.user_id = l.user_id
    ), qq AS (
        SELECT user_id, CAST(FLOOR(filtered * 1000.0) AS BIGINT) AS q FROM filt
    ), agg AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(q * q) AS BIGINT) AS power_q
        FROM qq GROUP BY user_id
    )
    SELECT user_id, n, power_q,
           CAST(power_q AS DOUBLE) / CAST(n AS DOUBLE) AS band_power
    FROM agg"""

# Q10/Q18 oracles share the split-sum revenue recombination (see
# _disc_price_sum: identical expression tree → hash-equal at any sf).
_REV_SPLIT_SQL = f"""(CAST(CAST(SUM(({_DISC_PRICE_QUANTA}) // 2147483648) AS BIGINT) AS DOUBLE)
                    * 2147483648.0
                + CAST(CAST(SUM(({_DISC_PRICE_QUANTA}) % 2147483648) AS BIGINT) AS DOUBLE))
                   / 100000000.0"""

ORACLE_SQL["q10_returned_items"] = f"""
    SELECT c_custkey, c_name, c_acctbal, n_name, {_REV_SPLIT_SQL} AS revenue
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20"""

ORACLE_SQL["q18_large_volume_customers"] = """
    WITH big AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS BIGINT)) > 250
    )
    SELECT c_name, c_custkey, o_orderkey,
           epoch_us(o_orderdate) AS o_orderdate_us, o_totalprice, total_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100"""


def _truncated_ann_sql(dims: int, k: int = 5) -> str:
    """Brute-force top-k in the FIRST ``dims`` components — the
    emb_ann_topk template with the integer vectors list-sliced before
    norm and dot (DuckDB ``iv[1:d]`` is 1-based inclusive slicing)."""
    return f"""
    WITH base AS (
        SELECT vec_id, list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * {sim.EMB_SCALE}) AS BIGINT)
        )[1:{dims}] AS iv
        FROM embeddings
    ), normed AS (
        SELECT vec_id, iv,
               CAST(list_sum(list_transform(generate_series(1, len(iv)),
                    i -> iv[i] * iv[i])) AS BIGINT) AS nrm
        FROM base
    ), scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(list_sum(list_transform(generate_series(1, len(q.iv)),
                    i -> q.iv[i] * c.iv[i])) AS BIGINT) AS dot,
               q.nrm AS nrm_a, c.nrm AS nrm_b
        FROM normed q JOIN normed c
          ON q.vec_id < 20 AND c.vec_id != q.vec_id
    ), ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY dot DESC, neighbor_id ASC) AS BIGINT) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id FROM ranked WHERE rank <= {k}"""


def _mrl_recall_oracle(dims_list=(16, 32), k: int = 5) -> str:
    """Per (dims, probe): full-dimension exact top-k vs the truncated
    top-k — counts + one division (the emb_ann_recall composition
    keyed by the integer dims instead of a method name)."""
    exact_sql = ORACLE_SQL["emb_ann_topk"]
    parts = []
    for d in dims_list:
        tsql = _truncated_ann_sql(d, k)
        parts.append(f"""
    SELECT CAST({d} AS BIGINT) AS dims, ne.query_id, ne.n_full,
           COALESCE(nt.n_trunc, CAST(0 AS BIGINT)) AS n_trunc,
           COALESCE(nov.n_overlap, CAST(0 AS BIGINT)) AS n_overlap
    FROM (
        SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_full
        FROM ({exact_sql}) e GROUP BY query_id
    ) ne
    LEFT JOIN (
        SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_trunc
        FROM ({tsql}) a GROUP BY query_id
    ) nt ON ne.query_id = nt.query_id
    LEFT JOIN (
        SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
        FROM ({exact_sql}) e JOIN ({tsql}) a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY e.query_id
    ) nov ON ne.query_id = nov.query_id""")
    body = "\n    UNION ALL\n".join(parts)
    return f"""
    SELECT dims, query_id, n_full, n_trunc, n_overlap,
           CASE WHEN n_full > 0
                THEN CAST(n_overlap AS DOUBLE) / CAST(n_full AS DOUBLE)
           END AS recall
    FROM ({body})"""


ORACLE_SQL["emb_mrl_recall"] = _mrl_recall_oracle()


def _ann_recall_oracle() -> str:
    """Compose the recall audit from the ALREADY-VERIFIED per-method
    oracles (brute / LSH / frozen-IVF result sets as subquery CTEs) —
    the metric layer adds only integer counts + one division."""
    exact_sql = ORACLE_SQL["emb_ann_topk"]
    method_sqls = {
        "lsh": ORACLE_SQL["emb_ann_topk_lsh"],
        "ivf": ORACLE_SQL["emb_ann_topk_ivf_frozen"],
    }
    parts = []
    for m, msql in method_sqls.items():
        parts.append(f"""
    SELECT '{m}' AS method, ne.query_id, ne.n_exact,
           COALESCE(na.n_approx, CAST(0 AS BIGINT)) AS n_approx,
           COALESCE(nov.n_overlap, CAST(0 AS BIGINT)) AS n_overlap
    FROM (
        SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact
        FROM ({exact_sql}) e GROUP BY query_id
    ) ne
    LEFT JOIN (
        SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_approx
        FROM ({msql}) a GROUP BY query_id
    ) na ON ne.query_id = na.query_id
    LEFT JOIN (
        SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
        FROM ({exact_sql}) e JOIN ({msql}) a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY e.query_id
    ) nov ON ne.query_id = nov.query_id""")
    body = "\n    UNION ALL\n".join(parts)
    return f"""
    SELECT method, query_id, n_exact, n_approx, n_overlap,
           CAST(n_overlap AS DOUBLE) / CAST(n_exact AS DOUBLE) AS recall
    FROM ({body})"""


ORACLE_SQL["emb_ann_recall"] = _ann_recall_oracle()

# Winsorize: discrete rank-selected p01/p99 + pure-comparison clip —
# no float arithmetic anywhere, so parity is structural.
ORACLE_SQL["events_winsorize"] = """
    WITH ranked AS (
        SELECT user_id, event_id, epoch_us(ts) AS us, value,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY value, epoch_us(ts), event_id) AS BIGINT) - 1 AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS cnt
        FROM events
    ), q AS (
        SELECT user_id, event_id, us, value,
               MAX(CASE WHEN rn = CAST(floor((cnt - 1) * 0.01) AS BIGINT)
                   THEN value END) OVER (PARTITION BY user_id) AS lo,
               MAX(CASE WHEN rn = CAST(floor((cnt - 1) * 0.99) AS BIGINT)
                   THEN value END) OVER (PARTITION BY user_id) AS hi
        FROM ranked
    )
    SELECT user_id, event_id, us, value, lo, hi,
           LEAST(GREATEST(value, lo), hi) AS value_clipped,
           (value < lo OR value > hi) AS was_clipped
    FROM q"""

# The chunked (histogram-selection) variant computes the identical
# rank-selected band — one oracle serves both physical strategies.
ORACLE_SQL["events_winsorize_chunked"] = ORACLE_SQL["events_winsorize"]

# Streaming sessionize (availableNow, append mode): the emitted set is
# the batch gaps-and-islands sessions CLOSED by the final watermark —
# last event at least one 30-min gap before the global max event time.
ORACLE_SQL["events_sessionize_streamed"] = """
    WITH flagged AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), sess AS (
        SELECT user_id, us,
               CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged
    ), agg AS (
        SELECT user_id,
               MIN(us) AS session_start_us, MAX(us) AS session_end_us,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sess GROUP BY user_id, session_id
    )
    SELECT user_id, session_start_us, session_end_us, n_events
    FROM agg
    WHERE session_end_us + 1800000000 <= (SELECT MAX(epoch_us(ts)) FROM events)
"""

# Streaming censor (GroupState dead-time): append emission is complete,
# so the oracle is the exact greedy censor over distinct exceedances.
ORACLE_SQL["events_censor_streamed"] = """
    WITH RECURSIVE x AS (
        SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id, epoch_us(ts) AS us
        FROM events WHERE value > 150.0
    ), kept AS (
        SELECT user_id, us FROM x WHERE NOT EXISTS (
            SELECT 1 FROM x x2 WHERE x2.user_id = x.user_id AND x2.us < x.us)
        UNION ALL
        SELECT x.user_id, x.us
        FROM x JOIN kept k ON x.user_id = k.user_id AND x.us > k.us + 86400000000
        WHERE NOT EXISTS (
            SELECT 1 FROM x x2
            WHERE x2.user_id = x.user_id AND x2.us > k.us + 86400000000 AND x2.us < x.us)
    )
    SELECT user_id, us FROM kept
"""

ORACLE_SQL["events_xcorr"] = f"""
    WITH s AS (
        SELECT user_id AS ch,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) - 1 AS BIGINT) AS t,
               CAST(floor(value * 1000) AS BIGINT) AS iv
        FROM events WHERE user_id < 4
    ), lags(lag_k) AS (
        SELECT CAST(x AS BIGINT) FROM UNNEST([-2, -1, 0, 1, 2]) AS u(x)
    ), pr AS (
        SELECT a.ch AS ch_a, b.ch AS ch_b, l.lag_k,
               a.iv AS ia, b.iv AS ib
        FROM s a CROSS JOIN lags l
        JOIN s b ON b.t = a.t + l.lag_k AND a.ch < b.ch
    ), m AS (
        SELECT ch_a, ch_b, lag_k, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(ia) AS BIGINT) AS sa, CAST(SUM(ib) AS BIGINT) AS sb,
               CAST(SUM(ia * ia) AS BIGINT) AS saa,
               CAST(SUM(ib * ib) AS BIGINT) AS sbb,
               CAST(SUM(ia * ib) AS BIGINT) AS sab
        FROM pr GROUP BY ch_a, ch_b, lag_k
    )
    SELECT ch_a, ch_b, lag_k, n, sab, {_XCORR_CORR} AS corr FROM m"""

# Sequence packing: per-shard running token offset (window cumsum),
# seq assignment by integer floor-division of the start offset.
ORACLE_SQL["docs_pack_sequences"] = """
    WITH base AS (
        SELECT source, doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS nt
        FROM documents
    ), offs AS (
        SELECT source, nt,
               CAST(SUM(nt) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nt
                    AS BIGINT) AS off
        FROM base
    ), per_doc AS (
        SELECT source, nt,
               off // 2048 AS seq_id,
               ((off + nt - 1) // 2048) > (off // 2048) AS straddles
        FROM offs
    )
    SELECT source, seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN straddles THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle
    FROM per_doc GROUP BY source, seq_id"""

_PROMO_QUANTA = (
    f"CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE_QUANTA} ELSE CAST(0 AS BIGINT) END"
)
ORACLE_SQL["q14_promo_effect"] = f"""
    SELECT 100.0 *
           ((CAST(CAST(SUM(({_PROMO_QUANTA}) // 2147483648) AS BIGINT) AS DOUBLE)
                * 2147483648.0
             + CAST(CAST(SUM(({_PROMO_QUANTA}) % 2147483648) AS BIGINT) AS DOUBLE))
            / 100000000.0)
           /
           ((CAST(CAST(SUM(({_DISC_PRICE_QUANTA}) // 2147483648) AS BIGINT) AS DOUBLE)
                * 2147483648.0
             + CAST(CAST(SUM(({_DISC_PRICE_QUANTA}) % 2147483648) AS BIGINT) AS DOUBLE))
            / 100000000.0) AS promo_revenue_pct,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'"""

# Mixture rebalancing: computed per-stratum fraction min(1, t·N/n_g) in
# the identical float tree, md5-threshold membership.
_REBALANCE_CASE = "CASE " + " ".join(
    f"WHEN d.lang = '{k}' THEN {v!r}" for k, v in sorted(_REBALANCE_TARGETS.items())
) + " ELSE 0.0 END"
ORACLE_SQL["docs_rebalance_sample"] = f"""
    WITH counts AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_g FROM documents GROUP BY lang
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM documents
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN counts c ON d.lang = c.lang CROSS JOIN tot
    WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT <
          CAST(floor(LEAST(({_REBALANCE_CASE}) * CAST(n_tot AS DOUBLE)
                           / CAST(n_g AS DOUBLE), 1.0) * 4294967296.0) AS BIGINT)"""



# ---------------------------------------------------------------------------
# r6 relational additions (q4/q12/q13/q17/q19/q22 shapes) + PII redaction
# ---------------------------------------------------------------------------

ORACLE_SQL["q4_order_priority"] = """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

ORACLE_SQL["q12_shipping_classes"] = """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus"""

ORACLE_SQL["q13_customer_distribution"] = """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC"""

ORACLE_SQL["q17_small_quantity_revenue"] = """
    WITH pp AS (
        SELECT l_partkey AS pk,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS n_l
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT))
                AS BIGINT) AS DOUBLE) / 10000.0 / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#3'
    JOIN pp ON l.l_partkey = pp.pk
    WHERE CAST(l.l_quantity AS BIGINT) * 5 * pp.n_l < pp.sum_qty"""

ORACLE_SQL["q19_disjunctive_revenue"] = f"""
    SELECT {_REV_SPLIT_SQL} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)"""

ORACLE_SQL["q22_global_sales_opportunity"] = """
    WITH pos AS (
        SELECT CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 10000 AS BIGINT))
                    AS BIGINT) AS tot_q,
               CAST(COUNT(*) AS BIGINT) AS n_pos
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 10000 AS BIGINT))
                     AS BIGINT) AS DOUBLE) / 10000.0 AS totacctbal
    FROM customer c, pos
    WHERE CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 10000 AS BIGINT) * pos.n_pos > pos.tot_q
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment"""

# PII redaction: same seeded contact block, same patterns (imported from
# operators.text.PII_PATTERNS so engine and oracle can never drift), the
# replacements applied in the same fixed order with the 'g' flag.
from jagular_spark.operators.text import PII_PATTERNS as _PII

_pii_em, _pii_ip, _pii_ph = (p for _, p, _ in _PII)
ORACLE_SQL["docs_pii_redaction"] = f'''
    WITH seeded AS (
        SELECT doc_id,
               text || ' contact u' || CAST(doc_id AS VARCHAR)
                    || '@mail' || CAST(doc_id % 7 AS VARCHAR)
                    || '.example.com ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                    || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                    || ' tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   AS text
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_pii_em}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_pii_ip}')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(text, '{_pii_ph}')) AS BIGINT) AS n_phones,
           regexp_replace(regexp_replace(regexp_replace(text,
               '{_pii_em}', '<EMAIL>', 'g'),
               '{_pii_ip}', '<IP>', 'g'),
               '{_pii_ph}', '<PHONE>', 'g') AS redacted,
           regexp_replace(regexp_replace(regexp_replace(text,
               '{_pii_em}', '<EMAIL>', 'g'),
               '{_pii_ip}', '<IP>', 'g'),
               '{_pii_ph}', '<PHONE>', 'g') != text AS was_redacted
    FROM seeded'''

ORACLE_SQL["q1_rollup_summary"] = """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY l_returnflag, l_linestatus"""

ORACLE_SQL["events_hourly_rollup"] = """
    SELECT user_id,
           CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_mv
    FROM events
    GROUP BY user_id, CAST(epoch_us(ts) // 3600000000 AS BIGINT)"""

# Streamed interpolation emits the complete batch result — same oracle.
ORACLE_SQL["events_interpolate_streamed"] = ORACLE_SQL["events_interpolate"]

ORACLE_SQL["events_sortedness"] = """
    WITH o AS (
        SELECT user_id, epoch_us(ts) AS us,
               LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY
                   CAST(epoch_us(ts) // 3600000000 AS BIGINT) * 1000000 - event_id) AS p
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN p > us THEN 1 ELSE 0 END) AS BIGINT) AS n_inversions,
           SUM(CASE WHEN p > us THEN 1 ELSE 0 END) = 0 AS is_sorted
    FROM o GROUP BY user_id"""

ORACLE_SQL["q7_volume_shipping"] = f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           {_REV_SPLIT_SQL} AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS BIGINT)
    ORDER BY supp_nation, cust_nation, l_year"""

from jagular_spark.operators.filtering import ZSCORE_SQL as _ZSCORE  # noqa: E402

ORACLE_SQL["events_zscore"] = f"""
    WITH m AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               CAST(floor(value * 1000) AS BIGINT) AS iv,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) OVER w AS BIGINT) AS s,
               CAST(SUM(CAST(floor(value * 1000) AS BIGINT)
                        * CAST(floor(value * 1000) AS BIGINT)) OVER w AS BIGINT) AS ss
        FROM events
        WINDOW w AS (PARTITION BY user_id)
    )
    SELECT user_id, event_id, us, iv, {_ZSCORE} AS z FROM m"""

# Bucketed co-located join: layout changes the PLAN, never the result —
# the oracle is the plain join on the raw parquet.
ORACLE_SQL["orders_bucketed_revenue"] = f"""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {_REV_SPLIT_SQL} AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus"""

_NAT_Q = (
    "CASE WHEN n2.n_name = 'NATION_1' THEN " + _DISC_PRICE_QUANTA
    + " ELSE CAST(0 AS BIGINT) END"
)
ORACLE_SQL["q8_market_share"] = f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           ((CAST(CAST(SUM(({_NAT_Q}) // 2147483648) AS BIGINT) AS DOUBLE)
                 * 2147483648.0
             + CAST(CAST(SUM(({_NAT_Q}) % 2147483648) AS BIGINT) AS DOUBLE))
              / 100000000.0)
           / ((CAST(CAST(SUM(({_DISC_PRICE_QUANTA}) // 2147483648) AS BIGINT) AS DOUBLE)
                 * 2147483648.0
             + CAST(CAST(SUM(({_DISC_PRICE_QUANTA}) % 2147483648) AS BIGINT) AS DOUBLE))
              / 100000000.0) AS mkt_share,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey AND n1.n_regionkey = 0
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    GROUP BY CAST(year(o_orderdate) AS BIGINT)
    ORDER BY o_year"""

# Q2 shape: avg price is one double division of two exact BIGINTs —
# identical expression tree both engines, so the =min compare is exact
_FP4_PRICE = "CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)"
ORACLE_SQL["q2_min_price_supplier"] = f"""
    WITH ps AS (
        SELECT l_partkey, l_suppkey, p_name,
               CAST(CAST(SUM({_FP4_PRICE}) AS BIGINT) AS DOUBLE)
                   / CAST(CAST(COUNT(*) AS BIGINT) AS DOUBLE) AS avg_price
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey AND n_regionkey = 0
        WHERE p_size = 15
        GROUP BY l_partkey, l_suppkey, p_name
    ), mn AS (
        SELECT l_partkey AS mpk, MIN(avg_price) AS min_price FROM ps GROUP BY l_partkey
    )
    SELECT s_acctbal, s_name, n_name AS nation,
           l_partkey AS p_partkey, p_name,
           avg_price / 10000.0 AS supply_price
    FROM ps
    JOIN mn ON l_partkey = mpk AND avg_price = min_price
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey AND n_regionkey = 0
    ORDER BY s_acctbal DESC, s_name, p_partkey"""

ORACLE_SQL["q9_product_profit"] = f"""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           {_REV_SPLIT_SQL} AS sum_profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)
    ORDER BY nation, o_year DESC"""

ORACLE_SQL["q11_important_parts"] = f"""
    WITH per_part AS (
        SELECT l_partkey, CAST(SUM({_FP4_PRICE}) AS BIGINT) AS value_q
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_1'
        GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey,
           CAST(value_q AS DOUBLE) / 10000.0 AS part_value
    FROM per_part
    WHERE value_q * 10000 > (SELECT CAST(SUM(value_q) AS BIGINT) FROM per_part)
    ORDER BY part_value DESC, p_partkey"""

ORACLE_SQL["q16_supplier_counts"] = """
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 15, 23)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, CAST(p_size AS BIGINT)
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

ORACLE_SQL["q20_dominant_suppliers"] = """
    WITH scoped AS (
        SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS q
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_name LIKE '%blue%'
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
    ), ps AS (
        SELECT l_partkey, l_suppkey, CAST(SUM(q) AS BIGINT) AS qty_ps
        FROM scoped GROUP BY l_partkey, l_suppkey
    ), pt AS (
        SELECT l_partkey AS tpk, CAST(SUM(q) AS BIGINT) AS qty_p
        FROM scoped GROUP BY l_partkey
    )
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_2'
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM ps JOIN pt ON l_partkey = tpk
        WHERE qty_ps * 4 > qty_p
    )
    ORDER BY s_name"""

ORACLE_SQL["q21_waiting_suppliers"] = """
    WITH l1 AS (
        SELECT DISTINCT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R' AND o_orderstatus = 'F'
    ), waiting AS (
        SELECT l1.l_orderkey, l1.l_suppkey FROM l1
        WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
        )
        AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R'
        )
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM waiting
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name"""

ORACLE_SQL["q15_top_supplier"] = f"""
    WITH rev AS (
        SELECT l_suppkey AS sk,
               CAST(SUM({_DISC_PRICE_QUANTA}) AS BIGINT) AS total_q
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_q AS DOUBLE) / 100000000.0 AS total_revenue
    FROM rev JOIN supplier ON sk = s_suppkey
    WHERE total_q = (SELECT MAX(total_q) FROM rev)
    ORDER BY s_suppkey"""

# Deterministic HLL: md5 registers, bin()-length ranks, exact-binary-
# fraction harmonic denominator — the float estimate itself matches.
ORACLE_SQL["docs_hll_vocab"] = """
    WITH toks AS (
        SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents
    ), h AS (
        SELECT lang, tok,
               ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hv
        FROM toks
    ), r AS (
        SELECT lang, hv % 64 AS register,
               CAST(CASE WHEN hv // 64 = 0 THEN 27
                    ELSE 26 - length(bin(hv // 64)) + 1 END AS BIGINT) AS rank
        FROM h
    ), regs AS (
        SELECT lang, register, MAX(rank) AS max_rank
        FROM r GROUP BY lang, register
    ), agg AS (
        SELECT lang,
               SUM(power(0.5, max_rank)) AS s,
               CAST(COUNT(*) AS BIGINT) AS n_registers
        FROM regs GROUP BY lang
    ), ex AS (
        SELECT lang, CAST(COUNT(DISTINCT tok) AS BIGINT) AS exact_distinct
        FROM toks GROUP BY lang
    )
    SELECT agg.lang, n_registers,
           0.709 * 64 * 64 / (s + CAST(64 - n_registers AS DOUBLE)) AS est_distinct,
           exact_distinct
    FROM agg JOIN ex ON agg.lang = ex.lang"""

# Count-Min Sketch: all-integer cells and estimates — exact replay.
ORACLE_SQL["docs_cms_heavyhitters"] = """
    WITH toks AS (
        SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents
    ), cells AS (
        SELECT lang, tok, j.row,
               ('0x' || substr(md5('cms' || j.row || ':' || tok), 1, 8))::BIGINT % 256 AS cell
        FROM toks, (SELECT unnest([0, 1, 2, 3]) AS row) j
    ), sketch AS (
        SELECT lang, row, cell, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM cells GROUP BY lang, row, cell
    ), top AS (
        SELECT lang, tok, exact_n, rk FROM (
            SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS exact_n,
                   CAST(ROW_NUMBER() OVER (PARTITION BY lang
                        ORDER BY COUNT(*) DESC, tok ASC) AS BIGINT) AS rk
            FROM toks GROUP BY lang, tok
        ) WHERE rk <= 5
    ), probe_cells AS (
        SELECT t.lang, t.tok, t.exact_n, t.rk, j.row,
               ('0x' || substr(md5('cms' || j.row || ':' || t.tok), 1, 8))::BIGINT % 256 AS cell
        FROM top t, (SELECT unnest([0, 1, 2, 3]) AS row) j
    )
    SELECT p.lang, p.tok, p.rk, p.exact_n,
           CAST(MIN(COALESCE(s.cnt, 0)) AS BIGINT) AS cms_count
    FROM probe_cells p
    LEFT JOIN sketch s ON p.lang = s.lang AND p.row = s.row AND p.cell = s.cell
    GROUP BY p.lang, p.tok, p.rk, p.exact_n"""

# Streamed LSH candidates aggregate to the batch operator's
# (id_a, id_b, n_bands) — same oracle.
ORACLE_SQL["docs_lsh_candidates_streamed"] = ORACLE_SQL["docs_minhash_lsh"]

ORACLE_SQL["events_rolling_stats"] = """
    SELECT user_id, event_id, epoch_us(ts) AS us,
           CAST(floor(value * 1000) AS BIGINT) AS iv,
           CAST(COUNT(*) OVER w AS BIGINT) AS win_n,
           CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) OVER w AS BIGINT) AS win_sum,
           CAST(MIN(CAST(floor(value * 1000) AS BIGINT)) OVER w AS BIGINT) AS win_min,
           CAST(MAX(CAST(floor(value * 1000) AS BIGINT)) OVER w AS BIGINT) AS win_max
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)"""

# Set-op composition of three gate queries, reusing their oracles as
# subqueries so engine and oracle compose the same verified pieces.
ORACLE_SQL["docs_survivor_setops"] = f"""
    SELECT doc_id FROM (
        SELECT doc_id FROM ({ORACLE_SQL["docs_quality"]}) WHERE quality_score >= 0.6
        INTERSECT
        SELECT doc_id FROM ({ORACLE_SQL["docs_repetition"]}) WHERE NOT is_repetitive
    )
    EXCEPT ALL
    SELECT doc_id FROM ({ORACLE_SQL["docs_decontaminate"]}) WHERE contaminated
    ORDER BY doc_id"""

# Salted two-phase aggregation and compaction are result-identical to
# the plain rollup — all three share one oracle.
ORACLE_SQL["events_salted_hourly"] = ORACLE_SQL["events_hourly_rollup"]
ORACLE_SQL["events_compacted_roundtrip"] = ORACLE_SQL["events_hourly_rollup"]

# Deterministic Bloom decontamination: the bitset, probes, and even the
# false positives replay exactly.
ORACLE_SQL["docs_bloom_decontaminate"] = f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sh AS (
        SELECT doc_id, CASE WHEN len(t) >= 8 THEN
            list_distinct(list_transform(generate_series(1, len(t) - 7),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' '
                  || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7]))
            ELSE [] END AS shingles FROM toks
    ), hashes AS (
        SELECT doc_id, ('0x' || substr(md5(s.s), 1, 8))::BIGINT % {sim.P} AS h
        FROM sh, UNNEST(shingles) AS s(s)
    ), hd AS (
        SELECT DISTINCT doc_id, h FROM hashes
    ), bits AS (
        SELECT DISTINCT
               ('0x' || substr(md5('bf' || j.j || ':' || CAST(h AS VARCHAR)), 1, 8))::BIGINT % 4096 AS bit
        FROM (SELECT DISTINCT h FROM hashes WHERE doc_id % 50 = 0),
             (SELECT UNNEST([0, 1, 2]) AS j) j
    ), probes AS (
        SELECT doc_id, h, j.j AS j,
               ('0x' || substr(md5('bf' || j.j || ':' || CAST(h AS VARCHAR)), 1, 8))::BIGINT % 4096 AS bit
        FROM hd, (SELECT UNNEST([0, 1, 2]) AS j) j
        WHERE doc_id % 50 != 0
    ), matched AS (
        SELECT p.doc_id, p.h, COUNT(DISTINCT p.j) AS kj
        FROM probes p JOIN bits b ON p.bit = b.bit
        GROUP BY p.doc_id, p.h
    ), per_doc AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_maybe
        FROM matched WHERE kj = 3 GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(m.n_maybe, 0) AS n_maybe,
           COALESCE(m.n_maybe, 0) >= 2 AS bloom_flagged
    FROM (SELECT doc_id FROM documents WHERE doc_id % 50 != 0) d
    LEFT JOIN per_doc m ON d.doc_id = m.doc_id"""
