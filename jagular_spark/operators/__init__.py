from jagular_spark.operators.timestamps import (  # noqa: F401
    check_timestamps,
    contiguous_segments,
    dedup_keep_first,
    duplicate_timestamps,
    gap_lengths,
    infer_step,
    is_sorted,
)
from jagular_spark.operators.interpolate import interpolate_gaps  # noqa: F401
from jagular_spark.operators.graph import connected_components, dedup_clusters  # noqa: F401
from jagular_spark.operators.sampling import (  # noqa: F401
    hash_sample,
    rebalance_sample,
    stratified_sample,
)
from jagular_spark.operators.skew import salted_agg, salted_join  # noqa: F401
from jagular_spark.operators.filtering import (  # noqa: F401
    lag_correlation,
    winsorize,
    winsorize_chunked,
)
from jagular_spark.operators.text import (  # noqa: F401
    bigram_fluency,
    bpe_token_stats,
    chunk_documents,
    decontaminate,
    domain_mixture,
    language_id,
    repetition_stats,
    tfidf_top,
    vocab_top_df,
)
from jagular_spark.operators.similarity import (  # noqa: F401
    ann_topk_bruteforce,
    ann_topk_ivf,
    ann_topk_ivf_frozen,
    ann_topk_ivf_pq,
    ann_topk_lsh,
    ivf_fit_centroids,
    knn_classify,
    lsh_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_lsh,
    pq_fit_codebooks,
    simhash,
    simhash_neardup_pairs,
)
