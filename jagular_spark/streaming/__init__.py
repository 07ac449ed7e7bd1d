"""Structured-Streaming twins of the batch operators. Every pipeline
operator is exported here (r17: the package previously re-exported only
six of fifteen, leaving two inconsistent import surfaces — pinned by
tests/test_streaming.py)."""

from jagular_spark.streaming.pipeline import (  # noqa: F401
    stream_band_energy,
    stream_bpe_token_counts,
    stream_censor,
    stream_crossings,
    stream_curation,
    stream_dedup,
    stream_dsir_scores,
    stream_dup_kgram_marks,
    stream_fluency_score,
    stream_interpolate,
    stream_interval_enrich,
    stream_lsh_candidate_pairs,
    stream_sessionize,
    stream_token_budget_sample,
    stream_training_shard_pack,
)
