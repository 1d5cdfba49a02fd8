"""Operator surface: dedup, similarity search, as-of join, top-k, text
analysis, sampling/packing, skew mitigation, multimodal plumbing."""

from .asof import asof_join
from .dedup import (
    connected_components,
    exact_dedup,
    keep_best_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_near_dup_pairs,
    minhash_signature,
    minhash_table,
    normalize_text,
    shingle_rows,
    shingles,
    simhash,
)
from .multimodal import attach_fake_media, extract_media_features
from .sampling import deterministic_sample, hash_bucket, pack_sequences
from .similarity import (
    cosine,
    cosine_pairs_exact,
    cosine_pairs_exact_blas,
    cosine_pairs_lsh,
    dot,
    ivf_assign,
    ivf_topk,
    l2_norm,
    lsh_signatures,
    topk_cosine,
)
from .skew import salted_join, two_phase_count_distinct
from .text import (
    bpe_ish_token_count,
    fingerprint_md5,
    language_id,
    language_id_table,
    punct_ratio,
    quality_score,
    redact_pii,
    stopword_ratio,
    token_count,
    token_diversity,
    winnow_fingerprint,
)
from .timeseries import resample_ffill
from .topk import topk_per_group

__all__ = [
    "asof_join",
    "connected_components",
    "exact_dedup",
    "keep_best_dedup",
    "jaccard_pairs",
    "lsh_candidate_pairs",
    "minhash_near_dup_pairs",
    "minhash_signature",
    "minhash_table",
    "normalize_text",
    "shingle_rows",
    "shingles",
    "simhash",
    "attach_fake_media",
    "extract_media_features",
    "deterministic_sample",
    "hash_bucket",
    "pack_sequences",
    "cosine",
    "cosine_pairs_exact",
    "cosine_pairs_exact_blas",
    "cosine_pairs_lsh",
    "dot",
    "ivf_assign",
    "ivf_topk",
    "l2_norm",
    "lsh_signatures",
    "topk_cosine",
    "salted_join",
    "two_phase_count_distinct",
    "bpe_ish_token_count",
    "fingerprint_md5",
    "language_id",
    "language_id_table",
    "punct_ratio",
    "quality_score",
    "redact_pii",
    "stopword_ratio",
    "token_count",
    "token_diversity",
    "winnow_fingerprint",
    "resample_ffill",
    "topk_per_group",
]
