from .analysis import (  # noqa: F401
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    normalized_text,
    quality_score,
    token_count,
    word_tokens,
)
