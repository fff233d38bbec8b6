from .analysis import (  # noqa: F401
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    normalized_text,
    quality_score,
    token_count,
    word_tokens,
)
from .chunking import chunk_documents  # noqa: F401
from .classifier import classifier_score, token_buckets  # noqa: F401
from .compression import compression_ratio  # noqa: F401
from .contamination import ngram_overlap  # noqa: F401
from .encoding import (  # noqa: F401
    MOJIBAKE_MAP,
    fix_mojibake,
    strip_control_chars,
)
from .gopher import GOPHER_STOPWORDS, gopher_filter, gopher_quality  # noqa: F401
from .html import html_to_text  # noqa: F401
from .links import (  # noqa: F401
    anchor_term_profile,
    extract_anchors,
    extract_outlinks,
    host_edges,
    host_reciprocity,
    resolve_link,
)
from .lm import BigramLM, lm_avg_nll, train_bigram_lm  # noqa: F401
from .unicodenorm import nfc_normalize  # noqa: F401
from .pii import PII_PATTERNS, pii_counts, redact_pii  # noqa: F401
from .repetition import (  # noqa: F401
    duplicate_line_fraction,
    repetition_metrics,
    top_bigram_coverage,
)
from .robots import (  # noqa: F401
    crawl_delays,
    filter_allowed,
    parse_crawl_delay,
    parse_robots_txt,
    robots_rules,
)
from .urlfilter import (  # noqa: F401
    cap_per_domain,
    filter_urls,
    url_shape_features,
)
from .urls import (  # noqa: F401
    url_host,
    url_normalize,
    url_registered_domain,
)
from .vocab import (  # noqa: F401
    document_frequencies,
    tf_idf_top_terms,
    token_frequencies,
    top_tokens,
    vocab_coverage,
)
