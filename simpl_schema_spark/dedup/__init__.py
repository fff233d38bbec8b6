from .exact import dedup_exact, exact_duplicate_groups, with_fingerprint  # noqa: F401
from .minhash import (  # noqa: F401
    lsh_candidate_pairs,
    minhash_near_duplicates,
    minhash_signature,
    shingles,
)
from .ngram import jaccard, ngram_jaccard_pairs  # noqa: F401
from .simhash import hamming_distance, simhash, simhash_near_duplicates  # noqa: F401
from .components import (  # noqa: F401
    connected_components,
    dedup_groups_from_pairs,
)
from .incremental import bloom_words, new_rows  # noqa: F401
from .keepbest import keep_best  # noqa: F401
from .lines import line_document_frequencies, remove_common_lines  # noqa: F401
from .spans import duplicate_spans, remove_duplicate_spans  # noqa: F401
from .winnow import (  # noqa: F401
    fingerprint_overlap_pairs,
    winnow,
    winnow_fingerprints,
)
