from .ann import (  # noqa: F401
    cosine,
    cosine_topk_bruteforce,
    dot,
    embedding_near_duplicates,
    l2_norm,
    random_hyperplane_signature,
)
from .ivf import ivf_topk, train_centroids, with_cluster_id  # noqa: F401
from .kmeans import kmeans_assign  # noqa: F401
from .semdedup import semantic_dedup_pairs  # noqa: F401
