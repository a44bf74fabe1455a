from .cluster import kmeans_assign, kmeans_cluster_sizes, kmeans_fit
from .knn import (
    embedding_near_dupes,
    embedding_near_dupes_lsh,
    knn_bruteforce,
    knn_bruteforce_multi,
    knn_ivf,
)

__all__ = [
    "knn_bruteforce",
    "knn_bruteforce_multi",
    "knn_ivf",
    "embedding_near_dupes",
    "embedding_near_dupes_lsh",
    "kmeans_fit",
    "kmeans_assign",
    "kmeans_cluster_sizes",
]
from .profiles import profile_cosine, profile_counts  # noqa: F401,E402

__all__ += ["profile_counts", "profile_cosine"]
