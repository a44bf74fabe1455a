from .knn import embedding_near_dupes, knn_bruteforce, knn_ivf

__all__ = ["knn_bruteforce", "knn_ivf", "embedding_near_dupes"]
