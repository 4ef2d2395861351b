from . import distance, topk, kmeans, pq, beam, graph

__all__ = ["distance", "topk", "kmeans", "pq", "beam", "graph"]
