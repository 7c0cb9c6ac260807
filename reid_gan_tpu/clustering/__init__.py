"""Pseudo-label generators: DBSCAN / Infomap / k-means
(SURVEY.md §2.4 native-replacement plan)."""

from .dbscan import dbscan
from .kmeans import kmeans_labels

__all__ = ["dbscan", "kmeans_labels"]
