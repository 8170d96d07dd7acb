"""Engine operators: ETL, TF-IDF, K-Means, dedup, similarity, text analysis,
multimodal column handling."""
