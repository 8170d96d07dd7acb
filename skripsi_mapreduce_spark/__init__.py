"""skripsi_mapreduce_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities of
the reference MapReduce application (rakhaegg/skripsi_mapreduce): document
ETL, TF-IDF vectorization, iterative K-Means — re-expressed Spark-first on
the DataFrame/SQL API — plus a declared relational query surface and
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal columns, streaming windows) designed for 100 TB scale.

Nothing in this package is copied from the reference; every behavior
reference is cited as ``file:line`` relative to ``/root/reference/`` in
docstrings so semantics parity can be audited.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
