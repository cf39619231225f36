"""data_ingestion_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of ``redhat-composer-ai/data-ingestion``
(a KFP RAG ingestion system: scrape → clean → chunk → embed → vector
store, plus a query side of top-k vector similarity / record counts /
collection listing), extended with the LLM-training-data operators a
100 TB pipeline needs: deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding cosine), similarity search (brute-force and
LSH/IVF-bucketed), multimodal binary columns, and text analysis
(language-ID, quality scoring, token counting, fingerprinting).

Design stance (SURVEY.md §7.0): every operator is a function
``(DataFrame, ...) -> DataFrame`` composing native Spark SQL
expressions first; pandas UDFs only where Python libraries are
genuinely unavoidable; no ``collect()`` in any operator path; all
plans lazy so Catalyst can push down, prune, and pick join strategies.
"""

__version__ = "0.1.0"
