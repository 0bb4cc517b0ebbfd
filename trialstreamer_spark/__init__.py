"""trialstreamer_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of ijmarshall/trialstreamer.

Architecture (SURVEY.md is the blueprint):

- ``session``    — SparkSession factory tuned for local[N] and cluster runs.
- ``io``         — table loaders for the parquet test corpus.
- ``schemas``    — typed StructType replacements for the reference's jsonb.
- ``plans``      — declarative DataFrame query plans (the correctness gate).
- ``operators``  — dedup / similarity / upsert / text-stats operators.
- ``functions``  — column-expression libraries (text normalization, vectors).
- ``sources``    — ingestion readers (PubMed XML, RIS, ICTRP CSV, JSONL).
- ``streaming``  — Structured Streaming pipelines with foreachBatch MERGE.
- ``api``        — the serving-layer query surface (picosearch, autocomplete,
                   meta, covid19, get_trial) re-expressed as DataFrame plans.

Everything is DataFrame/SQL-first: logical plans are declared with the
DataFrame API and Catalyst picks the physical strategy. Python touches data
only through Arrow-batched pandas UDFs where built-ins genuinely cannot
express the semantics (Schwartz-Hearst, dictionary NER).
"""

__version__ = "0.1.0"
