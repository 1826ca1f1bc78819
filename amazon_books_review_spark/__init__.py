"""amazon_books_review_spark — a PySpark-native analytics engine.

A ground-up, Spark-first rebuild of the query and data-processing
capabilities of the reference project ``Rooban1030/Amazon-Books-Review``
(three Databricks notebooks: two batch cleaning chains and a streaming
medallion pipeline — see SURVEY.md for the full structural analysis),
re-expressed as a portable, parameterized, tested library:

- ``session``    — SparkSession builder pinning the semantic confs the
                   reference relies on (LEGACY time parser, non-ANSI casts).
- ``sources``    — batch + streaming readers/writers with explicit schemas.
- ``operators``  — the reference's operator inventory (SURVEY.md §2) as
                   pure ``DataFrame -> DataFrame`` functions shared by batch
                   and streaming plans.
- ``functions``  — scalar/text/dedup/similarity column-level helpers,
                   including the large-scale training-data-pipeline ops
                   (MinHash/SimHash dedup, ANN search, text analysis).
- ``plans``      — bronze/silver/gold medallion assemblies and the two
                   cleaning pipelines, batch mode.
- ``streaming``  — the same plans in Structured Streaming form with
                   checkpointing, watermarks and availableNow triggers.

Everything is built on the public Apache Spark DataFrame/SQL API; no
custom Catalyst rules are needed (SURVEY.md §4.1).
"""

__version__ = "0.1.0"
