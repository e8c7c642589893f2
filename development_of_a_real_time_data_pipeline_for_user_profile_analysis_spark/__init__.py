"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference real-time user-profile pipeline
(LAMIAE-ELHOSNI/Development-of-a-Real-Time-Data-Pipeline-for-User-Profile-Analysis),
re-architected Spark-first for 100 TB scale.

Subpackages
-----------
- ``sources``   : batch/streaming readers + deterministic synthetic feeders
- ``operators`` : ETL, aggregates, analytics (joins/windows/set-ops),
                  dedup, similarity, text analysis, multimodal plumbing
- ``functions`` : scalar column helpers (age, domain extract, pseudonymize)
- ``plans``     : the query registry exposed to the driver via
                  ``__spark_entry__``
- ``streaming`` : Structured Streaming pipeline (single checkpointed
                  query, foreachBatch multi-sink fan-out)
"""

__version__ = "0.1.0"
