"""PySpark-native analytics engine with the query and data-processing
capabilities of GoogleCloudPlatform/datacatalog-tag-engine.

The reference engine (Flask + Firestore + Cloud Tasks + BigQuery) fans out
one HTTP task per data asset and one SQL statement per tag field
(reference: TaskManager.py:234-268, DataCatalogController.py:273-305).
This engine inverts that design: asset discovery, per-asset expression
evaluation, tag reconciliation, import/export, history and coverage
reporting are declarative DataFrame transformations planned by Catalyst,
so one Spark job replaces O(assets x fields) statements and scales to
millions of assets (reference load ladder: examples/load/configs/).

Layout:
    model/      table schemas + the scalar type-coercion matrix (SURVEY 1.x)
    operators/  URI algebra, $var substitution, config executors (SURVEY 2.x)
    store/      tags / history / jobs tables with MERGE-style idempotent writes
    pipeline/   training-data operators: dedup, similarity, text, multimodal
    streaming/  scheduled refresh + usage-event aggregation (SURVEY 2.8)
"""

__version__ = "0.1.0"
