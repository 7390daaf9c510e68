"""multichannel_commerce_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference medallion pipeline
(kingsley-123/Multichannel-Commerce-Data-Pipeline): bronze→silver→gold
conformance, margin analytics (CM1/CM2), the `exec_daily_kpi` reporting
query, plus large-scale training-data operators (dedup, similarity search,
text analysis, multimodal column plumbing).

Everything is expressed with the DataFrame / Spark SQL API so Catalyst +
Tungsten choose the physical plan; Python UDFs are avoided on hot paths.
"""

__version__ = "0.1.0"

from multichannel_commerce_data_pipeline_spark.session import get_spark  # noqa: F401
