"""streaming_data_pipeline_capstone_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query / data-processing capabilities of the
reference repo ``hall-alexander/streaming-data-pipeline-capstone`` (an AIS
maritime-vessel streaming pipeline), re-expressed Spark-first:

- DataFrame / SQL declarative plans, Catalyst-optimized
- zero row-at-a-time Python UDFs on the hot path (the reference's two scalar
  UDFs, ``preprocess.py:50`` and ``preprocess.py:57``, become native Column
  expressions here)
- Structured Streaming with executor-side keyed state (the reference held
  state in a driver-side global temp view, ``predict_path.py:53``)
- plus the large-scale training-data-pipeline extensions: dedup, similarity
  search, text analysis, multimodal column plumbing.

Layout:

- ``session``    SparkSession builder with scale-aware defaults
- ``schemas``    AIS wire/processed schemas + testdata schemas
- ``sources``    batch + streaming readers, replay utility
- ``functions``  scalar column functions (geo, text, time, cleaning)
- ``operators``  composed relational / dedup / similarity / window operators
- ``streaming``  sinks, stateful operators (last-K per key, gap-fill)
- ``plans``      end-to-end pipeline compositions (preprocess, predict)
"""

from streaming_data_pipeline_capstone_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
