"""waimak_spark — a PySpark-native dataflow engine with the capabilities of
CoxAutomotiveDataSolutions/waimak, re-expressed Spark-first, plus
large-scale training-data pipeline operators (dedup, similarity search,
multimodal columns, text analysis).
"""

from .dataflow import (
    DataFlow,
    DataFlowAction,
    DataFlowEntities,
    ParallelDataFlowExecutor,
    SequentialDataFlowExecutor,
    SimpleAction,
    SparkDataFlow,
    Waimak,
)

__version__ = "0.1.0"
