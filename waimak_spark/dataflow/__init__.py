from .action import DataFlowAction, SimpleAction
from .entities import DataFlowEntities
from .exceptions import (
    ActionException,
    DataFlowException,
    EntitiesException,
    FlowValidationException,
)
from .executor import (
    ParallelDataFlowExecutor,
    SequentialDataFlowExecutor,
    as_added,
    prefer_loaders,
    race_to_outputs,
)
from .flow import DataFlow, FlowContext, MetadataExtension
from .interceptor import InterceptorAction, PostActionInterceptor
from .spark_flow import SparkDataFlow, SparkFlowContext, Waimak

__all__ = [
    "ActionException",
    "DataFlow",
    "DataFlowAction",
    "DataFlowEntities",
    "DataFlowException",
    "EntitiesException",
    "FlowContext",
    "FlowValidationException",
    "InterceptorAction",
    "MetadataExtension",
    "ParallelDataFlowExecutor",
    "PostActionInterceptor",
    "SequentialDataFlowExecutor",
    "SimpleAction",
    "SparkDataFlow",
    "SparkFlowContext",
    "Waimak",
    "as_added",
    "prefer_loaders",
    "race_to_outputs",
]
