from .task import (
    GeneratorArg,
    GenerativeOutput,
    RequestResult,
    SearchTask,
    StreamResult,
    StreamResultType,
    TaskStatus,
)
from .engine import ModelExecutor
from .scheduler import Scheduler
from .generator import DynamicBatchGenerator
from .detokenizer import IncrementalDetokenizer
from .session import SessionGenerator
from .beam import BeamGroup, BeamResultManager

__all__ = [
    "SessionGenerator",
    "BeamGroup",
    "BeamResultManager",
    "GeneratorArg",
    "GenerativeOutput",
    "RequestResult",
    "SearchTask",
    "StreamResult",
    "StreamResultType",
    "TaskStatus",
    "ModelExecutor",
    "Scheduler",
    "DynamicBatchGenerator",
    "IncrementalDetokenizer",
]
