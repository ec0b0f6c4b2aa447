"""Exception hierarchy for the dataflow framework.

Mirrors the semantics of the reference's DataFlowException /
EntitiesException (waimak-core dataflow/package.scala, DataFlowEntities.scala)
without copying any code: one exception carries the failing action's
identity, one signals entity-lookup/type errors, one DAG-validation errors.
"""

from __future__ import annotations


class DataFlowException(Exception):
    """An action failed during flow execution."""

    def __init__(self, message: str, cause: BaseException | None = None):
        super().__init__(message)
        self.cause = cause


class EntitiesException(DataFlowException):
    """Entity missing, empty, or of the wrong type."""


class FlowValidationException(DataFlowException):
    """The flow DAG is invalid (duplicate labels, cycles, open tags...)."""


class ActionException(DataFlowException):
    """Wraps a failure inside a specific action, keeping its identity.

    Reference behaviour: executor fails the whole flow with the failing
    action's description (DataFlowExecutor.scala:150-156).
    """

    def __init__(self, action_name: str, guid: str, cause: BaseException):
        super().__init__(
            f"Action [{action_name}] (guid={guid}) failed: {cause!r}", cause
        )
        self.action_name = action_name
        self.guid = guid
