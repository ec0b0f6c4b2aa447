"""DAG node: a coarse-grained action over labelled entities.

Re-expresses the reference's ``DataFlowAction``
(waimak-core/.../dataflow/DataFlowAction.scala:14-94): an action declares
``input_labels`` / ``output_labels`` and a ``perform(inputs, context)`` body
returning exactly one value per output label. Readiness
(``flow_state``) requires every input label to be present and non-empty
unless ``requires_all_inputs`` is False (DataFlowAction.scala:74-93).
"""

from __future__ import annotations

import uuid
from typing import Any, Callable, Optional, Sequence

from .entities import DataFlowEntities
from .exceptions import DataFlowException

# An action body: (inputs, context) -> one (possibly None) value per output label.
ActionBody = Callable[[DataFlowEntities, Any], Sequence[Optional[Any]]]


class DataFlowAction:
    """A node in the flow DAG.

    Subclass and override :meth:`perform`, or pass a callable body to the
    :class:`SimpleAction` convenience subclass.
    """

    #: if False the action can run with missing/empty inputs (it receives
    #: whatever subset exists) — reference DataFlowAction.requiresAllInputs
    requires_all_inputs: bool = True

    def __init__(
        self,
        input_labels: Sequence[str],
        output_labels: Sequence[str],
        name: str | None = None,
    ):
        self.input_labels: list[str] = list(input_labels)
        self.output_labels: list[str] = list(output_labels)
        self.name = name or type(self).__name__
        #: stable identity across interceptor wrapping (schedulingGuid)
        self.guid: str = uuid.uuid4().hex
        #: tags this action was added under / depends on (DataFlow.scala:200-232)
        self.tags: frozenset[str] = frozenset()
        self.tag_dependencies: frozenset[str] = frozenset()
        #: execution pool name (DataFlow.scala:254)
        self.pool: str = "DEFAULT"

    # ------------------------------------------------------------------
    def perform(self, inputs: DataFlowEntities, context: Any) -> list[Optional[Any]]:
        raise NotImplementedError

    def perform_checked(self, inputs: DataFlowEntities, context: Any) -> list[Optional[Any]]:
        out = list(self.perform(inputs, context))
        if len(out) != len(self.output_labels):
            raise DataFlowException(
                f"Action [{self.description}] returned {len(out)} outputs, "
                f"expected {len(self.output_labels)}"
            )
        return out

    # ------------------------------------------------------------------
    def ready_to_run(self, inputs: DataFlowEntities) -> bool:
        """True if every input label is present, and (unless
        ``requires_all_inputs`` is False) non-empty.

        Mirrors DataFlowAction.scala flowState: an absent input always means
        RequiresInput — ``requiresAllInputs=false`` only relaxes the
        present-but-empty case, never presence itself. Otherwise an action
        could be scheduled before its producers ran."""
        if not all(l in inputs for l in self.input_labels):
            return False
        if not self.requires_all_inputs:
            return True
        return all(inputs.non_empty(l) for l in self.input_labels)

    @property
    def description(self) -> str:
        return (
            f"Action: {self.name} Inputs: {self.input_labels} "
            f"Outputs: {self.output_labels}"
        )

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{self.description}>"


class SimpleAction(DataFlowAction):
    """Action driven by a plain callable body."""

    def __init__(
        self,
        input_labels: Sequence[str],
        output_labels: Sequence[str],
        body: ActionBody,
        name: str | None = None,
        requires_all_inputs: bool = True,
    ):
        super().__init__(input_labels, output_labels, name=name)
        self._body = body
        self.requires_all_inputs = requires_all_inputs

    def perform(self, inputs: DataFlowEntities, context: Any) -> list[Optional[Any]]:
        return list(self._body(inputs, context))
