"""Label → entity mapping.

Re-expresses the reference's ``DataFlowEntities``
(waimak-core/.../dataflow/DataFlowEntities.scala:12-94): an immutable map
from label to ``Optional[Any]`` — in practice a ``pyspark.sql.DataFrame``,
but deliberately loose so storage handles (AuditTable) and arbitrary Python
objects can live behind labels too.
"""

from __future__ import annotations

from typing import Any, Iterator, Mapping, Optional, Type, TypeVar

from .exceptions import EntitiesException

T = TypeVar("T")


class DataFlowEntities(Mapping[str, Optional[Any]]):
    """Immutable mapping of labels to entities (values may be None)."""

    __slots__ = ("_m",)

    def __init__(self, m: Mapping[str, Optional[Any]] | None = None):
        self._m: dict[str, Optional[Any]] = dict(m or {})

    # Mapping protocol -------------------------------------------------
    def __getitem__(self, label: str) -> Optional[Any]:
        if label not in self._m:
            raise EntitiesException(f"Label [{label}] is not present in entities")
        return self._m[label]

    def __contains__(self, label: object) -> bool:
        return label in self._m

    def __iter__(self) -> Iterator[str]:
        return iter(self._m)

    def __len__(self) -> int:
        return len(self._m)

    # Typed access (DataFlowEntities.get[T] semantics) ------------------
    def get(self, label: str, tpe: Type[T] | None = None) -> T:
        """Return the non-None entity behind ``label``; optional type check."""
        v = self[label]
        if v is None:
            raise EntitiesException(f"Entity [{label}] is empty (None)")
        if tpe is not None and not isinstance(v, tpe):
            raise EntitiesException(
                f"Entity [{label}] is a {type(v).__name__}, expected {tpe.__name__}"
            )
        return v

    def get_option(self, label: str, tpe: Type[T] | None = None) -> Optional[T]:
        v = self[label]
        if v is not None and tpe is not None and not isinstance(v, tpe):
            raise EntitiesException(
                f"Entity [{label}] is a {type(v).__name__}, expected {tpe.__name__}"
            )
        return v

    def get_all_of_type(self, tpe: Type[T]) -> dict[str, T]:
        return {k: v for k, v in self._m.items() if isinstance(v, tpe)}

    def filter_labels(self, labels: list[str]) -> "DataFlowEntities":
        return DataFlowEntities({k: self._m[k] for k in labels if k in self._m})

    def non_empty(self, label: str) -> bool:
        return self._m.get(label) is not None

    # Functional updates ------------------------------------------------
    def with_entity(self, label: str, value: Optional[Any]) -> "DataFlowEntities":
        m = dict(self._m)
        m[label] = value
        return DataFlowEntities(m)

    def with_entities(self, other: Mapping[str, Optional[Any]]) -> "DataFlowEntities":
        m = dict(self._m)
        m.update(other)
        return DataFlowEntities(m)

    def labels(self) -> set[str]:
        return set(self._m)

    def __repr__(self) -> str:  # pragma: no cover
        return f"DataFlowEntities({sorted(self._m)})"
