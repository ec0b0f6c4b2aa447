"""Immutable DataFlow: pending actions + ready entities + tag state.

Re-expresses the reference's ``DataFlow``
(waimak-core/.../dataflow/DataFlow.scala:25-515) in idiomatic Python:

* functional builder — every mutation returns a **new** flow object;
* ``executed(action, outputs)`` removes the action and publishes its
  outputs as inputs (DataFlow.scala:298-303);
* ``next_runnable(pools)`` = actions whose inputs are ready and whose tag
  dependencies are satisfied (DataFlow.scala:317-336);
* ``tag`` / ``tag_dependency`` record ordering edges without data edges
  (DataFlow.scala:200-232);
* ``is_valid_flow_dag`` checks label uniqueness, producedness, no open
  tags, and cycle-freedom over label+tag edges (DataFlow.scala:423-513);
* metadata extensions run ``pre_execution`` until stable, capped at 10
  iterations (DataFlow.scala:377-397, 525-526).
"""

from __future__ import annotations

import copy
from typing import Any, Callable, Iterable, Mapping, Optional, Sequence, TypeVar

from .action import DataFlowAction
from .entities import DataFlowEntities
from .exceptions import DataFlowException, FlowValidationException

F = TypeVar("F", bound="DataFlow")

DEFAULT_POOL = "DEFAULT"
# Stabilisation cap for metadata-extension manipulations; conf-tunable like
# the reference (DataFlow.scala's prepareForExecution loop — the flag keeps
# the reference's exact spelling, including its "Stabalise" typo, so configs
# written for the reference keep working).
CONF_MAX_EXTENSION_ITERATIONS = (
    "spark.waimak.dataflow.maxIterationsForExtensionManipulationsToStabalise")
MAX_EXTENSION_ITERATIONS = 10


class FlowContext:
    """Execution context handed to every action body. Subclassed by Spark flows."""

    def get_string(self, key: str, default: str) -> str:
        """Config lookup; the base context has no config source."""
        return default


CONF_EXTENSIONS = "spark.waimak.dataflow.extensions"


class DataFlowConfigurationExtension:
    """Pre-execution hook enabled by listing its ``extension_key`` in the
    comma-separated ``spark.waimak.dataflow.extensions`` config.

    Reference: the ServiceLoader-discovered DataFlowConfigurationExtension
    trait (DataFlow.scala:659-671) looked up and run once in
    prepareForExecution (DataFlow.scala:345-367). Idiomatic Python: an
    explicit registry populated by the ``register_configuration_extension``
    decorator instead of java.util.ServiceLoader."""

    extension_key: str = ""

    def pre_execution_manipulation(self, flow: "DataFlow") -> "DataFlow":
        return flow


_CONFIGURATION_EXTENSIONS: dict[str, type] = {}

# Built-in extension modules preloaded before key resolution (registration
# happens at import time; this is the explicit stand-in for ServiceLoader
# discovery).  Third-party extensions are NOT discovered automatically:
# import the defining module before execute() — the unknown-key error
# says so.
_BUILTIN_EXTENSION_MODULES = (
    "waimak_spark.operators.cache",
    "waimak_spark.dataquality.extension",
)


def register_configuration_extension(cls: type) -> type:
    """Class decorator: make a DataFlowConfigurationExtension discoverable
    by its ``extension_key``."""
    key = getattr(cls, "extension_key", "")
    if not key:
        raise ValueError(
            f"{cls.__name__} must define a non-empty extension_key")
    _CONFIGURATION_EXTENSIONS[key] = cls
    return cls


class MetadataExtension:
    """Flow-attached state with a pre-execution manipulation hook.

    ``pre_execution(flow)`` may rewrite the flow (add/replace actions); it
    is looped until the extension set stabilises. Return the (possibly new)
    flow; remove yourself from ``flow.extensions`` when done.
    """

    def pre_execution(self, flow: "DataFlow") -> "DataFlow":
        return flow


class DataFlow:
    """Immutable flow state; all builder methods return a new flow."""

    def __init__(self, context: FlowContext | None = None):
        self.context: FlowContext = context or FlowContext()
        self.inputs: DataFlowEntities = DataFlowEntities()
        self.actions: list[DataFlowAction] = []
        #: tags currently being applied to newly added actions
        self._active_tags: frozenset[str] = frozenset()
        self._active_tag_deps: frozenset[str] = frozenset()
        self._active_pool: str = DEFAULT_POOL
        self.extensions: list[MetadataExtension] = []
        #: labels whose DataFrames should be registered as SQL temp views
        self.sql_tables: set[str] = set()

    # -- functional copy -------------------------------------------------
    def _copy(self: F, **changes: Any) -> F:
        new = copy.copy(self)
        new.actions = list(self.actions)
        new.extensions = list(self.extensions)
        new.sql_tables = set(self.sql_tables)
        for k, v in changes.items():
            setattr(new, k, v)
        return new

    # -- builder ----------------------------------------------------------
    def add_action(self: F, action: DataFlowAction) -> F:
        """Append an action; stamp active tags/pool; validate output labels.

        The action is shallow-copied before being stamped so the caller's
        instance stays untouched — adding the same instance to two branched
        flows must not accumulate tag/pool state across branches (immutable
        flow contract; the reference keeps tag state on the flow's tagState,
        DataFlow.scala:200-232). A fresh guid is issued if this flow already
        holds the guid, so ``executed``'s guid-based removal stays unique."""
        produced = {l for a in self.actions for l in a.output_labels}
        for label in action.output_labels:
            if label in produced:
                raise FlowValidationException(
                    f"Output label [{label}] is produced by more than one action"
                )
            if label in self.inputs:
                raise FlowValidationException(
                    f"Output label [{label}] is already present in flow inputs"
                )
        conflict = action.tags & action.tag_dependencies | (
            self._active_tags & self._active_tag_deps
        )
        if conflict:
            raise FlowValidationException(
                f"Action [{action.name}] both sets and depends on tags {sorted(conflict)}"
            )
        import uuid as _uuid

        stamped = copy.copy(action)
        if any(a.guid == stamped.guid for a in self.actions):
            stamped.guid = _uuid.uuid4().hex
        stamped.tags = frozenset(action.tags | self._active_tags)
        stamped.tag_dependencies = frozenset(
            action.tag_dependencies | self._active_tag_deps
        )
        stamped.pool = self._active_pool
        return self._copy(actions=self.actions + [stamped])

    def add_input(self: F, label: str, value: Optional[Any]) -> F:
        if label in self.inputs:
            raise FlowValidationException(f"Input label [{label}] already exists")
        return self._copy(inputs=self.inputs.with_entity(label, value))

    def map(self: F, f: Callable[[F], F]) -> F:
        return f(self)

    def map_option(self: F, f: Callable[[F], Optional[F]]) -> F:
        return f(self) or self

    def fold_left_over(self: F, items: Iterable[Any], f: Callable[[F, Any], F]) -> F:
        flow = self
        for it in items:
            flow = f(flow, it)
        return flow

    # -- tags / pools (callback scopes replace Scala closure blocks) -----
    def tag(self: F, *tags: str) -> Callable[[Callable[[F], F]], F]:
        """Scala-parity spelling of :meth:`tagged` —
        ``flow.tag("t")(lambda f: ...)`` (DataFlow.scala:200)."""
        return self.tagged(*tags)

    def tagged(self: F, *tags: str) -> Callable[[Callable[[F], F]], F]:
        """``flow.tagged("t")(lambda f: f.open_parquet(...))`` — every action
        added inside the callback carries tag ``t``."""

        def run(fn: Callable[[F], F]) -> F:
            scoped = self._copy(_active_tags=self._active_tags | set(tags))
            out = fn(scoped)
            return out._copy(_active_tags=self._active_tags)

        return run

    def tag_dependency(self: F, *tags: str) -> Callable[[Callable[[F], F]], F]:
        def run(fn: Callable[[F], F]) -> F:
            scoped = self._copy(_active_tag_deps=self._active_tag_deps | set(tags))
            out = fn(scoped)
            return out._copy(_active_tag_deps=self._active_tag_deps)

        return run

    def execution_pool(self: F, pool: str) -> Callable[[Callable[[F], F]], F]:
        def run(fn: Callable[[F], F]) -> F:
            scoped = self._copy(_active_pool=pool)
            out = fn(scoped)
            return out._copy(_active_pool=self._active_pool)

        return run

    # -- combine (SparkDataFlow.scala:133-148) -----------------------------
    def combine(self: F, other: "DataFlow") -> F:
        """Merge two flows for parallel execution: smash inputs, actions,
        sql-table registrations and extensions together, then re-validate
        (duplicate labels across the flows fail validation). Also exposed
        as ``flow1 + flow2``."""
        for label in other.inputs:
            if label in self.inputs:
                raise FlowValidationException(
                    f"Input label [{label}] exists in both flows being combined")
        merged = self._copy(
            inputs=self.inputs.with_entities(dict(other.inputs.items())),
            actions=self.actions + list(other.actions),
            extensions=self.extensions + [
                e for e in other.extensions if e not in self.extensions],
            sql_tables=self.sql_tables | other.sql_tables,
        )
        merged.validate()
        return merged

    def __add__(self: F, other: "DataFlow") -> F:
        return self.combine(other)

    # -- interceptors ------------------------------------------------------
    def add_interceptor(self: F, interceptor: DataFlowAction, guid_to_replace: str) -> F:
        """Replace the action with ``guid_to_replace`` by ``interceptor``
        (which must expose the same scheduling guid) — DataFlow.scala:175."""
        idx = [i for i, a in enumerate(self.actions) if a.guid == guid_to_replace]
        if not idx:
            raise FlowValidationException(
                f"No action with guid [{guid_to_replace}] to intercept"
            )
        actions = list(self.actions)
        actions[idx[0]] = interceptor
        return self._copy(actions=actions)

    # -- extensions ---------------------------------------------------------
    def with_extension(self: F, ext: MetadataExtension) -> F:
        return self._copy(extensions=self.extensions + [ext])

    def without_extension(self: F, ext: MetadataExtension) -> F:
        return self._copy(extensions=[e for e in self.extensions if e is not ext])

    def get_extensions_of_type(self, tpe: type) -> list[MetadataExtension]:
        return [e for e in self.extensions if isinstance(e, tpe)]

    # -- execution lifecycle -------------------------------------------------
    def executed(self: F, action: DataFlowAction, outputs: Sequence[Optional[Any]]) -> F:
        """Remove a completed action; publish its outputs as inputs."""
        if len(outputs) != len(action.output_labels):
            raise DataFlowException(
                f"Action [{action.description}] produced {len(outputs)} outputs, "
                f"expected {len(action.output_labels)}"
            )
        actions = [a for a in self.actions if a.guid != action.guid]
        inputs = self.inputs.with_entities(dict(zip(action.output_labels, outputs)))
        return self._copy(actions=actions, inputs=inputs)

    def _executed_tags(self) -> frozenset[str]:
        """Tags with no pending actions left → dependencies on them are met."""
        pending = {t for a in self.actions for t in a.tags}
        all_tags = pending | {t for a in self.actions for t in a.tag_dependencies}
        return frozenset(t for t in all_tags if t not in pending)

    def next_runnable(self, pools: Iterable[str] | None = None) -> list[DataFlowAction]:
        """Actions whose inputs are ready and tag dependencies satisfied."""
        done_tags = self._executed_tags()
        pool_set = set(pools) if pools is not None else None
        out = []
        for a in self.actions:
            if pool_set is not None and a.pool not in pool_set:
                continue
            if a.tag_dependencies and not a.tag_dependencies <= done_tags:
                continue
            if a.ready_to_run(self.inputs):
                out.append(a)
        return out

    def _enabled_configuration_extensions(self) -> list[DataFlowConfigurationExtension]:
        names = [s.strip() for s in
                 self.context.get_string(CONF_EXTENSIONS, "").split(",")
                 if s.strip()]
        if names:
            # lazy to avoid import cycles (flow.py <- operators.cache)
            import importlib

            for mod in _BUILTIN_EXTENSION_MODULES:
                importlib.import_module(mod)
        unknown = [n for n in names if n not in _CONFIGURATION_EXTENSIONS]
        if unknown:
            raise FlowValidationException(
                f"Unknown configuration extensions {unknown}; registered: "
                f"{sorted(_CONFIGURATION_EXTENSIONS)}. A third-party "
                f"extension's module must be imported (registering its "
                f"@register_configuration_extension class) before "
                f"prepare_for_execution/execute runs.")
        return [_CONFIGURATION_EXTENSIONS[n]() for n in names]

    def prepare_for_execution(self: F) -> F:
        """Run config extensions once, then metadata extensions until stable
        (capped — default 10, conf-tunable), then validate."""
        flow = self
        for cext in self._enabled_configuration_extensions():
            flow = cext.pre_execution_manipulation(flow)
        max_iter = int(self.context.get_string(
            CONF_MAX_EXTENSION_ITERATIONS, str(MAX_EXTENSION_ITERATIONS)))
        for _ in range(max_iter):
            if not flow.extensions:
                break
            exts = list(flow.extensions)
            for ext in exts:
                flow = ext.pre_execution(flow)
            if list(flow.extensions) == exts:
                # no extension removed/added itself → stable
                break
        else:
            if flow.extensions:
                raise FlowValidationException(
                    f"Maximum number of iterations [{max_iter}] reached "
                    f"before extension manipulations stabilised. You can "
                    f"increase this limit using the flag "
                    f"[{CONF_MAX_EXTENSION_ITERATIONS}]. Unstable: "
                    f"{[type(e).__name__ for e in flow.extensions]}"
                )
        flow.validate()
        return flow

    def finalise_execution(self: F) -> F:
        return self

    # -- validation ------------------------------------------------------------
    def validate(self) -> None:
        """DAG sanity: unique outputs, all inputs producible, no open tags,
        no cycles over label + tag edges (DataFlow.scala:423-513)."""
        produced: dict[str, DataFlowAction] = {}
        for a in self.actions:
            for l in a.output_labels:
                if l in produced:
                    raise FlowValidationException(
                        f"Label [{l}] produced by both [{produced[l].name}] and [{a.name}]"
                    )
                if l in self.inputs:
                    raise FlowValidationException(
                        f"Label [{l}] is both a flow input and an action output"
                    )
                produced[l] = a
        available = self.inputs.labels()
        for a in self.actions:
            for l in a.input_labels:
                if l not in available and l not in produced:
                    raise FlowValidationException(
                        f"Action [{a.name}] depends on label [{l}] which no "
                        f"action produces and no input provides"
                    )
        # every depended-on tag must be carried by at least one action —
        # a typo'd tag would otherwise silently drop the ordering edge
        # (reference: "Could not find any actions tagged with label [t]",
        # DataFlow.scala isValidFlowDAG)
        carried = {t for a in self.actions for t in a.tags}
        for a in self.actions:
            for t in a.tag_dependencies:
                if t not in carried:
                    raise FlowValidationException(
                        f"Action [{a.name}] depends on tag [{t}] but no "
                        f"action in the flow is tagged with it"
                    )
        # cycle detection: edges = label deps + tag deps
        by_tag: dict[str, list[DataFlowAction]] = {}
        for a in self.actions:
            for t in a.tags:
                by_tag.setdefault(t, []).append(a)
        deps: dict[str, list[str]] = {}  # action guid -> predecessor guids
        for a in self.actions:
            pred: list[str] = []
            for l in a.input_labels:
                if l in produced:
                    pred.append(produced[l].guid)
            for t in a.tag_dependencies:
                pred.extend(x.guid for x in by_tag.get(t, []))
            deps[a.guid] = pred
        WHITE, GREY, BLACK = 0, 1, 2
        colour = {g: WHITE for g in deps}
        names = {a.guid: a.name for a in self.actions}

        def dfs(g: str, stack: list[str]) -> None:
            colour[g] = GREY
            for p in deps[g]:
                if colour.get(p) == GREY:
                    raise FlowValidationException(
                        f"Cycle detected involving actions "
                        f"{[names[x] for x in stack + [g, p]]}"
                    )
                if colour.get(p) == WHITE:
                    dfs(p, stack + [g])
            colour[g] = BLACK

        for g in list(deps):
            if colour[g] == WHITE:
                dfs(g, [])

    # -- execute (convenience; full semantics in executor.py) ------------------
    def execute(self, executor: Any = None, error_on_unexecuted: bool = True):
        from .executor import SequentialDataFlowExecutor

        ex = executor or SequentialDataFlowExecutor()
        return ex.execute(self, error_on_unexecuted=error_on_unexecuted)
