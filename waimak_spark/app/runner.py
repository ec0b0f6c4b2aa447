"""MultiAppRunner: run N applications as one flow where each whole app is
a single action and dependencies between apps become label edges
(MultiAppRunner.scala:32-71).

Configuration mirrors the reference keys:

* ``spark.waimak.apprunner.apps`` — comma list of app names;
* ``spark.waimak.apprunner.<name>.appName`` — registry key of the app
  (a registry replaces the reference's appClassName reflection);
* ``spark.waimak.apprunner.<name>.dependencies`` — optional comma list.

Each app's environment is parsed from ``spark.waimak.environment.<name>.*``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

from ..dataflow.action import SimpleAction
from .app import SparkApp
from .config import parse_config


@dataclass(frozen=True)
class AllApps:
    apps: Sequence[str]


@dataclass(frozen=True)
class SingleAppConfig:
    appName: str
    dependencies: Sequence[str] = field(default_factory=tuple)


def execute_app(flow, app_fn: Callable, output_label: str,
                dependencies: Sequence[str] = ()):
    """Add one whole application as a flow action: runs when every
    dependency app's output label is present
    (MultiAppRunner.executeApp, :32-40)."""

    def body(_i, c):
        res = app_fn(c.spark)
        # a completed app with no return value still publishes a non-empty
        # marker so dependent apps become runnable (reference returns
        # Some(unit), MultiAppRunner.scala:36-38)
        return [res if res is not None else True]

    return flow.add_action(SimpleAction(list(dependencies), [output_label],
                                        body, name=f"app:{output_label}"))


class MultiAppRunner:
    """Registry-driven runner: ``registry`` maps app names (the
    ``appName`` conf values) to :class:`SparkApp` instances."""

    def __init__(self, registry: dict[str, SparkApp]):
        self.registry = dict(registry)

    def run_all(self, spark) -> None:
        from ..dataflow.spark_flow import SparkFlowContext, Waimak

        ctx = SparkFlowContext(spark)
        all_apps = parse_config(AllApps, ctx, "spark.waimak.apprunner.")
        flow = Waimak.spark_flow(spark)
        for name in all_apps.apps:
            cfg = parse_config(SingleAppConfig, ctx,
                               f"spark.waimak.apprunner.{name}.")
            if cfg.appName not in self.registry:
                raise KeyError(
                    f"App [{cfg.appName}] for [{name}] is not registered; "
                    f"known: {sorted(self.registry)}")
            app = self.registry[cfg.appName]
            flow = execute_app(
                flow,
                lambda s, app=app, name=name: app.run_spark_app(
                    s, f"spark.waimak.environment.{name}."),
                name, cfg.dependencies)
        Waimak.spark_executor().execute(flow)


class EnvironmentManager:
    """Create or clean up an application's environment by name, driven by
    config (EnvironmentManager.scala): reads
    ``spark.waimak.environment.appClassName`` (a registry key here — a
    registry replaces reflection) and ``spark.waimak.environment.action``
    (``create`` | ``cleanup``), then calls the app's
    ``create_env``/``cleanup_env`` with the standard environment prefix."""

    CONF_APP = "spark.waimak.environment.appClassName"
    CONF_ACTION = "spark.waimak.environment.action"
    ENV_PREFIX = "spark.waimak.environment."

    def __init__(self, registry: dict[str, SparkApp]):
        self.registry = dict(registry)

    def perform_env_action(self, spark) -> None:
        from ..dataflow.spark_flow import SparkFlowContext

        ctx = SparkFlowContext(spark)
        app_name = ctx.get_string(self.CONF_APP, "")
        action = ctx.get_string(self.CONF_ACTION, "").lower()
        if app_name not in self.registry:
            raise KeyError(
                f"App [{app_name}] is not registered; known: "
                f"{sorted(self.registry)}")
        app = self.registry[app_name]
        if action == "create":
            app.create_env(spark, self.ENV_PREFIX)
        elif action == "cleanup":
            app.cleanup_env(spark, self.ENV_PREFIX)
        else:
            raise ValueError(
                f"Unsupported environment action [{action}]; expected "
                f"create or cleanup")
