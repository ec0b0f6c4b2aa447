"""SparkApp / WaimakApp templates (SparkApp.scala:23-90,
WaimakApp.scala:14-23): parse the environment dataclass from conf, apply
the app's default confs, run — Waimak apps build a flow from an empty
SparkDataFlow and execute it with a parallel executor sized by the env."""

from __future__ import annotations

from typing import Generic, Type, TypeVar

from .config import parse_config
from .env import BaseEnv

E = TypeVar("E", bound=BaseEnv)


class SparkApp(Generic[E]):
    """Template: subclass, set ``env_cls``, implement ``run``."""

    env_cls: Type[E] = BaseEnv

    def parse_env(self, spark, env_prefix: str) -> E:
        from ..dataflow.spark_flow import SparkFlowContext

        return parse_config(self.env_cls, SparkFlowContext(spark),
                            prefix=env_prefix)

    def conf_defaults(self, env: E) -> dict[str, str]:
        return {}

    def run_spark_app(self, spark, env_prefix: str) -> None:
        env = self.parse_env(spark, env_prefix)
        self._run_with_env(env, spark)

    def _run_with_env(self, env: E, spark) -> None:
        # defaults first, then any user-set values for the same keys win
        # (SparkApp.scala:37-41)
        defaults = self.conf_defaults(env)
        merged = dict(defaults)
        for k in defaults:
            existing = spark.conf.get(k, None)
            if existing is not None:
                merged[k] = existing
        for k, v in merged.items():
            spark.conf.set(k, v)
        self.run(spark, env)

    def create_env(self, spark, env_prefix: str) -> None:
        self.parse_env(spark, env_prefix).create(spark)

    def cleanup_env(self, spark, env_prefix: str) -> None:
        self.parse_env(spark, env_prefix).cleanup(spark)

    def run(self, spark, env: E) -> None:
        raise NotImplementedError


class WaimakApp(SparkApp[E]):
    """A SparkApp whose body is a dataflow (WaimakApp.scala:14-23)."""

    def run(self, spark, env: E) -> None:
        from ..dataflow.spark_flow import Waimak

        executor = (Waimak.spark_executor(env.max_parallel_actions)
                    if env.max_parallel_actions else Waimak.spark_executor())
        empty = Waimak.spark_flow(spark, env.tmp_dir)
        executor.execute(
            self.flow(empty, env),
            error_on_unexecuted=env.error_on_unexecuted_actions)

    def flow(self, empty_flow, env: E):
        raise NotImplementedError
