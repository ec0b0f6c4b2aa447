"""Sandbox environments: per-(environment, project, branch) paths and
databases with create/cleanup.

Re-expresses Env.scala:79-205: ``{uri}/data/{environment}/{project}/
{branch}`` (branch dropped for prod) and databases
``{environment}_{project}_{branch}`` — the pattern that lets each Git
branch develop against isolated paths/DBs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional, Sequence


def normalise_name(name: str) -> str:
    return re.sub(r"[^a-z0-9_]", "_", name.lower())


@dataclass(frozen=True)
class BaseEnv:
    """Path sandbox (Env.scala BaseEnv, :79-140)."""

    uri: str
    environment: str
    project: str
    branch: str
    #: WaimakEnv knobs (Env.scala:44-66)
    max_parallel_actions: Optional[int] = None
    error_on_unexecuted_actions: bool = True

    @property
    def normalised_environment(self) -> str:
        return normalise_name(self.environment)

    @property
    def normalised_project(self) -> str:
        return normalise_name(self.project)

    @property
    def normalised_branch(self) -> str:
        return normalise_name(self.branch)

    @property
    def base_path(self) -> str:
        if self.normalised_environment == "prod":
            return f"{self.uri}/data/prod/{self.normalised_project}"
        return (f"{self.uri}/data/{self.normalised_environment}/"
                f"{self.normalised_project}/{self.normalised_branch}")

    @property
    def tmp_dir(self) -> str:
        return f"{self.base_path}/tmp"

    def create(self, spark) -> None:
        from ..filesystem import FileOps

        FileOps(spark).mkdirs(self.base_path)

    def cleanup(self, spark) -> None:
        from ..filesystem import FileOps

        FileOps(spark).delete(self.base_path, recursive=True)


@dataclass(frozen=True)
class HiveEnv(BaseEnv):
    """Path sandbox + databases (Env.scala HiveEnv, :149-205)."""

    base_database_location: str = ""
    extra_dbs: Sequence[str] = field(default_factory=tuple)
    create_base_db: bool = True

    @property
    def base_db_name(self) -> str:
        if self.normalised_environment == "prod":
            return f"prod_{self.normalised_project}"
        return (f"{self.normalised_environment}_{self.normalised_project}_"
                f"{self.normalised_branch}")

    @property
    def all_dbs(self) -> list[str]:
        extras = [f"{self.base_db_name}_{normalise_name(d)}"
                  for d in self.extra_dbs]
        return extras + [self.base_db_name] if self.create_base_db else extras

    def create(self, spark) -> None:
        super().create(spark)
        from ..filesystem import FileOps

        ops = FileOps(spark)
        for db in self.all_dbs:
            location = f"{self.base_database_location}/{db}"
            ops.mkdirs(location)
            spark.sql(f"create database if not exists {db} "
                      f"location '{location}'")

    def cleanup(self, spark) -> None:
        super().cleanup(spark)
        for db in self.all_dbs:
            spark.sql(f"drop database if exists {db} cascade")
