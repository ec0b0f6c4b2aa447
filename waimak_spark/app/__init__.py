"""App orchestration, environment management and typed configuration.

Re-expresses the reference's waimak-app module + configuration package
(SparkApp.scala:23-90, WaimakApp.scala:14-23, Env.scala:79-205,
MultiAppRunner.scala:32-71, CaseClassConfigParser.scala:199-285)
Python-first: dataclasses parsed from Spark conf replace reflective
case-class construction, and a registry replaces class-name reflection in
the multi-app runner.
"""

from .config import (
    ConfigException,
    EnvSecretsPropertyProviderBuilder,
    JavaPropertiesPropertyProvider,
    PropertiesFilePropertyProviderBuilder,
    PropertyProvider,
    PropertyProviderBuilder,
    SecretFilesPropertyProviderBuilder,
    parse_config,
    resolve_property_providers,
    separator,
)
from .env import BaseEnv, HiveEnv
from .app import SparkApp, WaimakApp
from .runner import MultiAppRunner, execute_app

__all__ = [
    "ConfigException", "PropertyProvider", "JavaPropertiesPropertyProvider",
    "PropertyProviderBuilder", "PropertiesFilePropertyProviderBuilder",
    "EnvSecretsPropertyProviderBuilder", "SecretFilesPropertyProviderBuilder",
    "parse_config", "resolve_property_providers", "separator",
    "BaseEnv", "HiveEnv", "SparkApp",
    "WaimakApp", "MultiAppRunner", "execute_app",
]
