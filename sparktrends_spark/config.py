"""Config-file-driven deployment (reference parity: spark/init_config.py).

The reference generates a ``config.yml`` from environment variables
(spark/init_config.py:17-39 — jdbc url, spark master/app_name, window
params, kafka bootstrap) and every job loads it
(spark/utilities.py:17-26). The engine's primary path is code-first
(session.get_spark), but deployments that standardize on a config file
get the same capability here:

- ``render_config``/``write_config`` produce the config dict/file from
  the environment (the init_config.py role), with ``${VAR}`` expansion
  so secrets stay in the environment, not the file.
- ``load_config`` reads YAML (via import-try) or JSON and returns an
  ``EngineConfig``.
- ``spark_from_config`` builds the SparkSession from the ``spark:``
  section through the same factory as the code-first path, so config
  deployments inherit the scale defaults (AQE, UTC, shuffle sizing).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

from pyspark.sql import SparkSession

from sparktrends_spark.session import DEFAULT_SHUFFLE_PARTITIONS, get_spark

_ENV_REF = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def _expand_env(value: Any) -> Any:
    """Recursively expand ``${VAR}`` references from the environment.

    Missing variables raise (a half-expanded JDBC URL failing at
    connect time is much harder to diagnose than failing at load)."""
    if isinstance(value, str):

        def sub(m: re.Match) -> str:
            var = m.group(1)
            if var not in os.environ:
                raise KeyError(f"config references unset env var ${{{var}}}")
            return os.environ[var]

        return _ENV_REF.sub(sub, value)
    if isinstance(value, dict):
        return {k: _expand_env(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_expand_env(v) for v in value]
    return value


class EngineConfig:
    """Typed view of the reference's config.yml sections.

    ``${VAR}`` expansion is **lazy, per accessed section**: loading a
    config never demands secrets that the sections you actually use
    don't reference (e.g. a Kafka-only job loads fine with
    ``${SPARKTRENDS_JDBC_URL}`` unset). A missing variable still fails
    loudly — with the section name — the first time that section is
    read, which is before any connection attempt.
    """

    _SECTIONS = ("spark", "jdbc", "kafka", "window", "extra")

    def __init__(
        self,
        spark: dict[str, Any] | None = None,
        jdbc: dict[str, Any] | None = None,
        kafka: dict[str, Any] | None = None,
        window: dict[str, Any] | None = None,
        extra: dict[str, Any] | None = None,
        expand_env: bool = False,
    ):
        self._raw: dict[str, dict[str, Any]] = {
            "spark": dict(spark or {}),
            "jdbc": dict(jdbc or {}),
            "kafka": dict(kafka or {}),
            "window": dict(window or {}),
            "extra": dict(extra or {}),
        }
        self._expand_env = expand_env
        self._expanded: dict[str, dict[str, Any]] = {}

    def _section(self, name: str) -> dict[str, Any]:
        if name not in self._expanded:
            raw = self._raw[name]
            if self._expand_env:
                try:
                    raw = _expand_env(raw)
                except KeyError as exc:
                    raise KeyError(
                        f"config section {name!r}: {exc.args[0]}"
                    ) from exc
            self._expanded[name] = raw
        return self._expanded[name]

    spark = property(lambda self: self._section("spark"))
    jdbc = property(lambda self: self._section("jdbc"))
    kafka = property(lambda self: self._section("kafka"))
    window = property(lambda self: self._section("window"))
    extra = property(lambda self: self._section("extra"))

    @classmethod
    def from_dict(
        cls, raw: dict[str, Any], expand_env: bool = False
    ) -> "EngineConfig":
        known = {k: dict(raw.get(k) or {}) for k in ("spark", "jdbc", "kafka", "window")}
        extra = {k: v for k, v in raw.items() if k not in known}
        return cls(**known, extra=extra, expand_env=expand_env)


def render_config(
    jdbc_url: str = "${SPARKTRENDS_JDBC_URL}",
    master: str | None = None,
    app_name: str = "sparktrends_spark",
    kafka_bootstrap: str = "${SPARKTRENDS_KAFKA_BROKER}",
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    window_params: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """The init_config.py template, engine-shaped.

    Unlike the reference (which interpolates POSTGRES_* secrets into
    the file at generation time, spark/init_config.py:19), credentials
    stay as ``${VAR}`` references resolved at load."""
    return {
        "spark": {
            "master": master,  # None -> session.default_master()
            "app_name": app_name,
            "shuffle_partitions": shuffle_partitions,
        },
        "jdbc": {
            "url": jdbc_url,
            "driver": "org.postgresql.Driver",
        },
        "kafka": {"kafka_bootstrap_servers": kafka_bootstrap},
        "window": dict(
            window_params or {"weekly_volatility": 7, "horizon_days": 1}
        ),
    }


def write_config(path: str, config: dict[str, Any] | None = None) -> str:
    """Write the config file (YAML if available and requested by the
    extension, else JSON)."""
    config = config if config is not None else render_config()
    if path.endswith((".yml", ".yaml")):
        import yaml  # stdlib-adjacent; present in deployment images

        with open(path, "w") as fh:
            yaml.safe_dump(config, fh, default_flow_style=False)
    else:
        with open(path, "w") as fh:
            json.dump(config, fh, indent=2)
    return path


def load_config(path: str, expand_env: bool = True) -> EngineConfig:
    if path.endswith((".yml", ".yaml")):
        import yaml

        with open(path) as fh:
            raw = yaml.safe_load(fh) or {}
    else:
        with open(path) as fh:
            raw = json.load(fh)
    return EngineConfig.from_dict(raw, expand_env=expand_env)


def spark_from_config(cfg: EngineConfig | str) -> SparkSession:
    """Build the session from a config (path or loaded) through the
    standard factory — config deployments get identical scale defaults
    to code-first ones (the reference's utilities.py:17-26 role)."""
    if isinstance(cfg, str):
        cfg = load_config(cfg)
    section = cfg.spark
    return get_spark(
        app_name=section.get("app_name", "sparktrends_spark"),
        master=section.get("master") or None,
        shuffle_partitions=section.get("shuffle_partitions"),
        extra_conf=section.get("conf"),
    )
