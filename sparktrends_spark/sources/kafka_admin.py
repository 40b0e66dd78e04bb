"""Kafka topic administration (reference parity:
apache_kafka/utilities.py:49-84).

The reference creates its topics with a KafkaAdminClient — 3
partitions, RF 1 — then polls ``list_topics`` until they are visible,
treating TopicAlreadyExists as success. Same capability here, with the
admin client injected so the logic is testable without a broker (none
exists in the build container) and driver-library-agnostic in
deployment (kafka-python, confluent-kafka admin — anything with
``create_topics``/``list_topics``/``close``).

Partition count is the scale knob: a topic's partition count bounds
the parallelism of every Spark stage that reads it (one task per
topic-partition), so at 100 TB-scale feeds the count should be sized
to the executor fleet, not the reference's fixed 3.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass


@dataclass(frozen=True)
class TopicSpec:
    """What the reference passes as kafka.admin.NewTopic."""

    name: str
    num_partitions: int = 3
    replication_factor: int = 1


class TopicsNotVisibleError(TimeoutError):
    def __init__(self, missing: Sequence[str], timeout: float):
        super().__init__(f"topics {list(missing)} not visible after {timeout}s")
        self.missing = list(missing)


class KafkaPythonAdminAdapter:
    """Adapts kafka-python's ``KafkaAdminClient`` to the injected-admin
    protocol: converts ``TopicSpec`` -> ``kafka.admin.NewTopic`` on
    create (kafka-python accesses ``.name``/``.num_partitions``/
    ``.replication_factor`` but also internal NewTopic attrs, so a bare
    dataclass would AttributeError on first real use) and normalizes
    ``list_topics`` to a plain ``list[str]``.

    ``new_topic_cls`` is injectable so the conversion is unit-testable
    in containers without kafka-python installed.
    """

    def __init__(self, client, new_topic_cls=None):
        self._client = client
        self._new_topic_cls = new_topic_cls

    def _to_new_topic(self, spec):
        if not isinstance(spec, TopicSpec):
            return spec  # already a NewTopic (or caller-provided)
        cls = self._new_topic_cls
        if cls is None:
            from kafka.admin import NewTopic  # import-try: not in container

            cls = NewTopic
        return cls(
            name=spec.name,
            num_partitions=spec.num_partitions,
            replication_factor=spec.replication_factor,
        )

    def create_topics(self, new_topics, validate_only: bool = False):
        return self._client.create_topics(
            new_topics=[self._to_new_topic(t) for t in new_topics],
            validate_only=validate_only,
        )

    def list_topics(self) -> list[str]:
        return [str(t) for t in self._client.list_topics()]

    def close(self) -> None:
        self._client.close()


def _default_admin_factory(bootstrap_servers: str):
    from kafka.admin import KafkaAdminClient  # import-try: not in container

    return KafkaPythonAdminAdapter(
        KafkaAdminClient(bootstrap_servers=bootstrap_servers)
    )


def ensure_topics(
    topics: Sequence[TopicSpec],
    bootstrap_servers: str = "",
    admin_factory: Callable[[str], object] | None = None,
    timeout: float = 45.0,
    interval: float = 5.0,
    sleep: Callable[[float], None] = time.sleep,
    clock: Callable[[], float] = time.monotonic,
) -> list[str]:
    """Create ``topics`` if absent and wait until all are visible.

    Idempotent: already-existing topics (the reference's
    TopicAlreadyExistsError path) are success, whether reported as an
    exception or per-topic. Returns the list of topic names confirmed
    visible. ``sleep``/``clock`` injected for deterministic tests.
    """
    factory = admin_factory or _default_admin_factory
    admin = factory(bootstrap_servers)
    names = [t.name for t in topics]
    try:
        try:
            admin.create_topics(new_topics=list(topics), validate_only=False)
        except Exception as exc:  # noqa: BLE001 - only "exists" is benign
            if "exist" not in str(exc).lower() and type(exc).__name__ not in (
                "TopicAlreadyExistsError",
            ):
                raise
        deadline = clock() + timeout
        while True:
            active = set(admin.list_topics())
            missing = [n for n in names if n not in active]
            if not missing:
                return names
            if clock() > deadline:
                raise TopicsNotVisibleError(missing, timeout)
            sleep(interval)
    finally:
        admin.close()
