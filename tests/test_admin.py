"""S9 Kafka topic admin — unit-tested against a mock client (no broker or
kafka-python in this container; the module is import-guarded)."""

from __future__ import annotations

from unittest.mock import MagicMock

import pytest

from streaming_data_pipeline_capstone_spark.sources import admin


def test_create_topic_calls_client():
    client = MagicMock()
    admin.create_topic("position_history", num_partitions=4, client=client)
    assert client.create_topics.call_count == 1
    (topics,) = client.create_topics.call_args.kwargs.get(
        "new_topics", client.create_topics.call_args.args or ([],)
    )
    # without kafka-python the topic spec is a plain dict
    spec = topics if isinstance(topics, dict) else topics
    if isinstance(spec, dict):
        assert spec["name"] == "position_history"
        assert spec["num_partitions"] == 4


def test_create_topic_idempotent_on_already_exists():
    class TopicAlreadyExistsError(Exception):
        pass

    client = MagicMock()
    client.create_topics.side_effect = TopicAlreadyExistsError("exists")
    admin.create_topic("t", client=client)  # must not raise


def test_create_topic_propagates_other_errors():
    client = MagicMock()
    client.create_topics.side_effect = RuntimeError("broker down")
    with pytest.raises(RuntimeError):
        admin.create_topic("t", client=client)


def test_list_and_exists_and_delete():
    client = MagicMock()
    client.list_topics.return_value = ["b", "a"]
    assert admin.list_topics(client=client) == ["a", "b"]
    assert admin.topic_exists("a", client=client)
    assert not admin.topic_exists("zz", client=client)
    admin.delete_topic("a", client=client)
    client.delete_topics.assert_called_once_with(["a"])


def test_bootstrap_connected_probe():
    up = MagicMock()
    up.list_topics.return_value = []
    assert admin.bootstrap_connected(client=up)
    down = MagicMock()
    down.list_topics.side_effect = ConnectionError()
    assert not admin.bootstrap_connected(client=down)


def test_import_guard_without_kafka():
    if admin.HAVE_KAFKA:  # pragma: no cover - not this container
        pytest.skip("kafka-python installed")
    with pytest.raises(ImportError):
        admin.create_topic("t")  # no client and no kafka-python
