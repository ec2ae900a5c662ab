"""Item semantics contract (reference tests/test_stage.py:35-64)."""

import pytest

from smartpipeline_spark.errors import CriticalError, SoftError
from smartpipeline_spark.item import Item


def test_id_resolution_order():
    assert Item({"id": 7}).id == 7
    it = Item({}, metadata={"id": "m1"})
    assert it.id == "m1"
    it = Item({})
    generated = it.id
    assert isinstance(generated, str) and len(generated) == 32
    assert it.id == generated  # stable once generated


def test_data_and_metadata_are_separate():
    it = Item({"a": 1}, metadata={"b": 2})
    assert it.data == {"a": 1}
    assert it.metadata == {"b": 2}
    it.data["c"] = 3
    assert "c" not in it.metadata


def test_error_channel_type_cross_assignment_rejected():
    it = Item({})
    with pytest.raises(ValueError):
        it.add_soft_error("s", CriticalError("x"))
    with pytest.raises(ValueError):
        it.add_critical_error("s", SoftError("x"))


def test_plain_exception_wrapped_as_soft():
    it = Item({})
    it.add_soft_error("stage1", KeyError("missing"))
    (entry,) = it.soft_errors()
    assert entry["kind"] == "soft"
    assert entry["stage"] == "stage1"
    assert entry["exc_class"] == "KeyError"
    assert not it.has_critical_errors()


def test_critical_errors_tracked():
    it = Item({})
    it.add_critical_error("stage2", ValueError("bad"))
    assert it.has_critical_errors()
    assert it.critical_errors()[0]["exc_class"] == "ValueError"


def test_timings():
    it = Item({})
    it.set_timing("s1", 0.5).set_timing("s2", 1.5)
    assert it.get_timing("s1") == 0.5
    assert sorted(it.timed_stages()) == ["s1", "s2"]


def test_callback():
    seen = []
    it = Item({"x": 1})
    it.set_callback(lambda i: seen.append(i.data["x"]))
    it.callback()
    assert seen == [1]


def test_deprecated_metadata_accessors():
    from smartpipeline_spark.item import Item

    it = Item({"x": 1})
    assert it.set_metadata("origin", "unit") is it
    assert it.get_metadata("origin") == "unit"
    assert it.get_metadata("absent") is None
    assert it.metadata["origin"] == "unit"
