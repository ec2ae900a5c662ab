"""Property tests (hypothesis) for the executor-side kernel — pure
Python, no JVM: retry/error/timing semantics must hold for arbitrary
policies and exception sequences, and the batched kernel must agree
with the per-item kernel wherever their semantics overlap."""

from hypothesis import given, settings
from hypothesis import strategies as st

from smartpipeline_spark.errors import ErrorManager, RetryManager, StagePolicy
from smartpipeline_spark.item import Item
from smartpipeline_spark.stage import BatchStage, Stage
from smartpipeline_spark.wrapper import run_stage_on_batch, run_stage_on_item


class Err1(Exception):
    pass


class Err2(Exception):
    pass


class ScriptedStage(Stage):
    """Raises exc_class for the first `fail_times` calls per item."""

    def __init__(self, exc_class=None, fail_times=10**9):
        self._exc = exc_class
        self._fail_times = fail_times
        self._calls = {}

    def process(self, item):
        c = self._calls.get(id(item), 0)
        self._calls[id(item)] = c + 1
        if self._exc is not None and c < self._fail_times:
            raise self._exc("scripted")
        item.data["done"] = True
        return item


@settings(max_examples=60, deadline=None)
@given(
    max_retries=st.integers(min_value=0, max_value=4),
    exc=st.sampled_from([None, Err1, Err2]),
    retryable=st.sampled_from([(), (Err1,), (Err1, Err2)]),
    fail_times=st.integers(min_value=0, max_value=6),
)
def test_retry_error_invariants(max_retries, exc, retryable, fail_times):
    stage = ScriptedStage(exc, fail_times)
    policy = StagePolicy("s", RetryManager(retryable, max_retries, 0.0))
    item = Item({"x": 1})
    run_stage_on_item(stage, policy, item, ErrorManager())

    is_retryable = exc is not None and issubclass(exc, retryable)
    if exc is None or fail_times == 0:
        # clean success: no errors, stage ran
        assert not item.error_entries and item.data.get("done")
    elif is_retryable:
        attempts_allowed = max_retries + 1
        if fail_times >= attempts_allowed:
            # exhausted: one RetryError per attempt, all soft
            assert len(item.soft_errors()) == attempts_allowed
            assert not item.has_critical_errors()
            assert not item.data.get("done")
        else:
            # recovered within budget: NO errors attach (reference
            # runners.py:33-67 — only exhaustion attaches RetryErrors)
            assert not item.error_entries
            assert item.data.get("done")
    else:
        # non-retryable: exactly one critical, no retries
        assert len(item.critical_errors()) == 1
        assert not item.soft_errors()
    # timing always recorded
    assert item.get_timing("s") is not None


class ScriptedBatch(BatchStage):
    def __init__(self, poison_key=None, size=5):
        super().__init__(size=size)
        self._poison = poison_key

    def process_batch(self, items):
        if any(it.data["k"] == self._poison for it in items):
            raise ValueError("poison")
        for it in items:
            it.data["done"] = True
        return items


@settings(max_examples=40, deadline=None)
@given(
    n_items=st.integers(min_value=1, max_value=23),
    size=st.integers(min_value=1, max_value=9),
    poison=st.integers(min_value=-1, max_value=25),
    isolate=st.booleans(),
)
def test_batch_kernel_invariants(n_items, size, poison, isolate):
    stage = ScriptedBatch(poison_key=poison, size=size)
    items = [Item({"k": i}) for i in range(n_items)]
    out = run_stage_on_batch(
        stage, StagePolicy("b", RetryManager()), items, ErrorManager(), isolate
    )
    # set-completeness: every item comes out exactly once, order kept
    assert [it.data["k"] for it in out] == list(range(n_items))
    for it in out:
        assert it.get_timing("b") is not None
    poisoned = [it.data["k"] for it in out if it.has_critical_errors()]
    if poison < 0 or poison >= n_items:
        assert poisoned == []
    elif isolate:
        # only the true culprit is poisoned
        assert poisoned == [poison]
    else:
        # reference semantics: the whole chunk containing the culprit
        chunk = poison // size
        assert poisoned == list(range(chunk * size, min((chunk + 1) * size, n_items)))
    clean = [it for it in out if not it.has_critical_errors()]
    assert all(it.data.get("done") for it in clean)
