"""User-authoring surface: Source, Stage, BatchStage.

These are the engine's UDF authoring classes, semantically equivalent
to the reference's (``smartpipeline/stage.py:55-146``, SURVEY.md §2.2-
§2.4, §2.9) but compiled differently: a ``Stage`` chain becomes ONE
``mapInPandas`` over Arrow batches (see ``wrapper.py``), not a chain
of queue-linked threads.

Schema contract: Spark needs static output schemas, the reference is
schemaless. Each stage therefore declares what it adds/changes via
``output_fields`` — a mapping ``column -> Spark DDL type string``
(e.g. ``{"rev": "double"}``). Columns not declared pass through
unchanged. Stages that genuinely invent dynamic keys should write to
the ``_data`` map column (declare ``{"_data": "map<string,string>"}``).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from collections import deque
from typing import Iterator, Optional, Sequence

from smartpipeline_spark.item import Item


class _NamedMixin:
    _name: str | None = None

    def set_name(self, name: str) -> None:
        self._name = name

    @property
    def name(self) -> str:
        return self._name or self.__class__.__name__.lower()

    # lifecycle hooks — run once per Python worker process (executor
    # side), mirroring the reference's per-process on_start/on_end
    # (``stage.py:37-52``; lifetime documented in SURVEY.md §7.3).
    def on_start(self) -> None:  # pragma: no cover - hook point
        pass

    def on_end(self) -> None:  # pragma: no cover - hook point
        pass

    def __repr__(self) -> str:  # pragma: no cover
        return f"{self.__class__.__name__}({self.name})"


class Stage(_NamedMixin, ABC):
    """1→1 enrichment map over items (reference ``stage.py:79-85``).

    ``process`` receives an :class:`Item`, enriches ``item.data``, and
    returns the item. It cannot drop items or emit extra ones — use
    the relational layer (``Pipeline.filter`` etc.) for that.
    """

    #: columns this stage adds or retypes: {name: spark DDL type}
    output_fields: dict[str, str] = {}

    @abstractmethod
    def process(self, item: Item) -> Item: ...


class BatchStage(_NamedMixin, ABC):
    """n→n map over micro-batches (reference ``stage.py:88-116``).

    ``size`` caps the Arrow batch fed to ``process_batch``; ``timeout``
    is the max seconds a *streaming* micro-batch waits to fill (in
    batch mode data is already materialized, so timeout only shapes
    streaming trigger behavior). Use for amortizing model inference or
    external API round-trips.
    """

    output_fields: dict[str, str] = {}

    def __init__(self, size: int, timeout: float = 1.0):
        if size < 1:
            raise ValueError("size must be >= 1")
        if timeout < 0:
            raise ValueError("timeout must be >= 0")
        self._size = int(size)
        self._timeout = float(timeout)

    @property
    def size(self) -> int:
        return self._size

    @property
    def timeout(self) -> float:
        return self._timeout

    @abstractmethod
    def process_batch(self, items: Sequence[Item]) -> Sequence[Item]: ...


class Source(_NamedMixin, ABC):
    """Pull-based custom source (reference ``stage.py:119-146``).

    ``pop`` returns the next :class:`Item`, or ``None`` for "no item
    right now"; the source is exhausted when ``is_stopped`` is set
    (call ``stop()``). Prefer the built-in readers in ``sources/`` —
    a custom Source is driven on the driver then parallelized, so it
    is only for genuinely driver-local item feeds (in-memory lists,
    single files, external cursors).
    """

    def __init__(self):
        self._stopped = False
        self._prepended: deque[Item] = deque()

    @abstractmethod
    def pop(self) -> Optional[Item]: ...

    def stop(self) -> None:
        self._stopped = True

    @property
    def is_stopped(self) -> bool:
        return self._stopped

    def prepend_item(self, item: Item) -> None:
        """Inject an item ahead of the source's own feed (reference
        ``SourceContainer.prepend_item``, containers.py:277-285):
        prepended items come out FIFO among themselves, before anything
        ``pop`` produces, even after the source stopped."""
        self._prepended.append(item)

    def items(self, max_polls_after_none: int | None = None) -> Iterator[Item]:
        """Drain the source: iterate until stop().

        ``None`` from ``pop`` means "no item right now" (reference
        semantics) — we back off 1ms per miss so a waiting source
        doesn't busy-spin, and keep polling until ``stop()`` like the
        reference's pump loop. ``max_polls_after_none`` is an opt-in
        safety valve for callers that want a bounded drain of a source
        that never stops (it raises rather than silently truncating).
        """
        import time as _time

        misses = 0
        while True:
            while self._prepended:
                yield self._prepended.popleft()
            if self.is_stopped:
                break
            item = self.pop()
            if item is None:
                if self.is_stopped:
                    continue  # drain any late prepends, then exit
                misses += 1
                if max_polls_after_none is not None and misses >= max_polls_after_none:
                    raise TimeoutError(
                        f"source {self.name!r} returned None {misses} times "
                        "without stop(); still running"
                    )
                _time.sleep(0.001)
                continue
            misses = 0
            yield item
