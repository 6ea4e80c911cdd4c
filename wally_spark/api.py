"""Wallaroo-compatible pipeline API, compiled Spark-first.

A user of the reference writes
(`/root/reference/machida/lib/wallaroo/__init__.py:71-173`):

    p = wallaroo.source("app", src)
         .key_by(extract_user)
         .to(wallaroo.range_windows(wallaroo.seconds(9))
             .with_slide(wallaroo.seconds(3)).over(TotalAgg))
         .to_sink(sink)
    wallaroo.build_application("app", p)

The same program runs here, with two differences born of Spark's
engine model:

* Records are DataFrame rows, not opaque pickled objects — a stage
  that changes the record shape declares its output schema (Spark
  plans are typed). Computations may also provide Column expressions
  (``exprs=``) — then the whole stage compiles to built-in functions
  and stays in whole-stage codegen; the row-level Python path runs as
  Arrow-batched ``mapInPandas``.
* ``build_application`` returns an executable plan: ``run_batch``
  (DataFrame → DataFrame) and ``run_stream`` (readStream →
  StreamingQuery) instead of a pipeline-tuple for a Pony runtime.

Aggregation protocol (initial_accumulator/update/combine/output) and
window builders mirror machida/__init__.py:198-214, 762-838. Time
units are nanoseconds like the reference (machida/__init__.py:844).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


class WallyParameterError(Exception):
    pass


# ---------------------------------------------------------------- time units
def nanoseconds(x):
    return int(x)


def microseconds(x):
    return nanoseconds(x) * 1000


def milliseconds(x):
    return microseconds(x) * 1000


def seconds(x):
    return milliseconds(x) * 1000


def minutes(x):
    return seconds(x) * 60


def hours(x):
    return minutes(x) * 60


def _ns_to_spark_interval(ns: int) -> str:
    if ns % 1_000_000 == 0:
        return f"{ns // 1_000_000_000} seconds" if ns % 1_000_000_000 == 0 else f"{ns // 1_000_000} milliseconds"
    return f"{ns // 1000} microseconds"


# ---------------------------------------------------------------- computations
@dataclass
class Computation:
    """Stateless computation. Either ``exprs`` (fast path: dict of
    output column → Column, compiled to a select) or ``fn`` (row →
    row-dict | None, run via mapInPandas with ``schema``)."""

    name: str
    fn: Callable | None = None
    exprs: dict[str, Any] | None = None
    schema: str | None = None  # DDL string, required for fn-path shape changes
    is_multi: bool = False
    is_stateful: bool = False
    state_class: type | None = None


def computation(name: str, exprs: dict[str, Any] | None = None, schema: str | None = None):
    """@computation("name") def f(data) -> dict|None  (None filters)."""

    def deco(fn):
        return Computation(name=name, fn=fn, schema=schema)

    if exprs is not None:
        return Computation(name=name, exprs=exprs)
    return deco


def computation_multi(name: str, schema: str | None = None):
    """@computation_multi("name") def f(data) -> list[dict]."""

    def deco(fn):
        return Computation(name=name, fn=fn, schema=schema, is_multi=True)

    return deco


def state_computation(name: str, state: type, schema: str | None = None):
    """@state_computation("n", State) def f(data, state) -> dict|None."""

    def deco(fn):
        return Computation(
            name=name, fn=fn, schema=schema, is_stateful=True, state_class=state
        )

    return deco


def state_computation_multi(name: str, state: type, schema: str | None = None):
    def deco(fn):
        return Computation(
            name=name,
            fn=fn,
            schema=schema,
            is_stateful=True,
            is_multi=True,
            state_class=state,
        )

    return deco


@dataclass
class KeyExtractor:
    """Key by a column name (fast path — a Catalyst expression) or a
    row-level callable (adds a computed key column via expression-free
    path; prefer column names at scale)."""

    col: str | None = None
    fn: Callable | None = None


def key_extractor(arg):
    if isinstance(arg, str):
        return KeyExtractor(col=arg)
    return KeyExtractor(fn=arg)


# ---------------------------------------------------------------- aggregations
class Aggregation:
    """Reference protocol (machida/__init__.py:198-214): subclasses
    implement initial_accumulator/update/combine/output. Subclasses
    may additionally provide ``spark_agg() -> dict[name, Column]`` to
    unlock the built-in-aggregate fast path (JVM-side, partial
    map-side combine for free)."""

    def name(self):
        return self.__class__.__name__

    def initial_accumulator(self):
        raise NotImplementedError

    def update(self, data, acc):
        raise NotImplementedError

    def combine(self, a, b):
        raise NotImplementedError

    def output(self, key, acc):
        raise NotImplementedError

    # Optional fast path
    def spark_agg(self) -> dict[str, Any] | None:
        return None

    # Schema of the python-path output rows (DDL), e.g. "user string, total double"
    output_schema: str | None = None


def _validate_aggregation(agg):
    for m in ("initial_accumulator", "update", "combine", "output"):
        if not hasattr(agg, m):
            raise WallyParameterError(f"Aggregation must have method '{m}'.")


class LateDataPolicy:
    DROP = "drop"
    FIRE_PER_MESSAGE = "fire_per_message"
    PLACE_IN_OLDEST_WINDOW = "place_in_oldest_window"


@dataclass
class RangeWindows:
    range_ns: int
    slide_ns: int
    delay_ns: int
    aggregation: Aggregation
    late_data_policy: str = LateDataPolicy.DROP


class RangeWindowsBuilder:
    def __init__(self, wrange: int):
        self.range_ns = wrange
        self.slide_ns: int | None = None
        self.delay_ns: int | None = None
        self.late_data_policy = ""

    def with_slide(self, slide: int):
        if self.slide_ns is not None:
            raise WallyParameterError("Only call `with_slide()` once.")
        self.slide_ns = slide
        return self

    def with_delay(self, delay: int):
        if self.delay_ns is not None:
            raise WallyParameterError("Only call `with_delay()` once.")
        self.delay_ns = delay
        return self

    def with_late_data_policy(self, policy: str):
        if self.late_data_policy:
            raise WallyParameterError("Only call `with_late_data_policy()` once.")
        self.late_data_policy = policy
        return self

    def over(self, aggregation_cls) -> RangeWindows:
        agg = aggregation_cls() if isinstance(aggregation_cls, type) else aggregation_cls
        _validate_aggregation(agg)
        return RangeWindows(
            self.range_ns,
            self.slide_ns if self.slide_ns is not None else self.range_ns,
            self.delay_ns if self.delay_ns is not None else 0,
            agg,
            self.late_data_policy or LateDataPolicy.DROP,
        )


@dataclass
class SessionWindows:
    """Inactivity-gap (ephemeral) windows — the reference closes a
    key's window after a quiet period (ephemeral_window.pony). Not a
    public builder in machida's API; exposed here because Spark has a
    native operator for it (F.session_window, batch + streaming)."""

    gap_ns: int
    aggregation: Aggregation


class SessionWindowsBuilder:
    def __init__(self, gap: int):
        self.gap_ns = gap

    def over(self, aggregation_cls) -> SessionWindows:
        agg = aggregation_cls() if isinstance(aggregation_cls, type) else aggregation_cls
        _validate_aggregation(agg)
        if agg.spark_agg() is None:
            raise WallyParameterError(
                "session_windows needs a spark_agg() fast-path Aggregation"
            )
        return SessionWindows(self.gap_ns, agg)


def session_windows(gap: int) -> SessionWindowsBuilder:
    return SessionWindowsBuilder(gap)


@dataclass
class CountWindows:
    count: int
    aggregation: Aggregation


class CountWindowsBuilder:
    def __init__(self, count: int):
        self.count = count

    def over(self, aggregation_cls) -> CountWindows:
        agg = aggregation_cls() if isinstance(aggregation_cls, type) else aggregation_cls
        _validate_aggregation(agg)
        return CountWindows(self.count, agg)


def range_windows(wrange: int) -> RangeWindowsBuilder:
    return RangeWindowsBuilder(wrange)


def count_windows(count: int) -> CountWindowsBuilder:
    return CountWindowsBuilder(count)


# ---------------------------------------------------------------- pipeline
@dataclass
class Pipeline:
    """Immutable stage list; clone-on-extend like the reference
    (machida/__init__.py:90-172)."""

    stages: tuple = field(default_factory=tuple)
    closed: bool = False

    @classmethod
    def from_source(cls, name: str, source_config) -> "Pipeline":
        return cls(stages=(("source", name, source_config),))

    def _extend(self, stage) -> "Pipeline":
        if self.closed:
            raise WallyParameterError("You can't add stages after to_sink/s.")
        closed = stage[0] in ("to_sink", "to_sinks")
        return Pipeline(stages=self.stages + (stage,), closed=closed)

    def to(self, comp) -> "Pipeline":
        if isinstance(comp, RangeWindows):
            return self._extend(("to_range_windows", comp))
        if isinstance(comp, CountWindows):
            return self._extend(("to_count_windows", comp))
        if isinstance(comp, SessionWindows):
            return self._extend(("to_session_windows", comp))
        if isinstance(comp, Computation):
            return self._extend(("to_state" if comp.is_stateful else "to", comp))
        raise WallyParameterError(f"Not a computation: {comp!r}")

    def key_by(self, extractor) -> "Pipeline":
        if isinstance(extractor, str):
            extractor = KeyExtractor(col=extractor)
        if not isinstance(extractor, KeyExtractor):
            raise WallyParameterError("key_by expects a column name or @key_extractor")
        return self._extend(("key_by", extractor))

    def collect(self) -> "Pipeline":
        return self._extend(("collect", None))

    def merge(self, other: "Pipeline") -> "Pipeline":
        return self._extend(("merge", other))

    def to_sink(self, sink_config) -> "Pipeline":
        return self._extend(("to_sink", sink_config))

    def to_sinks(self, sink_configs) -> "Pipeline":
        return self._extend(("to_sinks", tuple(sink_configs)))


def source(name: str, source_config) -> Pipeline:
    return Pipeline.from_source(name, source_config)


class Application:
    """Executable compiled application."""

    def __init__(self, name: str, pipeline: Pipeline):
        self.name = name
        self.pipeline = pipeline

    def run_batch(self, spark, override_sources: dict[str, DataFrame] | None = None) -> DataFrame:
        from wally_spark.plans.compile import compile_batch

        return compile_batch(spark, self.pipeline, override_sources or {})

    def run_stream(self, spark, override_sources: dict[str, DataFrame] | None = None):
        """Returns the sink-configured DataStreamWriter's query."""
        from wally_spark.streaming.compile import compile_stream

        return compile_stream(spark, self.pipeline, override_sources or {})


def build_application(app_name: str, pipeline: Pipeline) -> Application:
    if not pipeline.closed:
        raise WallyParameterError("An application must end with to_sink/s.")
    return Application(app_name, pipeline)
