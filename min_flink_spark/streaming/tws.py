"""transformWithStateInPandas (TWS) backend for event-time timers.

Forward path of ``streaming/event_timers.py``: Spark 4's TWS operator
has NATIVE per-key multi-timers (register/delete/list, watermark-fired
in ``eventTime`` mode) and per-state TTL — a one-to-one home for the
reference's ``InternalTimerServiceImpl.java:165-216`` contract, with no
timer bookkeeping in user state.

Environment gate: TWS's Python driver worker speaks a protobuf protocol
(``pyspark/sql/streaming/proto/StateMessage_pb2``); the ``protobuf``
package is NOT installed in this container and installs are disallowed,
so this module import-fails gracefully and the compat backend
(``applyInPandasWithState`` + EventTimeTimeout) carries the registry
query. On a cluster with protobuf present, pass ``backend="tws"`` to
``process_keyed_event_time`` to run this implementation unchanged.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from min_flink_spark.streaming.event_timers import (
    EventTimeProcessFunction,
    TimerContext,
)

__all__ = ["process_keyed_event_time_tws", "tws_available"]


def tws_available() -> bool:
    """True when the TWS Python protocol can actually run here."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


class _LiveTimerContext(TimerContext):
    """TimerContext whose mutations hit the TWS handle directly (native
    timer service) instead of a state-carried set."""

    def __init__(self, handle, timer_values):
        super().__init__(
            timer_values.getCurrentWatermarkInMs(),
            timer_values.getCurrentProcessingTimeInMs(),
            set(),
        )
        self._handle = handle

    def register_timer(self, ts_ms: int) -> None:
        self._handle.registerTimer(int(ts_ms))

    def delete_timer(self, ts_ms: int) -> None:
        self._handle.deleteTimer(int(ts_ms))

    def timers(self) -> list[int]:
        return sorted(
            t[0] if isinstance(t, tuple) else t for t in self._handle.listTimers()
        )


def _make_processor(fn: EventTimeProcessFunction):
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Adapter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState(
                "state", fn.state_schema, ttlDurationMs=fn.ttl_ms
            )

        def _apply(self, result):
            out, new_state = result
            if new_state is None:
                self._state.clear()
            else:
                self._state.update(tuple(new_state))
            if out is not None and len(out):
                yield out

        def handleInputRows(self, key, rows, timerValues):
            chunks = list(rows)
            batch = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
            prior = self._state.get()
            ctx = _LiveTimerContext(self._handle, timerValues)
            yield from self._apply(
                fn.process_element(
                    tuple(key), batch, tuple(prior) if prior is not None else None, ctx
                )
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            prior = self._state.get()
            ctx = _LiveTimerContext(self._handle, timerValues)
            yield from self._apply(
                fn.on_timer(
                    tuple(key),
                    tuple(prior) if prior is not None else None,
                    ctx,
                    expiredTimerInfo.getExpiryTimeInMs(),
                )
            )

        def close(self) -> None:
            pass

    return _Adapter()


def process_keyed_event_time_tws(
    df: DataFrame,
    keys: list[str],
    fn: EventTimeProcessFunction,
    output_mode: str = "update",
    time_mode: str = "eventTime",
) -> DataFrame:
    """TWS wiring — see ``event_timers.process_keyed_event_time`` for
    the user contract."""
    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(pyspark TWS state protocol); use backend='compat'"
        )
    return df.groupBy(*keys).transformWithStateInPandas(
        statefulProcessor=_make_processor(fn),
        outputStructType=fn.output_schema,
        outputMode=output_mode,
        timeMode=time_mode,
    )
