"""Progress / row-count telemetry (SURVEY.md §2 A17, Porter.php:211-225).

The reference prints per-table progress lines from its row loop
(``processed/total (pct) ETA``).  A Spark engine must not count rows
driver-side, so the rebuild uses the public ``DataFrame.observe`` API:
an :class:`~pyspark.sql.Observation` rides the write action itself —
the row count is collected by accumulator during the sink job, with NO
extra pass over the data (a ``df.count()`` before writing would double
the scan; per-row callbacks don't exist in a distributed plan).

Cluster-level progress (stages, tasks, shuffle volumes) remains
delegated to the Spark UI / history server, per SURVEY §2 A17; this
module covers the reference-parity slice: per-destination-table row
throughput lines.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


@dataclass(frozen=True)
class TableProgress:
    table: str
    rows: int
    seconds: float
    rows_per_sec: float

    def line(self) -> str:
        """Reference-shaped progress line (Porter.php:222-225)."""
        return (
            f" * {self.table}: {self.rows} rows in {self.seconds:.1f}s "
            f"({self.rows_per_sec:.0f} rows/s)"
        )


class ProgressReporter:
    """Per-table write telemetry.

    Usage::

        reporter = ProgressReporter()
        df = reporter.wrap("docs", df)     # before the sink action
        sink("docs", df)                   # any action (write/foreach)
        progress = reporter.finish("docs") # after: rows + throughput

    ``emit`` receives each finished :class:`TableProgress` line (default:
    stdout, like the reference's console progress).
    """

    def __init__(self, emit=print, clock=time.time):
        self._emit = emit
        self._clock = clock
        self._pending: dict[str, tuple[Observation, float]] = {}
        self.finished: dict[str, TableProgress] = {}

    def wrap(self, table: str, df: DataFrame) -> DataFrame:
        obs = Observation(f"porter_{table}_{uuid.uuid4().hex[:8]}")
        self._pending[table] = (obs, self._clock())
        return df.observe(obs, F.count(F.lit(1)).alias("rows"))

    def finish(self, table: str) -> TableProgress:
        obs, t0 = self._pending.pop(table)
        seconds = max(self._clock() - t0, 1e-9)
        rows = int(obs.get["rows"])
        progress = TableProgress(table, rows, seconds, rows / seconds)
        self.finished[table] = progress
        if self._emit:
            self._emit(progress.line())
        return progress

    @property
    def total_rows(self) -> int:
        return sum(p.rows for p in self.finished.values())
