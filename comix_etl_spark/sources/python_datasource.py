"""S1/S4/S5 — the REST page source as a REGISTERED Spark data source
(PySpark 4 Python DataSource V2 API), the idiomatic-modern sibling of
``rest_source.paginated_read``'s mapInPandas form.

Registering makes the source a first-class read format:

    register(spark)
    df = (spark.read.format("comix_rest_pages")
          .option("url", "https://example.invalid/comics")
          .option("total", "500").option("page_size", "100")
          .option("fetcher", "fake_marvel").load())

Why this shape at 100 TB ingest:
- ``partitions()`` carves the offset grid into ``max_concurrency``
  contiguous page ranges — the planner creates exactly that many tasks,
  so parallelism against a rate-limited partner API is a READ-TIME
  contract, not an afterthought repartition (same cap rest_source.py
  enforces, now visible to the planner).
- each task builds its own fetcher inside ``read()`` (connections are
  per-executor, never pickled) with the same retry/backoff wrapper (S4).
- the streaming variant (``comix_rest_stream``) is the S5 incremental
  refetch as a true Structured Streaming source: the offset the engine
  checkpoints IS the page cursor, so restart-resume and exactly-once
  landing come from the checkpoint machinery instead of a hand-rolled
  bronze-layer anti-join.

Fetchers are resolved BY NAME from ``FETCHERS`` (executor-side), because
data source options are strings; register real fetchers (requests +
HMAC auth) under new names — the engine itself stays network-free.

Reference parity: etl/sources/marvel_extract.py:61-130 (offset loop),
etl/seed/seed_from_marvel.py:58-178 (page cache/backoff) — same records,
distributed read path.
"""

from __future__ import annotations

import json
import math
from collections.abc import Callable, Iterator, Sequence

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)
from pyspark.sql.types import StructType

# name -> factory(options) -> Fetcher; executor-side resolution so the
# fetcher (and any connection state) is never pickled through the plan
FETCHERS: dict[str, Callable[[dict], Callable[[str, dict], list[dict]]]] = {}


def _fake_marvel(options: dict) -> Callable[[str, dict], list[dict]]:
    from comix_etl_spark.sources.rest_source import (fake_marvel_fetcher,
                                                     retrying)

    return retrying(
        fake_marvel_fetcher(int(options.get("total", 500))),
        sleep=lambda _s: None)


FETCHERS["fake_marvel"] = _fake_marvel

_SCHEMA = "offset long, payload string"


class _PageRange(InputPartition):
    def __init__(self, first_page: int, last_page: int):
        self.first_page = first_page
        self.last_page = last_page  # inclusive


class RestPagesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self.url = options.get("url", "https://example.invalid/")
        self.total = int(options.get("total", 500))
        self.page_size = int(options.get("page_size", 100))
        self.max_concurrency = int(options.get("max_concurrency", 8))
        self.fetcher_name = options.get("fetcher", "fake_marvel")
        if self.fetcher_name not in FETCHERS:
            raise ValueError(f"unknown fetcher {self.fetcher_name!r}; "
                             f"registered: {sorted(FETCHERS)}")

    def partitions(self) -> Sequence[InputPartition]:
        n_pages = max(math.ceil(self.total / self.page_size), 1)
        k = min(self.max_concurrency, n_pages)
        per = math.ceil(n_pages / k)
        return [_PageRange(i * per, min((i + 1) * per, n_pages) - 1)
                for i in range(k) if i * per < n_pages]

    def read(self, partition: _PageRange) -> Iterator[tuple]:
        fetch = FETCHERS[self.fetcher_name](self.options)
        for page in range(partition.first_page, partition.last_page + 1):
            offset = page * self.page_size
            expected = min(self.page_size, self.total - offset)
            params = {"offset": offset, "limit": int(expected)}
            recs = fetch(self.url, params)
            # fail LOUD on a short page: an API that caps limit below
            # page_size (the real Marvel API clamps at 100) would
            # otherwise silently drop the tail of every page and the
            # read would "succeed" with a fraction of the records
            if len(recs) < expected:
                raise ValueError(
                    f"short page at offset {offset}: got {len(recs)} of "
                    f"{expected} records — the fetcher caps 'limit' below "
                    f"page_size; lower page_size to the API's cap")
            for rec in recs:
                yield offset, json.dumps(rec, sort_keys=True)


class RestPagesDataSource(DataSource):
    """Batch: ``spark.read.format("comix_rest_pages")``."""

    @classmethod
    def name(cls) -> str:
        return "comix_rest_pages"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema: StructType) -> RestPagesReader:
        return RestPagesReader(self.options)


class RestPagesStreamReader(SimpleDataSourceStreamReader):
    """Streaming: the page cursor IS the checkpointed offset — S5's
    incremental refetch without a hand-rolled cache. Each micro-batch
    advances at most ``pages_per_batch`` pages; when the grid is
    exhausted the source reports no new data (an availableNow run
    terminates; a continuous run polls for catalog growth via
    ``total`` re-reads in a real fetcher)."""

    def __init__(self, options: dict):
        self.options = dict(options)
        self.url = options.get("url", "https://example.invalid/")
        self.total = int(options.get("total", 500))
        self.page_size = int(options.get("page_size", 100))
        self.pages_per_batch = int(options.get("pages_per_batch", 1))
        self.fetcher_name = options.get("fetcher", "fake_marvel")
        # same fail-fast contract as the batch reader: a typo'd fetcher
        # must be a clear ValueError at stream construction, not a
        # KeyError inside the runner on the first micro-batch
        if self.fetcher_name not in FETCHERS:
            raise ValueError(f"unknown fetcher {self.fetcher_name!r}; "
                             f"registered: {sorted(FETCHERS)}")

    def initialOffset(self) -> dict:
        return {"page": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        first = int(start["page"])
        n_pages = max(math.ceil(self.total / self.page_size), 1)
        last = min(first + self.pages_per_batch, n_pages)  # exclusive
        end = {"page": last}
        return iter(self._rows(first, last)), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # replay for recovery: deterministic fetch over the page range
        return iter(self._rows(int(start["page"]), int(end["page"])))

    def _rows(self, first: int, last: int) -> list[tuple]:
        fetch = FETCHERS[self.fetcher_name](self.options)
        out = []
        for page in range(first, last):
            offset = page * self.page_size
            expected = min(self.page_size, self.total - offset)
            recs = fetch(self.url, {"offset": offset,
                                    "limit": int(expected)})
            # same short-page guard as the batch reader: silence here
            # would checkpoint PAST records that were never fetched
            if len(recs) < expected:
                raise ValueError(
                    f"short page at offset {offset}: got {len(recs)} of "
                    f"{expected} records — lower page_size to the API's "
                    "cap")
            for rec in recs:
                out.append((offset, json.dumps(rec, sort_keys=True)))
        return out


class RestStreamDataSource(DataSource):
    """``spark.readStream.format("comix_rest_stream")``."""

    @classmethod
    def name(cls) -> str:
        return "comix_rest_stream"

    def schema(self) -> str:
        return _SCHEMA

    def simpleStreamReader(self, schema: StructType) -> RestPagesStreamReader:
        return RestPagesStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register both formats on the session."""
    spark.dataSource.register(RestPagesDataSource)
    spark.dataSource.register(RestStreamDataSource)
