"""The lateral-enrichment seam: per-row external fetch as batched
``mapInPandas`` with an injectable fetcher.

The reference downloads each change's tarball inline in the consumer loop
(changes_consumer.py:160-169, one blocking HTTP GET per message; the legacy
mirror used a queue with concurrency 5, mirror.ts:129-146). The Spark-native
shape is: keep the hot path declarative, and push the unavoidable external
I/O into ONE mapInPandas stage that processes Arrow batches — per-executor
connection reuse, batch-level pipelining, and the filter/projection around
it still optimized by Catalyst (size pushdown happens BEFORE the fetch,
like mirror.ts, because the fetch stage is placed after the declared
filters).

The fetcher is injected so tests (and this container, which has no
registry) use a deterministic fake; production passes a real HTTP client
factory. The function contract is bytes-in/record-out, matching F5's
status handling.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

ENRICHED_SCHEMA = "seq long, id string, tarball_url string, status int, content_sha256 string, content_len long"

Fetcher = Callable[[str], tuple[int, bytes | None]]


def fake_fetcher(url: str) -> tuple[int, bytes | None]:
    """Deterministic stand-in for HTTP GET: status/content derived from the
    URL. Replace with a requests/httpx closure in production; the Spark
    plumbing (batching, schema, placement after filters) is identical."""
    h = hashlib.sha256(url.encode()).digest()
    if h[0] % 16 == 0:  # ~6% simulated failures
        return (404 if h[1] % 2 else 500), None
    return 200, h * (1 + h[2] % 5)


def fetch_artifacts(
    changes: DataFrame,
    fetcher_factory: Callable[[], Fetcher] | None = None,
) -> DataFrame:
    """Batched artifact fetch (J2's real lateral path).

    Input needs (seq, id, tarball_url). ``fetcher_factory`` is invoked once
    per Python worker (connection setup amortized over batches); rows fan
    through in Arrow batches. Output carries status for F5 routing and a
    digest instead of the raw bytes — at 100 TB you write blobs straight to
    the artifact store inside the kernel and ship only metadata onward.

    The default fake fetcher is defined INSIDE this function on purpose:
    nested functions cloudpickle by VALUE, so the kernel runs on executors
    that don't have this package on sys.path. A caller-supplied factory
    must itself be worker-importable or dynamically defined.
    """
    if fetcher_factory is None:

        def fetcher_factory():  # same behavior as fake_fetcher, by value
            import hashlib as _hashlib

            def fetch(url: str):
                h = _hashlib.sha256(url.encode()).digest()
                if h[0] % 16 == 0:
                    return (404 if h[1] % 2 else 500), None
                return 200, h * (1 + h[2] % 5)

            return fetch

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetch = fetcher_factory()
        for pdf in batches:
            statuses, shas, lens = [], [], []
            for url in pdf["tarball_url"]:
                status, content = fetch(url) if url else (0, None)
                statuses.append(status)
                shas.append(
                    hashlib.sha256(content).hexdigest() if content is not None else None
                )
                lens.append(len(content) if content is not None else 0)
            yield pd.DataFrame(
                {
                    "seq": pdf["seq"],
                    "id": pdf["id"],
                    "tarball_url": pdf["tarball_url"],
                    "status": statuses,
                    "content_sha256": shas,
                    "content_len": lens,
                }
            )

    return changes.select("seq", "id", "tarball_url").mapInPandas(
        kernel, ENRICHED_SCHEMA
    )


def latest_tarball_urls(parsed: DataFrame) -> DataFrame:
    """(seq, id, tarball_url) for each change's latest version — the URL
    resolution of changes_consumer.py:161-162 as nested-field access."""
    from pyspark.sql import functions as F

    latest = F.col("doc")["dist_tags"]["latest"]
    return parsed.select(
        "seq",
        "id",
        F.element_at(F.col("doc")["versions"], latest)["dist"]["tarball"].alias(
            "tarball_url"
        ),
    )
