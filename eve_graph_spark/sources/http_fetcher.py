"""Real HTTP transport for the fan-out fetcher — stdlib-only.

The reference fetches live ESI / EVE-Scout JSON over reqwest
(reference: src/esi.rs:48-52, src/eve_scout.rs:46-50). `fetch_details`
(esi.py) already carries the full error policy (404-skip, 429-abort,
5xx-retry) against an injected ``Fetcher``; this module supplies the
production transport mapping real HTTP status codes onto that policy:

- 404            -> KeyError            (per-item skip, never retried)
- 420 / 429      -> RateLimitError      (fail the stage fast, sync.rs:323-350)
- 5xx / URLError -> TransientFetchError (retried with backoff by fetch_details)
- other 4xx      -> re-raised HTTPError (a caller bug, not a data condition)

Stdlib ``urllib`` only — no third-party HTTP client exists in the target
runtime, and executor-side imports must not depend on one. The function is
serialized into the mapInPandas closure, so it deliberately holds no
sockets or sessions: one connection per request is the right shape for a
50-partition fan-out where each task issues sparse sequential GETs (the
reference likewise opens per-request connections through its pool).
"""

from __future__ import annotations

import urllib.error
import urllib.request

from eve_graph_spark.sources.esi import Fetcher, RateLimitError, TransientFetchError

DEFAULT_TIMEOUT_SEC = 10.0
DEFAULT_USER_AGENT = "eve-graph-spark/1.0"


def make_http_fetcher(
    url_template: str,
    timeout_sec: float = DEFAULT_TIMEOUT_SEC,
    headers: dict[str, str] | None = None,
) -> Fetcher:
    """Build a ``Fetcher`` issuing real GETs for ``url_template.format(id=i)``.

    Example::

        fetcher = make_http_fetcher(
            "https://esi.evetech.net/latest/universe/systems/{id}/")
        fetch_details(ids_df, fetcher)

    Raises exactly the exception surface `fetch_details` dispatches on; the
    status-code mapping is tested against a live local HTTP server
    (tests/test_http_fetcher.py), not only injected exceptions.
    """
    hdrs = {"User-Agent": DEFAULT_USER_AGENT, "Accept": "application/json"}
    if headers:
        hdrs.update(headers)

    def _fetch(i: int) -> str:
        req = urllib.request.Request(url_template.format(id=int(i)), headers=hdrs)
        try:
            with urllib.request.urlopen(req, timeout=timeout_sec) as resp:
                charset = resp.headers.get_content_charset() or "utf-8"
                return resp.read().decode(charset)
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise KeyError(int(i)) from e
            if e.code in (420, 429):
                raise RateLimitError(f"HTTP {e.code} for id={i}") from e
            if e.code >= 500:
                raise TransientFetchError(f"HTTP {e.code} for id={i}") from e
            raise
        except urllib.error.URLError as e:
            # DNS failure / refused / reset / timeout — all transient.
            raise TransientFetchError(f"{type(e.reason).__name__}: {e.reason}") from e

    return _fetch
