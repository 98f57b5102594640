"""Spaces reader surface (S3/S5) — the reference's second ReaderClient
backend and its API factory config schema, re-expressed for this engine.

The reference's SpacesReaderClient (packages/.../SpacesReaderClient.ts:
18-400) speaks HTTP to a "Spaces" search endpoint and translates the
query DSL to xLucene (translateSearchQuery:134-262).  This sandbox has no
network, so the deliverables here are the parts with engine-side
substance, mirroring how S3 is documented in SURVEY.md §2.1:

- :class:`SpacesAPIConfig` — the validated config surface of
  ``spaces_reader_api`` (reference asset/src/spaces_reader_api/
  schema.ts:1-81: endpoint, token, timeout, retries, caCert, variables);
- :func:`translate_slice` — the DSL→xLucene printer (Q8): a
  ``ReaderSlice`` becomes the canonical xLucene string the reference
  would send (range → ``field:[lo TO hi}``, wildcard → ``field:ab*``,
  key OR-lists, user query AND-composed);
- :class:`SpacesReaderAPI` — implements the same fetch/count protocol as
  :class:`~elasticsearch_assets_ray.sources.reader_api.ReaderAPI` by
  delegating to a local ``ReaderAPI`` (the ReaderClient-swap extension
  point, reference interfaces.ts:16-70); the HTTP transport hook raises
  with a clear message when invoked without a transport.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from elasticsearch_assets_ray.sources.reader_api import ReaderAPI, ReaderSlice


@dataclass
class SpacesAPIConfig:
    """spaces_reader_api config (reference spaces_reader_api/schema.ts:
    1-81).  Validation mirrors the schema's required/typed fields."""

    endpoint: str
    token: str
    index: str
    timeout_ms: int = 300_000
    retry: int = 3
    ca_certificate: str | None = None
    variables: dict = field(default_factory=dict)
    headers: dict = field(default_factory=dict)

    def __post_init__(self):
        if not self.endpoint:
            raise ValueError("endpoint is required")
        if not self.token:
            raise ValueError("token is required")
        if not self.index:
            raise ValueError("index is required")
        if self.timeout_ms <= 0:
            raise ValueError("timeout must be positive")
        if self.retry < 0:
            raise ValueError("retry must be >= 0")


def _fmt_date(v) -> str:
    return v.isoformat() if hasattr(v, "isoformat") else str(v)


def translate_slice(
    s: ReaderSlice, *, date_col: str | None = None, key_col: str | None = None
) -> str:
    """ReaderSlice → canonical xLucene query string (the reference's
    translateSearchQuery, SpacesReaderClient.ts:134-262: range clauses
    print as ``field:[lo TO hi}`` — inclusive lower, exclusive upper —
    wildcards as ``field:ab*``, multiple keys as an OR group, and the
    user query AND-composed at the end)."""
    parts: list[str] = []
    if s.start is not None or s.end is not None:
        lo = _fmt_date(s.start) if s.start is not None else "*"
        hi = _fmt_date(s.end) if s.end is not None else "*"
        parts.append(f"{date_col}:[{lo} TO {hi}}}")
    if s.keys:
        if s.keys_exact:
            clauses = [f"{key_col}:{k}" for k in s.keys]
        else:
            clauses = [f"{key_col}:{k}*" for k in s.keys]
        parts.append("(" + " OR ".join(clauses) + ")" if len(clauses) > 1 else clauses[0])
    if s.query:
        parts.append(f"({s.query})")
    return " AND ".join(parts)


class HttpTransport:
    """Stdlib HTTP transport for :class:`SpacesReaderAPI` — the real
    network half of the reference's SpacesReaderClient (retry loop,
    bearer-token auth, timeout: SpacesReaderClient.ts:18-400).

    POSTs ``{"q": <xlucene>, "variables": {...}}`` to
    ``<endpoint>/<index>/_search`` (or ``_count``) with
    ``Authorization: Bearer <token>``.  Retries up to ``config.retry``
    times with exponential backoff on 429/5xx and connection/timeout
    errors; 4xx auth/client errors raise immediately (the reference does
    not retry non-retryable statuses).  Tested against a loopback
    ``http.server`` — no external network."""

    def __init__(self, backoff_s: float = 0.05, sleep=None):
        import time

        self.backoff_s = backoff_s
        self._sleep = sleep or time.sleep
        self.requests_sent = 0
        self.retries = 0

    def _post(self, path: str, xlucene: str, config: SpacesAPIConfig) -> dict:
        import json as _json
        import urllib.error
        import urllib.request

        url = f"{config.endpoint.rstrip('/')}/{config.index}/{path}"
        body = _json.dumps({"q": xlucene, "variables": config.variables}).encode()
        headers = {
            "Authorization": f"Bearer {config.token}",
            "Content-Type": "application/json",
            **config.headers,
        }
        last: Exception | None = None
        for attempt in range(config.retry + 1):
            req = urllib.request.Request(url, data=body, headers=headers)
            self.requests_sent += 1
            try:
                with urllib.request.urlopen(
                    req, timeout=config.timeout_ms / 1000.0
                ) as resp:
                    return _json.loads(resp.read().decode("utf-8"))
            except urllib.error.HTTPError as e:
                if e.code == 429 or 500 <= e.code < 600:
                    last = e  # retryable server-side failure
                else:
                    raise  # auth / client error: never retried
            except (urllib.error.URLError, TimeoutError, OSError) as e:
                last = e
            if attempt < config.retry:
                self.retries += 1
                self._sleep(self.backoff_s * (2**attempt))
        raise last

    def __call__(self, xlucene: str, config: SpacesAPIConfig):
        import pyarrow as pa

        payload = self._post("_search", xlucene, config)
        return pa.Table.from_pylist(payload.get("results", []))

    def count(self, xlucene: str, config: SpacesAPIConfig) -> int:
        return int(self._post("_count", xlucene, config)["count"])


class SpacesReaderAPI:
    """The second ReaderClient backend: same count/fetch protocol as
    ReaderAPI.  ``transport`` is a callable ``(xlucene, config) →
    pa.Table`` — in a deployment it would POST to the Spaces endpoint;
    tests inject a fake; by default the local engine serves the slice
    (proving the protocol swap the reference's interface exists for)."""

    def __init__(
        self,
        config: SpacesAPIConfig,
        *,
        local: ReaderAPI | None = None,
        transport=None,
    ):
        self.config = config
        self._local = local
        self._transport = transport
        self.records_fetched = 0

    def translate(self, s: ReaderSlice) -> str:
        return translate_slice(
            s,
            date_col=self._local.date_col if self._local else "date",
            key_col=self._local.key_col if self._local else "key",
        )

    def count(self, s: ReaderSlice) -> int:
        if self._transport is not None and hasattr(self._transport, "count"):
            return self._transport.count(self.translate(s), self.config)
        if self._local is not None:
            return self._local.count(s)
        raise RuntimeError("no transport and no local backend configured")

    def fetch(self, s: ReaderSlice, **kw):
        xl = self.translate(s)
        if self._transport is not None:
            t = self._transport(xl, self.config)
        elif self._local is not None:
            t = self._local.fetch(s, **kw)
        else:
            raise RuntimeError(
                "SpacesReaderAPI needs a transport (no network in this "
                "environment) or a local ReaderAPI backend"
            )
        try:
            self.records_fetched += t.num_rows
        except AttributeError:
            self.records_fetched += len(t)
        return t
