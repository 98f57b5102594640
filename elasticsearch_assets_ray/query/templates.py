"""ES search templates and (filtered) index aliases.

- ``render_template`` / :class:`TemplateStore` — the ``_scripts`` +
  ``_search/template`` surface: mustache-style ``{{param}}``
  substitution into a stored query source (the reference passes
  templated query bodies straight to ES; here the rendered string feeds
  the native parser).
- :class:`AliasStore` — named views over indexes, optionally with a
  FILTER query (ES filtered aliases): every search/count through the
  alias is silently restricted to the filter's match set in FILTER
  CONTEXT — hit scores are the raw query's scores, unchanged (filters
  never contribute to BM25), which is exactly ES semantics and what
  ``search_filtered_by`` implements shard-locally.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

_VAR_RE = re.compile(r"\{\{\s*([A-Za-z0-9_.]+)\s*\}\}")


def render_template(source: str, params: dict[str, Any]) -> str:
    """Substitute every ``{{name}}`` with ``params[name]`` (stringified).
    Unknown names raise (ES renders missing mustache params as empty
    string, which silently corrupts queries — failing loudly is the
    deliberate divergence, documented here)."""

    def sub(m: re.Match) -> str:
        name = m.group(1)
        if name not in params:
            raise KeyError(f"template parameter {name!r} not provided")
        return str(params[name])

    return _VAR_RE.sub(sub, source)


class TemplateStore:
    """Stored search templates (`PUT _scripts/<id>` analog)."""

    def __init__(self) -> None:
        self._sources: dict[str, str] = {}

    def put(self, template_id: str, source: str) -> None:
        self._sources[template_id] = source

    def get(self, template_id: str) -> str:
        return self._sources[template_id]

    def render(self, template_id: str, params: dict[str, Any]) -> str:
        return render_template(self._sources[template_id], params)

    def search(self, searcher, template_id: str, params: dict[str, Any], k: int = 10):
        """``GET _search/template``: render, then serve through the given
        (single or sharded) searcher."""
        return searcher.search(self.render(template_id, params), k=k)


@dataclass(frozen=True)
class Alias:
    searcher: Any  # Searcher | ShardedSearcher
    filter: str | None = None


class AliasStore:
    """Named (optionally filtered) index views (`_aliases` analog)."""

    def __init__(self) -> None:
        self._aliases: dict[str, Alias] = {}

    def put(self, name: str, searcher, filter: str | None = None) -> None:
        self._aliases[name] = Alias(searcher, filter)

    def resolve(self, name: str) -> Alias:
        return self._aliases[name]

    def search(self, name: str, query: str, k: int = 10):
        a = self.resolve(name)
        if a.filter is None:
            return a.searcher.search(query, k=k)
        return a.searcher.search_filtered_by(query, a.filter, k=k)

    def count(self, name: str, query: str) -> int:
        a = self.resolve(name)
        if a.filter is None:
            return int(a.searcher.count(query))
        return int(a.searcher.count_filtered_by(query, a.filter))
