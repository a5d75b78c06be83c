"""Ahead-of-time remote-resource retrieval (driver-side ONLY).

The analogue of the reference's pluggable ``Retrieve`` trait
(``crates/jsonschema/src/retriever.rs``): the reference resolves external
``$ref`` targets through a user-supplied retriever at compile time.  Here
retrieval likewise happens once, on the driver, BEFORE lowering — executors
never see a URL.  The fetched documents feed ``EngineOptions.resources``
(the registry analogue), which ``$ref`` resolution consults.

Usage::

    opts = EngineOptions(resources=fetch_resources([
        "https://example.com/schemas/span.json",
    ]))
    compiled = compile_spec({"$ref": "https://example.com/schemas/span.json"},
                            table_schema, opts)

``fetcher`` is injectable (url -> JSON text) so air-gapped tests and custom
transports (auth headers, artifact stores) plug in without network access —
mirroring the reference's custom-``Retrieve`` surface.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Iterable

from jsonschema_rs_spark.spec import SpecError


def _default_fetcher(url: str, timeout: float) -> str:
    from urllib.request import urlopen

    with urlopen(url, timeout=timeout) as resp:  # noqa: S310 - driver-side,
        # user-supplied URLs, ahead-of-time by design
        return resp.read().decode("utf-8")


def fetch_resources(
    urls: Iterable[str],
    fetcher: Callable[[str], str] | None = None,
    timeout: float = 10.0,
) -> dict[str, Any]:
    """Fetch schema documents for ``EngineOptions.resources``.

    Returns ``{url: parsed_schema}``.  Raises SpecError on fetch or parse
    failure — at COMPILE time, never at validation time (the reference's
    retriever errors surface the same way, wrapped into build errors)."""
    out: dict[str, Any] = {}
    for url in urls:
        try:
            text = (fetcher or (lambda u: _default_fetcher(u, timeout)))(url)
        except Exception as e:
            raise SpecError(f"failed to retrieve $ref resource {url!r}: {e}")
        try:
            out[url] = json.loads(text)
        except ValueError as e:
            raise SpecError(f"resource {url!r} is not valid JSON: {e}")
    return out
