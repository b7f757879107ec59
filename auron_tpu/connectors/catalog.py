"""Iceberg REST catalog client (catalog services beyond path-based tables).

Reference analog: the reference's Iceberg integration rides Spark's catalog
plumbing (iceberg-core + whatever catalog the session configured); this
module is the native equivalent for the standardized REST catalog API
(`/v1/{prefix}/namespaces/{ns}/tables/{table}` — the `LoadTableResult`
response carries ``metadata-location``). A table URI of the form

    rest://host:port[/prefix]/<namespace>/<table>

resolves through the catalog to the current metadata file, then scans
through the normal connectors/iceberg.py machinery (snapshot selection,
pruning, merge-on-read deletes all apply unchanged).

Auth: a bearer token can be supplied via ``auron.catalog.rest.token`` (sent
as ``Authorization: Bearer ...``). TLS catalogs: use a ``rest+https://``
URI or set ``auron.catalog.rest.scheme=https`` — do this whenever a token
is configured so the credential never travels cleartext. Only GET
load-table is needed for scans; multi-level namespaces use the REST unit
separator (%1F). Nested namespaces with no prefix are ambiguous in the URI
form — set ``auron.catalog.rest.prefix`` (possibly to "") to disambiguate.
"""

from __future__ import annotations

import json
import urllib.request
from typing import Any, Dict, Optional, Tuple


def _split(uri: str) -> Tuple[str, str, str, str, str]:
    """rest[+https]://host[:port]/[prefix/]ns[/ns2...]/table ->
    (scheme, host:port, prefix, namespace, table). Everything between the
    authority (plus optional single prefix segment) and the last segment
    is the (possibly nested) namespace. When auron.catalog.rest.prefix is
    set it wins and no URI segment is consumed as a prefix."""
    from auron_tpu import config
    scheme = config.conf.get("auron.catalog.rest.scheme") or "http"
    for head, forced in (("rest+https://", "https"), ("rest+http://", "http"),
                         ("rest://", None)):
        if uri.startswith(head):
            rest = uri[len(head):]
            if forced:
                scheme = forced
            break
    else:
        raise ValueError(f"not a REST catalog uri: {uri!r}")
    if scheme not in ("http", "https"):
        raise ValueError(f"auron.catalog.rest.scheme={scheme!r} "
                         "(want http or https)")
    hostport, _, path = rest.partition("/")
    parts = [p for p in path.split("/") if p]
    if len(parts) < 2:
        raise ValueError(
            f"bad REST catalog uri {uri!r} (want rest://host/ns/table)")
    table = parts[-1]
    # an EXPLICIT prefix override (even "") disables the positional
    # heuristic, so rest://host/ns1/ns2/table can mean nested-ns-no-prefix
    explicit = "auron.catalog.rest.prefix" in config.conf._overrides
    if explicit:
        prefix, ns_parts = config.conf.get(
            "auron.catalog.rest.prefix"), parts[:-1]
    elif len(parts) >= 3:
        prefix, ns_parts = parts[0], parts[1:-1]
    else:
        prefix, ns_parts = "", parts[:-1]
    # multi-level namespaces join with the unit separator per the REST spec
    return scheme, hostport, prefix, "\x1f".join(ns_parts), table


def load_table(uri: str, timeout: float = 30.0) -> Tuple[str,
                                                         Optional[Dict]]:
    """GET LoadTableResult -> (metadata-location, inline metadata or None).
    """
    from urllib.parse import quote

    from auron_tpu import config
    scheme, hostport, prefix, ns, table = _split(uri)
    base = f"{scheme}://{hostport}/v1/"
    if prefix:
        base += quote(prefix, safe="") + "/"
    url = base + f"namespaces/{quote(ns, safe='')}/tables/" \
        + quote(table, safe="")
    req = urllib.request.Request(url)
    token = config.conf.get("auron.catalog.rest.token")
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        body = json.load(r)
    loc = body.get("metadata-location")
    if not loc:
        raise ValueError(f"REST catalog {url} returned no metadata-location")
    if loc.startswith("file://"):
        loc = loc[len("file://"):]
    return loc, body.get("metadata")
