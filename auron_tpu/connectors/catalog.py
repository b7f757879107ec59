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
as ``Authorization: Bearer ...``). Only GET load-table is needed for scans;
multi-level namespaces use the REST unit separator (%1F).
"""

from __future__ import annotations

import json
import urllib.request
from typing import Any, Dict, Optional, Tuple


def _split(uri: str) -> Tuple[str, str, str, str]:
    """rest://host[:port]/[prefix/]ns[/ns2...]/table ->
    (host:port, prefix, namespace, table). Everything between the
    authority (plus optional single prefix segment) and the last segment
    is the (possibly nested) namespace."""
    rest = uri[len("rest://"):]
    hostport, _, path = rest.partition("/")
    parts = [p for p in path.split("/") if p]
    if len(parts) < 2:
        raise ValueError(
            f"bad REST catalog uri {uri!r} (want rest://host/ns/table)")
    table = parts[-1]
    if len(parts) >= 3:
        prefix, ns_parts = parts[0], parts[1:-1]
    else:
        prefix, ns_parts = "", parts[:-1]
    # multi-level namespaces join with the unit separator per the REST spec
    return hostport, prefix, "\x1f".join(ns_parts), table


def load_table(uri: str, timeout: float = 30.0) -> Tuple[str,
                                                         Optional[Dict]]:
    """GET LoadTableResult -> (metadata-location, inline metadata or None).
    """
    from urllib.parse import quote

    from auron_tpu import config
    hostport, prefix, ns, table = _split(uri)
    base = f"http://{hostport}/v1/"
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
