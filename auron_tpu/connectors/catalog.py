"""Catalog services beyond path-based tables: Iceberg REST, HMS, Glue.

This module is the dispatcher: ``rest://`` URIs resolve through the
standardized Iceberg REST catalog below; ``hms://`` goes to the thrift
Hive-Metastore client (connectors/hms.py) and ``glue://`` to the SigV4
AWS Glue client (connectors/glue.py). ``describe_table`` normalizes all
three into one shape a Session can register from:

    {"kind": "iceberg"|"files", "format": ..., "paths": [...],
     "metadata_location": ...}

Iceberg tables surface through ANY of the three catalogs (HMS/Glue mark
them with ``table_type=ICEBERG`` + a ``metadata_location`` parameter —
the convention Iceberg's own HiveCatalog/GlueCatalog write); plain hive
parquet/orc tables resolve to their storage-descriptor locations
(+ per-partition locations when partitioned).

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


# ------------------------------------------------- HMS / Glue dispatcher --

def _strip_file(loc: str) -> str:
    return loc[len("file://"):] if loc.startswith("file://") else loc


def _format_of(input_format: str) -> str:
    low = (input_format or "").lower()
    if "parquet" in low:
        return "parquet"
    if "orc" in low:
        return "orc"
    raise ValueError(f"unsupported hive input format {input_format!r} "
                     "(want parquet or orc)")


def describe_table(uri: str, timeout: float = 30.0) -> Dict[str, Any]:
    """Normalize a catalog table reference (rest:// | hms:// | glue://)
    into {"kind", "format", "paths", "metadata_location"}."""
    if uri.startswith(("rest://", "rest+http://", "rest+https://")):
        loc, _meta = load_table(uri, timeout=timeout)
        return {"kind": "iceberg", "metadata_location": loc}
    if uri.startswith("hms://"):
        from auron_tpu.connectors import hms as mod
    elif uri.startswith("glue://"):
        from auron_tpu.connectors import glue as mod
    else:
        raise ValueError(f"unknown catalog scheme in {uri!r} "
                         "(want rest:// | hms:// | glue://)")
    t = mod.load_table(uri, timeout=timeout)
    params = {str(k).lower(): v for k, v in
              (t.get("parameters") or {}).items()}
    if (str(t.get("table_type") or "").upper() == "ICEBERG"
            or str(params.get("table_type", "")).upper() == "ICEBERG"):
        loc = params.get("metadata_location")
        if not loc:
            raise ValueError(f"{uri}: Iceberg table without a "
                             "metadata_location parameter")
        return {"kind": "iceberg",
                "metadata_location": _strip_file(loc)}
    sd = t.get("sd") or {}
    fmt = _format_of(sd.get("input_format"))
    root = _strip_file(sd.get("location") or "")
    paths = [root]
    if t.get("partition_keys"):
        # partitioned hive table: each partition's storage descriptor
        # carries its own location. In the standard warehouse layout every
        # partition dir lives under the table root with key=value names —
        # scanning the ROOT lets hive partitioning discovery turn those
        # back into columns (and prune on them). Out-of-root partition
        # locations (ALTER TABLE ... SET LOCATION per partition) are a
        # declared capability boundary: their values are only recorded in
        # the metastore, not the paths, and the scan layer injects consts
        # from paths only.
        parts = mod.load_partitions(uri, timeout=timeout)
        locs = [_strip_file(p["sd"]["location"]) for p in parts
                if p.get("sd", {}).get("location")]
        rootp = root.rstrip("/") + "/"
        if locs and not all(loc.startswith(rootp) for loc in locs):
            raise NotImplementedError(
                f"{uri}: partition locations outside the table root are "
                "not supported (values live only in the metastore); move "
                "partitions under the root's key=value layout")
    if not any(paths):
        raise ValueError(f"{uri}: table has no storage location")
    return {"kind": "files", "format": fmt, "paths": paths}
