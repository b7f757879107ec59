"""AWS Glue Data Catalog client (GetTable / GetPartitions).

The reference reaches Glue through Spark's Hive-compatible catalog adapter
(aws-glue-datacatalog-client); this is the native equivalent speaking the
Glue JSON 1.1 protocol directly: an ``X-Amz-Target: AWSGlue.<Op>`` POST with
a SigV4-signed body. Signing is implemented from the public spec (HMAC
chain over date/region/service/aws4_request) with stdlib hashlib/hmac — no
boto dependency in this image.

URI form (consumed by connectors/catalog.py):

    glue://<database>/<table>

Endpoint/credentials resolution order:
  * ``auron.catalog.glue.endpoint``  (e.g. ``https://glue.us-east-1.amazonaws.com``;
    an ``http://host:port`` value targets a local fake for tests)
  * ``auron.catalog.glue.region``    (default parsed from the endpoint,
    else ``us-east-1``)
  * access keys: ``auron.catalog.glue.access.key`` / ``...secret.key`` /
    ``...session.token``, falling back to the standard ``AWS_ACCESS_KEY_ID``
    / ``AWS_SECRET_ACCESS_KEY`` / ``AWS_SESSION_TOKEN`` environment.

Responses normalize to the same dict shape as connectors/hms.py tables
(location / input_format / parameters / partition_keys / cols), so
catalog.py treats HMS and Glue tables identically downstream.
"""

from __future__ import annotations

import datetime
import hashlib
import hmac
import json
import os
import urllib.request
from typing import Dict, List, Optional, Tuple
from urllib.parse import urlparse


def _conf(key: str, env: Optional[str] = None) -> Optional[str]:
    from auron_tpu import config
    v = config.conf.get(key)
    if v:
        return str(v)
    return os.environ.get(env) if env else None


def _sign_key(secret: str, date: str, region: str, service: str) -> bytes:
    k = hmac.new(("AWS4" + secret).encode(), date.encode(),
                 hashlib.sha256).digest()
    for part in (region, service, "aws4_request"):
        k = hmac.new(k, part.encode(), hashlib.sha256).digest()
    return k


def sigv4_headers(method: str, url: str, body: bytes, target: str,
                  region: str, access_key: str, secret_key: str,
                  session_token: Optional[str] = None,
                  now: Optional[datetime.datetime] = None) -> Dict[str, str]:
    """SigV4 headers for a Glue JSON-protocol request. Deterministic given
    ``now`` so tests can recompute and diff the signature byte-for-byte."""
    u = urlparse(url)
    host = u.netloc
    path = u.path or "/"
    now = now or datetime.datetime.now(datetime.timezone.utc)
    amzdate = now.strftime("%Y%m%dT%H%M%SZ")
    datestamp = now.strftime("%Y%m%d")
    payload_hash = hashlib.sha256(body).hexdigest()
    headers = {
        "content-type": "application/x-amz-json-1.1",
        "host": host,
        "x-amz-date": amzdate,
        "x-amz-target": target,
    }
    if session_token:
        headers["x-amz-security-token"] = session_token
    signed = ";".join(sorted(headers))
    canonical = "\n".join([
        method, path, "",
        "".join(f"{k}:{headers[k].strip()}\n" for k in sorted(headers)),
        signed, payload_hash,
    ])
    scope = f"{datestamp}/{region}/glue/aws4_request"
    to_sign = "\n".join([
        "AWS4-HMAC-SHA256", amzdate, scope,
        hashlib.sha256(canonical.encode()).hexdigest(),
    ])
    sig = hmac.new(_sign_key(secret_key, datestamp, region, "glue"),
                   to_sign.encode(), hashlib.sha256).hexdigest()
    headers["authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed}, Signature={sig}")
    return headers


def _endpoint_region() -> Tuple[str, str]:
    ep = _conf("auron.catalog.glue.endpoint")
    region = _conf("auron.catalog.glue.region", "AWS_REGION")
    if not ep:
        region = region or "us-east-1"
        ep = f"https://glue.{region}.amazonaws.com"
    if not region:
        host = urlparse(ep).hostname or ""
        bits = host.split(".")
        region = bits[1] if len(bits) > 2 and bits[0] == "glue" \
            else "us-east-1"
    return ep, region


def _call(op: str, payload: Dict, timeout: float = 30.0) -> Dict:
    ep, region = _endpoint_region()
    access = _conf("auron.catalog.glue.access.key", "AWS_ACCESS_KEY_ID")
    secret = _conf("auron.catalog.glue.secret.key", "AWS_SECRET_ACCESS_KEY")
    token = _conf("auron.catalog.glue.session.token", "AWS_SESSION_TOKEN")
    if not access or not secret:
        raise ValueError("Glue catalog needs credentials: set "
                         "auron.catalog.glue.access.key/secret.key or "
                         "AWS_ACCESS_KEY_ID/AWS_SECRET_ACCESS_KEY")
    body = json.dumps(payload).encode()
    headers = sigv4_headers("POST", ep + "/", body, f"AWSGlue.{op}",
                            region, access, secret, token)
    req = urllib.request.Request(ep + "/", data=body, headers=headers,
                                 method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.load(r)


def _shape_sd(sd: Dict) -> Dict:
    return {
        "location": sd.get("Location"),
        "input_format": sd.get("InputFormat"),
        "output_format": sd.get("OutputFormat"),
        "cols": [{"name": c.get("Name"), "type": c.get("Type")}
                 for c in sd.get("Columns", [])],
        "parameters": sd.get("Parameters", {}),
    }


def _shape_table(t: Dict) -> Dict:
    return {
        "table_name": t.get("Name"),
        "db_name": t.get("DatabaseName"),
        "table_type": t.get("TableType"),
        "sd": _shape_sd(t.get("StorageDescriptor", {})),
        "partition_keys": [{"name": c.get("Name"), "type": c.get("Type")}
                           for c in t.get("PartitionKeys", [])],
        "parameters": t.get("Parameters", {}),
    }


def split_uri(uri: str) -> Tuple[str, str]:
    if not uri.startswith("glue://"):
        raise ValueError(f"not a Glue uri: {uri!r}")
    parts = [p for p in uri[len("glue://"):].split("/") if p]
    if len(parts) != 2:
        raise ValueError(f"bad Glue uri {uri!r} (want glue://db/table)")
    return parts[0], parts[1]


def load_table(uri: str, timeout: float = 30.0) -> Dict:
    db, table = split_uri(uri)
    out = _call("GetTable", {"DatabaseName": db, "Name": table},
                timeout=timeout)
    return _shape_table(out["Table"])


def load_partitions(uri: str, timeout: float = 30.0) -> List[Dict]:
    db, table = split_uri(uri)
    parts: List[Dict] = []
    token = None
    while True:
        payload = {"DatabaseName": db, "TableName": table}
        if token:
            payload["NextToken"] = token
        out = _call("GetPartitions", payload, timeout=timeout)
        for p in out.get("Partitions", []):
            parts.append({"values": p.get("Values", []),
                          "sd": _shape_sd(p.get("StorageDescriptor", {})),
                          "parameters": p.get("Parameters", {})})
        token = out.get("NextToken")
        if not token:
            return parts
