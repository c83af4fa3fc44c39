"""Minimal in-process S3 wire-protocol server (stdlib only) so the
object-store path can be exercised END-TO-END against the REAL AWS SDK
client inside ``pyarrow.fs.S3FileSystem`` — no minio binary needed.

Implements exactly the operations the SDK issues for the table
lifecycle (observed by tracing a live client):

- ``HEAD /bucket/key``                  HeadObject
- ``GET /bucket/key`` (+ ``Range``)     GetObject (parquet footer reads
                                        are ranged)
- ``PUT /bucket/key``                   PutObject / CopyObject
                                        (``x-amz-copy-source``)
- ``DELETE /bucket/key``                DeleteObject
- ``GET /bucket?list-type=2...``        ListObjectsV2 (prefix,
                                        delimiter, max-keys,
                                        continuation-token)
- ``POST /bucket/key?uploads``          CreateMultipartUpload
- ``PUT /bucket/key?partNumber&uploadId``  UploadPart
- ``POST /bucket/key?uploadId``         CompleteMultipartUpload
- ``DELETE /bucket/key?uploadId``       AbortMultipartUpload
- ``POST /bucket?delete``               DeleteObjects (batch)
- ``PUT /bucket`` / ``HEAD /bucket``    CreateBucket / HeadBucket

Auth headers are accepted and ignored (the SDK signs; a test store has
nothing to protect). Objects live in memory. NOT for production — this
is protocol-conformance test infrastructure, the honest stand-in for
the reference's S3 benchmark path
(/root/reference/tools/conversion/decompression-speed-s3.cpp:37-110).
"""

from __future__ import annotations

import hashlib
import http.server
import threading
import time
import urllib.parse
import uuid
from email.utils import formatdate
from xml.sax.saxutils import escape


class _Store:
    def __init__(self):
        self.buckets: dict[str, dict[str, tuple[bytes, float]]] = {}
        self.uploads: dict[str, dict[int, bytes]] = {}
        self.upload_keys: dict[str, tuple[str, str]] = {}
        self.lock = threading.Lock()


def _etag(b: bytes) -> str:
    return '"%s"' % hashlib.md5(b).hexdigest()


def _iso(ts: float) -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%S.000Z", time.gmtime(ts))


class _Handler(http.server.BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    store: _Store = None  # set by serve()

    def log_message(self, fmt, *args):  # quiet
        pass

    # -- helpers -------------------------------------------------------
    def _split(self):
        u = urllib.parse.urlsplit(self.path)
        parts = u.path.lstrip("/").split("/", 1)
        bucket = parts[0]
        key = urllib.parse.unquote(parts[1]) if len(parts) > 1 else ""
        q = urllib.parse.parse_qs(u.query, keep_blank_values=True)
        return bucket, key, q

    def _reply(self, code: int, body: bytes = b"", headers=()):
        self.send_response(code)
        for k, v in headers:
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body:
            self.wfile.write(body)

    def _xml(self, code: int, body: str):
        self._reply(
            code,
            ('<?xml version="1.0" encoding="UTF-8"?>' + body).encode(),
            [("Content-Type", "application/xml")],
        )

    def _err(self, code: int, s3code: str):
        self._xml(
            code,
            f"<Error><Code>{s3code}</Code><Message>{s3code}</Message>"
            "</Error>",
        )

    def _body(self) -> bytes:
        n = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(n) if n else b""

    # -- verbs ---------------------------------------------------------
    def do_HEAD(self):
        bucket, key, _ = self._split()
        with self.store.lock:
            bk = self.store.buckets.get(bucket)
            ob = bk.get(key) if (bk is not None and key) else None
            bucket_ok = bk is not None
        if not key:
            return self._reply(200 if bucket_ok else 404)
        if ob is None:
            return self._reply(404)
        self._head_object(ob[0], ob[1])

    def _head_object(self, data: bytes, ts: float):
        # HEAD must advertise the object's size as Content-Length while
        # sending no body — hand-roll the response
        self.send_response(200)
        self.send_header("Content-Length", str(len(data)))
        self.send_header("ETag", _etag(data))
        self.send_header("Last-Modified", formatdate(ts, usegmt=True))
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("Accept-Ranges", "bytes")
        self.end_headers()

    def do_GET(self):
        bucket, key, q = self._split()
        with self.store.lock:
            bk = self.store.buckets.get(bucket)
            if bk is None:
                return self._err(404, "NoSuchBucket")
            if not key:
                return self._list_v2(bucket, bk, q)
            ob = bk.get(key)
        if ob is None:
            return self._err(404, "NoSuchKey")
        data, ts = ob
        rng = self.headers.get("Range")
        if rng and rng.startswith("bytes="):
            lo_s, hi_s = rng[6:].split("-", 1)
            if lo_s:
                lo = int(lo_s)
                hi = min(int(hi_s), len(data) - 1) if hi_s else len(data) - 1
            else:
                # suffix range bytes=-N: the LAST N bytes
                lo = max(0, len(data) - int(hi_s))
                hi = len(data) - 1
            part = data[lo: hi + 1]
            return self._reply(
                206,
                part,
                [
                    (
                        "Content-Range",
                        f"bytes {lo}-{hi}/{len(data)}",
                    ),
                    ("ETag", _etag(data)),
                    ("Last-Modified", formatdate(ts, usegmt=True)),
                    ("Accept-Ranges", "bytes"),
                ],
            )
        self._reply(
            200,
            data,
            [
                ("ETag", _etag(data)),
                ("Last-Modified", formatdate(ts, usegmt=True)),
                ("Accept-Ranges", "bytes"),
            ],
        )

    def _list_v2(self, bucket: str, bk: dict, q):
        prefix = q.get("prefix", [""])[0]
        delim = q.get("delimiter", [""])[0]
        max_keys = int(q.get("max-keys", ["1000"])[0])
        token = q.get("continuation-token", [""])[0]
        keys = sorted(k for k in bk if k.startswith(prefix))
        if token:
            keys = [k for k in keys if k > token]
        contents, prefixes = [], []
        seen = set()
        count = 0
        last = ""
        truncated = False
        for k in keys:
            if count >= max_keys:
                truncated = True
                break
            if delim:
                rest = k[len(prefix):]
                if delim in rest:
                    p = prefix + rest.split(delim, 1)[0] + delim
                    if p not in seen:
                        seen.add(p)
                        prefixes.append(p)
                        count += 1
                        last = k
                    continue
            data, ts = bk[k]
            contents.append((k, len(data), ts, _etag(data)))
            count += 1
            last = k
        xml = [
            "<ListBucketResult xmlns=\"http://s3.amazonaws.com/doc/"
            "2006-03-01/\">",
            f"<Name>{escape(bucket)}</Name>",
            f"<Prefix>{escape(prefix)}</Prefix>",
            f"<KeyCount>{count}</KeyCount>",
            f"<MaxKeys>{max_keys}</MaxKeys>",
            f"<IsTruncated>{'true' if truncated else 'false'}"
            "</IsTruncated>",
        ]
        if truncated:
            xml.append(
                f"<NextContinuationToken>{escape(last)}"
                "</NextContinuationToken>"
            )
        for k, size, ts, et in contents:
            xml.append(
                f"<Contents><Key>{escape(k)}</Key>"
                f"<LastModified>{_iso(ts)}</LastModified>"
                f"<ETag>{escape(et)}</ETag><Size>{size}</Size>"
                "<StorageClass>STANDARD</StorageClass></Contents>"
            )
        for p in prefixes:
            xml.append(
                f"<CommonPrefixes><Prefix>{escape(p)}</Prefix>"
                "</CommonPrefixes>"
            )
        xml.append("</ListBucketResult>")
        self._xml(200, "".join(xml))

    def do_PUT(self):
        bucket, key, q = self._split()
        body = self._body()
        with self.store.lock:
            if not key:  # CreateBucket
                self.store.buckets.setdefault(bucket, {})
                return self._reply(200)
            bk = self.store.buckets.setdefault(bucket, {})
            if "partNumber" in q and "uploadId" in q:
                uid = q["uploadId"][0]
                if uid not in self.store.uploads:
                    return self._err(404, "NoSuchUpload")
                self.store.uploads[uid][int(q["partNumber"][0])] = body
                return self._reply(200, b"", [("ETag", _etag(body))])
            src = self.headers.get("x-amz-copy-source")
            if src:
                sb, sk = urllib.parse.unquote(src).lstrip("/").split(
                    "/", 1
                )
                ob = self.store.buckets.get(sb, {}).get(sk)
                if ob is None:
                    return self._err(404, "NoSuchKey")
                bk[key] = (ob[0], time.time())
                return self._xml(
                    200,
                    "<CopyObjectResult>"
                    f"<ETag>{escape(_etag(ob[0]))}</ETag>"
                    f"<LastModified>{_iso(time.time())}</LastModified>"
                    "</CopyObjectResult>",
                )
            bk[key] = (body, time.time())
        self._reply(200, b"", [("ETag", _etag(body))])

    def do_POST(self):
        bucket, key, q = self._split()
        body = self._body()
        with self.store.lock:
            bk = self.store.buckets.setdefault(bucket, {})
            if not key and "delete" in q:  # DeleteObjects batch
                import re
                from xml.sax.saxutils import unescape as _unescape

                deleted = re.findall(
                    r"<Key>(.*?)</Key>", body.decode(), re.S
                )
                for k in deleted:
                    # keys arrive XML-escaped (&amp; etc.), nothing else
                    bk.pop(_unescape(k), None)
                xml = "".join(
                    f"<Deleted><Key>{k}</Key></Deleted>" for k in deleted
                )
                return self._xml(
                    200, f"<DeleteResult>{xml}</DeleteResult>"
                )
            if "uploads" in q:  # CreateMultipartUpload
                uid = uuid.uuid4().hex
                self.store.uploads[uid] = {}
                self.store.upload_keys[uid] = (bucket, key)
                return self._xml(
                    200,
                    "<InitiateMultipartUploadResult>"
                    f"<Bucket>{escape(bucket)}</Bucket>"
                    f"<Key>{escape(key)}</Key>"
                    f"<UploadId>{uid}</UploadId>"
                    "</InitiateMultipartUploadResult>",
                )
            if "uploadId" in q:  # CompleteMultipartUpload
                uid = q["uploadId"][0]
                parts = self.store.uploads.pop(uid, None)
                self.store.upload_keys.pop(uid, None)
                if parts is None:
                    return self._err(404, "NoSuchUpload")
                data = b"".join(
                    parts[i] for i in sorted(parts)
                )
                bk[key] = (data, time.time())
                return self._xml(
                    200,
                    "<CompleteMultipartUploadResult>"
                    f"<Bucket>{escape(bucket)}</Bucket>"
                    f"<Key>{escape(key)}</Key>"
                    f"<ETag>{escape(_etag(data))}</ETag>"
                    "</CompleteMultipartUploadResult>",
                )
        self._err(400, "BadRequest")

    def do_DELETE(self):
        bucket, key, q = self._split()
        with self.store.lock:
            if "uploadId" in q:  # AbortMultipartUpload
                self.store.uploads.pop(q["uploadId"][0], None)
                self.store.upload_keys.pop(q["uploadId"][0], None)
                return self._reply(204)
            bk = self.store.buckets.get(bucket)
            if bk is None:
                return self._reply(204)
            if not key:
                self.store.buckets.pop(bucket, None)
                return self._reply(204)
            bk.pop(key, None)
        self._reply(204)


class MiniS3:
    """Context manager: in-process S3 server on an ephemeral port."""

    def __init__(self, port: int = 0):
        self.store = _Store()
        handler = type("H", (_Handler,), {"store": self.store})
        self.server = http.server.ThreadingHTTPServer(
            ("127.0.0.1", port), handler
        )
        self.port = self.server.server_address[1]
        self.endpoint = f"127.0.0.1:{self.port}"
        self._thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self.server.shutdown()
        self.server.server_close()
        return False


if __name__ == "__main__":
    with MiniS3() as s3:
        print(f"mini-s3 listening on http://{s3.endpoint}")
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            pass
