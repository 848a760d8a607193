"""In-process fake of the boto3 S3 client subset plan_spark.dataset.s3
uses, with REAL conditional-request semantics (If-None-Match: * create,
If-Match: <etag> replace/delete, 412 on a lost race) made atomic under a
lock — the moto-style test double the r10 verdict asked for (network is
unavailable here). Error objects carry the botocore ClientError shape
(e.response['Error']['Code']) without needing botocore installed."""

from __future__ import annotations

import datetime
import hashlib
import io
import threading


class StubClientError(Exception):
    def __init__(self, code: str, msg: str = ""):
        super().__init__(f"{code}: {msg}")
        self.response = {"Error": {"Code": code, "Message": msg}}


def _etag(data: bytes) -> str:
    return '"' + hashlib.md5(data).hexdigest() + '"'


class StubS3Client:
    """One flat key space per bucket: {bucket: {key: (bytes, mtime)}}."""

    def __init__(self):
        self._lock = threading.RLock()
        self._buckets: dict[str, dict[str, tuple[bytes, float]]] = {}
        self.calls: list[str] = []  # op trace for seam assertions

    def _bkt(self, bucket: str) -> dict[str, tuple[bytes, float]]:
        return self._buckets.setdefault(bucket, {})

    @staticmethod
    def _now() -> float:
        import time

        return time.time()

    # ------------------------------------------------------------- objects
    def put_object(self, Bucket, Key, Body=b"", IfNoneMatch=None, IfMatch=None):
        data = Body if isinstance(Body, bytes) else bytes(Body)
        with self._lock:
            self.calls.append(f"put:{Key}")
            b = self._bkt(Bucket)
            cur = b.get(Key)
            if IfNoneMatch is not None:
                if IfNoneMatch != "*":
                    raise StubClientError("InvalidArgument", "only * supported")
                if cur is not None:
                    raise StubClientError("PreconditionFailed", Key)
            if IfMatch is not None:
                if cur is None or _etag(cur[0]) != IfMatch:
                    raise StubClientError("PreconditionFailed", Key)
            b[Key] = (data, self._now())
            return {"ETag": _etag(data)}

    def get_object(self, Bucket, Key):
        with self._lock:
            self.calls.append(f"get:{Key}")
            cur = self._bkt(Bucket).get(Key)
            if cur is None:
                raise StubClientError("NoSuchKey", Key)
            return {
                "Body": io.BytesIO(cur[0]),
                "ETag": _etag(cur[0]),
                "LastModified": datetime.datetime.fromtimestamp(
                    cur[1], tz=datetime.timezone.utc
                ),
            }

    def head_object(self, Bucket, Key):
        with self._lock:
            cur = self._bkt(Bucket).get(Key)
            if cur is None:
                raise StubClientError("404", Key)
            return {
                "ContentLength": len(cur[0]),
                "ETag": _etag(cur[0]),
                "LastModified": datetime.datetime.fromtimestamp(
                    cur[1], tz=datetime.timezone.utc
                ),
            }

    def copy_object(self, Bucket, Key, CopySource):
        with self._lock:
            self.calls.append(f"copy:{CopySource['Key']}->{Key}")
            src = self._bkt(CopySource["Bucket"]).get(CopySource["Key"])
            if src is None:
                raise StubClientError("NoSuchKey", CopySource["Key"])
            self._bkt(Bucket)[Key] = (src[0], self._now())
            return {"CopyObjectResult": {"ETag": _etag(src[0])}}

    def delete_object(self, Bucket, Key, IfMatch=None):
        with self._lock:
            self.calls.append(f"del:{Key}")
            b = self._bkt(Bucket)
            cur = b.get(Key)
            if IfMatch is not None:
                if cur is None or _etag(cur[0]) != IfMatch:
                    raise StubClientError("PreconditionFailed", Key)
            b.pop(Key, None)  # S3 delete of a missing key succeeds
            return {}

    def delete_objects(self, Bucket, Delete):
        with self._lock:
            b = self._bkt(Bucket)
            for o in Delete["Objects"]:
                self.calls.append(f"del:{o['Key']}")
                b.pop(o["Key"], None)
            return {"Deleted": Delete["Objects"]}

    def list_objects_v2(
        self,
        Bucket,
        Prefix="",
        Delimiter=None,
        MaxKeys=1000,
        ContinuationToken=None,
    ):
        """Lexicographic listing with a KEY-CURSOR continuation token
        (real-S3 semantics): the token marks the last key covered, so a
        caller that deletes while paginating (delete_prefix) never skips
        survivors, and a delimiter group straddling a page boundary is
        never re-emitted (the cursor jumps past the whole group)."""
        with self._lock:
            keys = sorted(
                k
                for k in self._bkt(Bucket)
                if k.startswith(Prefix)
                and (ContinuationToken is None or k > ContinuationToken)
            )
        contents, prefixes = [], []
        emitted = 0
        i = 0
        last_covered = None
        while i < len(keys) and emitted < MaxKeys:
            k = keys[i]
            rest = k[len(Prefix):]
            if Delimiter and Delimiter in rest:
                p = Prefix + rest.split(Delimiter, 1)[0] + Delimiter
                prefixes.append({"Prefix": p})
                emitted += 1
                # skip the whole delimiter group; the token covers it all
                while i < len(keys) and keys[i].startswith(p):
                    i += 1
                last_covered = keys[i - 1]
                continue
            with self._lock:
                cur = self._bkt(Bucket).get(k)
            if cur is not None:
                contents.append(
                    {
                        "Key": k,
                        "Size": len(cur[0]),
                        "LastModified": datetime.datetime.fromtimestamp(
                            cur[1], tz=datetime.timezone.utc
                        ),
                    }
                )
                emitted += 1
            last_covered = k
            i += 1
        out = {"Contents": contents, "CommonPrefixes": prefixes}
        if i < len(keys):
            out["IsTruncated"] = True
            out["NextContinuationToken"] = last_covered
        else:
            out["IsTruncated"] = False
        return out
