"""Iceberg partition transforms (SURVEY §1.2: the hidden-partitioning
vocabulary `Identity / Bucket{n} / Truncate{w} / Year / Month / Day /
Hour` the reference displays at data.rs:125-148 and converts at
iceberg_adapter.rs:226-243) — executable for the no-jar commit plane:
``commit.append(partition_by=["days(ts)", "bucket(8, id)"])`` derives
the partition values at write time, records them in manifest entries,
and the read side prunes files from metadata alone while the SOURCE
column stays in the data files (that is what "hidden" means — queries
filter on ``ts``, never on a partition column).

Canonical value forms (stringified in manifests, human-readable like
Iceberg's own partition paths): years ``yyyy``, months ``yyyy-MM``,
days ``yyyy-MM-dd``, hours ``yyyy-MM-dd-HH``, truncate = the truncated
prefix/floored value, bucket = the bucket ordinal.

Bucket hashing is SPEC-EXACT murmur3_x86_32 (seed 0) over the Iceberg
byte forms — int/long/date/timestamp promote to 8-byte little-endian
long, strings hash their UTF-8 bytes — pinned in tests against the
published spec vectors (hash(34)=2017239379, hash("iceberg")=
1210000089). The long path is fully numpy-vectorized inside an Arrow
batch; strings take a per-value Python fallback (documented slow path).
"""

from __future__ import annotations

import re

import numpy as np
from pyspark.sql import Column
import pyspark.sql.functions as F

_SPEC_RE = re.compile(
    r"^\s*(years|months|days|hours)\s*\(\s*(\w+)\s*\)\s*$"
    r"|^\s*(bucket|truncate)\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)\s*$"
)


def murmur3_32_long(values) -> np.ndarray:
    """Vectorized murmur3_x86_32(seed=0) over the 8-byte little-endian
    form of int64 values — the Iceberg bucket hash for int, long, date
    (days), time/timestamp (micros). Returns int32 hashes."""
    v = np.asarray(values, dtype=np.int64).view(np.uint64)
    c1 = np.uint32(0xCC9E2D51)
    c2 = np.uint32(0x1B873593)
    h = np.zeros(len(v), dtype=np.uint32)  # seed 0

    with np.errstate(over="ignore"):
        for block in (
            (v & np.uint64(0xFFFFFFFF)).astype(np.uint32),  # low word first (LE)
            (v >> np.uint64(32)).astype(np.uint32),
        ):
            k = block * c1
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k = k * c2
            h ^= k
            h = (h << np.uint32(13)) | (h >> np.uint32(19))
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h ^= np.uint32(8)  # length
        h ^= h >> np.uint32(16)
        h = h * np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h = h * np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    return h.view(np.int32)


def murmur3_32_bytes(data: bytes) -> int:
    """Scalar murmur3_x86_32(seed=0) over arbitrary bytes (the Iceberg
    bucket hash for string/binary values)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    mask = 0xFFFFFFFF
    h = 0
    n4 = len(data) // 4 * 4
    for i in range(0, n4, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & mask
        k = ((k << 15) | (k >> 17)) & mask
        k = (k * c2) & mask
        h ^= k
        h = ((h << 13) | (h >> 19)) & mask
        h = (h * 5 + 0xE6546B64) & mask
    tail = data[n4:]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * c1) & mask
        k = ((k << 15) | (k >> 17)) & mask
        k = (k * c2) & mask
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & mask
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & mask
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


class PartitionTransform:
    """One parsed ``partition_by`` entry: ``spec`` (canonical string),
    ``source`` column, ``field`` (the partition field name recorded in
    manifests), ``kind``, and ``expr(dtype)`` — the Spark Column that
    derives the partition value from the source column."""

    def __init__(self, spec: str):
        self.spec = spec.strip()
        m = _SPEC_RE.match(self.spec)
        if m is None:
            if not re.match(r"^\s*\w+\s*$", self.spec):
                raise ValueError(
                    f"unsupported partition transform {spec!r} (supported: "
                    "identity column, years/months/days/hours(col), "
                    "bucket(n, col), truncate(w, col))"
                )
            self.kind, self.param, self.source = "identity", None, self.spec
            self.field = self.source
        elif m.group(1):
            self.kind, self.param, self.source = m.group(1), None, m.group(2)
            self.field = f"{self.source}_{self.kind.rstrip('s')}"
        else:
            self.kind, self.param, self.source = (
                m.group(3),
                int(m.group(4)),
                m.group(5),
            )
            if self.param <= 0:
                raise ValueError(f"{self.kind} width/count must be positive: {spec!r}")
            self.field = f"{self.source}_{self.kind}"

    _TIME_FMT = {
        "years": "yyyy",
        "months": "yyyy-MM",
        "days": "yyyy-MM-dd",
        "hours": "yyyy-MM-dd-HH",
    }

    @property
    def iceberg_name(self) -> str:
        """The transform's name in Iceberg metadata-JSON form (the
        vocabulary the reference parses at iceberg_adapter.rs:226-243):
        identity, year/month/day/hour, bucket[N], truncate[W]."""
        if self.kind == "identity":
            return "identity"
        if self.kind in self._TIME_FMT:
            return self.kind.rstrip("s")
        return f"{self.kind}[{self.param}]"

    def expr(self, dtype: str) -> Column:
        src = F.col(self.source)
        if self.kind == "identity":
            return src
        if self.kind in self._TIME_FMT:
            if not (dtype.startswith("timestamp") or dtype == "date"):
                raise ValueError(
                    f"{self.kind}() needs a date/timestamp column, "
                    f"{self.source} is {dtype}"
                )
            return F.date_format(src, self._TIME_FMT[self.kind])
        if self.kind == "truncate":
            if dtype == "string":
                return F.substring(src, 1, self.param)
            if dtype in ("tinyint", "smallint", "int", "bigint"):
                w = F.lit(self.param)
                return src - (((src % w) + w) % w)
            raise ValueError(
                f"truncate() supports string/integer columns, "
                f"{self.source} is {dtype}"
            )
        if self.kind == "bucket":
            return self._bucket_expr(src, dtype)
        raise AssertionError(self.kind)

    def _bucket_expr(self, src: Column, dtype: str) -> Column:
        n = self.param
        from pyspark.sql.functions import pandas_udf

        if dtype in ("tinyint", "smallint", "int", "bigint"):
            # spec: int promotes to long before hashing
            return self._bucket_long_of(src.cast("bigint"), n)
        if dtype == "date":
            # date → days from epoch → long path
            return self._bucket_long_of(
                F.datediff(src, F.to_date(F.lit("1970-01-01"))).cast("bigint"), n
            )
        if dtype.startswith("timestamp"):
            # timestamp → microseconds from epoch → long path
            return self._bucket_long_of(
                (F.unix_micros(src.cast("timestamp"))).cast("bigint"), n
            )
        if dtype == "string":

            @pandas_udf("int")
            def bucket_str(s):
                return s.map(
                    lambda x: None
                    if x is None
                    else (murmur3_32_bytes(x.encode("utf-8")) & 0x7FFFFFFF) % n
                ).astype("Int32")

            return bucket_str(src)
        raise ValueError(
            f"bucket() supports integer/date/timestamp/string columns, "
            f"{self.source} is {dtype}"
        )

    @staticmethod
    def _bucket_long_of(col: Column, n: int) -> Column:
        """Spec-exact murmur3 bucket over a LONG column via the numpy
        Arrow kernel. Exactness guard: nulls are COALESCED away before
        the UDF so the Arrow batch stays int64 end-to-end (a batch
        containing any null would otherwise arrive as float64 and round
        values above 2^53 to the wrong bucket); the null mask is
        re-applied outside. A pure-expression murmur3 was tried and
        reverted — its ~50-node tree blows up whole-stage codegen when
        inlined into partitioned-write sorts."""
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("int")
        def bucket_long(s):
            h = murmur3_32_long(s.to_numpy(dtype="int64", na_value=0))
            import pandas as pd

            return pd.Series(((h & 0x7FFFFFFF) % n).astype("int32"))

        return F.when(
            col.isNull(), F.lit(None).cast("int")
        ).otherwise(bucket_long(F.coalesce(col.cast("bigint"), F.lit(0))))

    @staticmethod
    def _as_datetime(literal):
        """Literal → naive-UTC datetime (the write side records the UTC
        instant under the enforced-UTC session, so aware literals
        convert and naive ones are taken as already-UTC)."""
        import datetime

        if isinstance(literal, str):
            literal = datetime.datetime.fromisoformat(literal)
        if isinstance(literal, datetime.datetime):
            if literal.tzinfo is not None:
                literal = literal.astimezone(datetime.timezone.utc).replace(
                    tzinfo=None
                )
            return literal
        if isinstance(literal, datetime.date):
            return datetime.datetime(literal.year, literal.month, literal.day)
        raise TypeError(f"not a date/timestamp literal: {literal!r}")

    def value_of(self, literal, dtype: str | None = None):
        """The partition value a source-column literal lands in — what
        turns a predicate on the SOURCE column into a
        ``partition_filter`` on the hidden partition field. Pass the
        source column's ``dtype`` to disambiguate string literals (an
        ISO string aimed at a timestamp bucket column must hash as
        epoch micros, not as UTF-8 bytes); without it, Python-type
        dispatch applies and strings hash as strings."""
        import datetime

        if self.kind == "identity":
            return literal
        if self.kind in self._TIME_FMT:
            fmt = {
                "years": "%Y",
                "months": "%Y-%m",
                "days": "%Y-%m-%d",
                "hours": "%Y-%m-%d-%H",
            }[self.kind]
            return self._as_datetime(literal).strftime(fmt)
        if self.kind == "truncate":
            if dtype is not None and dtype != "string":
                literal = int(literal)  # "42" aimed at an int column
            elif dtype == "string":
                literal = str(literal)
            if isinstance(literal, str):
                return literal[: self.param]
            return literal - (((literal % self.param) + self.param) % self.param)
        if self.kind == "bucket":
            if dtype is not None:
                if dtype.startswith("timestamp"):
                    literal = self._as_datetime(literal)
                elif dtype == "date":
                    if isinstance(literal, str):
                        literal = datetime.date.fromisoformat(literal)
                    elif isinstance(literal, datetime.datetime):
                        literal = literal.date()  # date column: hash DAYS
                elif dtype == "string":
                    literal = str(literal)
                else:
                    literal = int(literal)
            if isinstance(literal, str):
                h = murmur3_32_bytes(literal.encode("utf-8"))
            elif isinstance(literal, datetime.datetime):
                lit = self._as_datetime(literal)
                # exact integer micros — float total_seconds() rounds
                # off-by-one for microsecond-precision literals
                micros = (lit - datetime.datetime(1970, 1, 1)) // datetime.timedelta(
                    microseconds=1
                )
                h = int(murmur3_32_long([micros])[0])
            elif isinstance(literal, datetime.date):
                h = int(murmur3_32_long([(literal - datetime.date(1970, 1, 1)).days])[0])
            else:
                h = int(murmur3_32_long([int(literal)])[0])
            return (h & 0x7FFFFFFF) % self.param
        raise AssertionError(self.kind)


def parse_partition_by(specs: list[str]) -> list[PartitionTransform]:
    ts = [PartitionTransform(s) for s in specs]
    fields = [t.field for t in ts]
    if len(set(fields)) != len(fields):
        raise ValueError(f"duplicate partition field names: {fields}")
    return ts


def prune_filter_for(doc: dict, col: str, literal) -> dict[str, str]:
    """Build the ``partition_filter`` dict for an equality predicate on
    a SOURCE column from the table's recorded default spec — the
    hidden-partitioning UX: callers reason about ``col = literal``, the
    engine derives which partition field prunes it. Returns {} when no
    default-spec field derives from ``col`` (nothing prunable —
    callers just skip the filter)."""
    specs = doc.get("partition-specs") or []
    spec = next(
        (s for s in specs if s.get("spec-id") == doc.get("default-spec-id", 0)),
        None,
    )
    if not spec:
        return {}
    schema = next(
        (
            s
            for s in doc.get("schemas", [])
            if s.get("schema-id") == doc.get("current-schema-id", 0)
        ),
        None,
    )
    id2 = {f["id"]: (f["name"], f.get("type", "string")) for f in (schema or {}).get("fields", [])}
    out: dict[str, str] = {}
    for f in spec.get("fields", []):
        name, ftype = id2.get(f.get("source-id"), (None, None))
        if name != col:
            continue
        tr = f.get("transform", "identity")
        if tr == "identity":
            pt = PartitionTransform(col)
        elif tr in ("year", "month", "day", "hour"):
            pt = PartitionTransform(f"{tr}s({col})")
        else:
            m = re.match(r"^(bucket|truncate)\[(\d+)\]$", tr)
            if m is None:
                continue
            pt = PartitionTransform(f"{m.group(1)}({m.group(2)}, {col})")
        # map Iceberg schema type back to a SQL-ish dtype for value_of
        dtype = {
            "long": "bigint", "int": "int", "timestamp": "timestamp",
            "timestamptz": "timestamp", "date": "date", "string": "string",
        }.get(ftype, ftype)
        out[f.get("name", pt.field)] = str(pt.value_of(literal, dtype=dtype))
    return out
