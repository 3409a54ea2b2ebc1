"""IPIP filter — GeoIP enrichment of an IP field.

Mirrors /root/reference/filter/ipip.go:84-135: look up ``src`` in a local
datx/ipdb database, write country_name/region_name/city_name/isp/… either
flat or under ``target``.

Spark realization: the lookup database is a per-executor resource opened
inside a vectorized pandas UDF (``mapInPandas`` pattern — the standard
MaxMind-on-Spark shape). The real datx/ipdb reader is NOT bundled in this
container, so the provider is pluggable:

- ``DeterministicFakeGeoProvider`` (default): hash-based, stable, for tests
  and the correctness oracle. Real Spark-side plumbing (Arrow batches, struct
  result column), fake data.
- ``DatxProvider``: stub that raises NotImplementedError until a datx reader
  dependency is provided.

At 100 TB scale this is a broadcast range-join in disguise; with a real DB the
provider opens the file once per worker (function attribute caching), not per
batch.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gohangout_spark.expr.paths import field_col
from gohangout_spark.operators.base import Filter, FilterBox

GEO_FIELDS = ["country_name", "region_name", "city_name", "isp", "latitude", "longitude"]

GEO_SCHEMA = T.StructType(
    [
        T.StructField("country_name", T.StringType()),
        T.StructField("region_name", T.StringType()),
        T.StructField("city_name", T.StringType()),
        T.StructField("isp", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
    ]
)

_FAKE_COUNTRIES = ["CN", "US", "DE", "JP", "BR"]
_FAKE_CITIES = ["beijing", "newyork", "berlin", "tokyo", "saopaulo"]


class DeterministicFakeGeoProvider:
    """Stable fake lookups: private ranges → local, else hash-bucketed."""

    def lookup_batch(self, ips: pd.Series) -> pd.DataFrame:
        def one(ip):
            if ip is None or not isinstance(ip, str) or ip.count(".") != 3:
                return (None, None, None, None, None, None)
            if ip.startswith(("10.", "192.168.", "127.")):
                return ("-", "-", "intranet", "-", 0.0, 0.0)
            h = int(hashlib.md5(ip.encode()).hexdigest()[:8], 16)
            i = h % len(_FAKE_COUNTRIES)
            return (
                _FAKE_COUNTRIES[i],
                f"region{h % 10}",
                _FAKE_CITIES[i],
                f"isp{h % 4}",
                round((h % 18000) / 100.0 - 90.0, 2),
                round((h % 36000) / 100.0 - 180.0, 2),
            )

        rows = [one(ip) for ip in ips]
        return pd.DataFrame(rows, columns=GEO_FIELDS)


class DatxProvider:  # pragma: no cover - requires external dependency
    def __init__(self, path: str):
        raise NotImplementedError(
            "datx/ipdb reader not bundled; plug a provider with "
            "lookup_batch(Series)->DataFrame (e.g. wrapping the public "
            "ipipdotnet datx format)"
        )


class IPIP(Filter):
    plan_level = True

    def __init__(
        self,
        src: str,
        target: str | None = None,
        provider=None,
        database: str | None = None,
        language: str | None = None,  # accepted for config parity (ipip.go)
        type: str | None = None,  # noqa: A002 - reference config key
        overwrite: bool = True,
    ):
        self.src = src
        self.target = target
        self.overwrite = overwrite
        if provider is None:
            provider = DatxProvider(database) if database else DeterministicFakeGeoProvider()
        self.provider = provider

    def apply_plan(self, df: DataFrame, box: FilterBox) -> DataFrame:
        """Lookup hit/miss maps to the reference's Filter() success bool
        (ipip.go:84-99 returns false on unrenderable src or failed Find) —
        the shared FilterBox stage reads the markers for failTag/add/remove."""
        from gohangout_spark.expr.conditions import compile_conditions

        provider = self.provider
        src_col = field_col(self.src, df).cast("string")
        cond = compile_conditions(box.ifs, df, box.ts_field)

        @F.pandas_udf(GEO_SCHEMA)
        def geo_lookup(ips: pd.Series) -> pd.DataFrame:
            return provider.lookup_batch(ips)

        out = df.withColumn("__geo", geo_lookup(src_col))
        found = src_col.isNotNull() & F.col("__geo.country_name").isNotNull()
        eff = F.coalesce(cond & found, F.lit(False))
        failed = F.coalesce(cond & ~found, F.lit(False))

        assigns = {}
        if self.target:
            assigns[self.target] = F.col("__geo")
        else:
            for fname in GEO_FIELDS:
                new = F.col("__geo").getItem(fname)
                if not self.overwrite and fname in df.columns:
                    new = F.coalesce(F.col(f"`{fname}`"), new)
                assigns[fname] = new
        out = FilterBox._project(
            out, assigns, {}, eff,
            extra={FilterBox._EFF: eff, FilterBox._FAILED: failed},
        )
        return out.drop("__geo")
