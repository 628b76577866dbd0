"""User-facing facade — the hielo surface as one object (SURVEY §3 entry
points: table load, snapshot timeline + health dashboard, global search).

Everything returns DataFrames (lazy) except the dashboard assemblers,
which collect the handful of already-aggregated rows a UI would render —
the reference's §3.2 render path, with Spark doing the heavy lifting and
the driver only formatting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .analytics import health as H
from .catalog import browse
from .catalog.profiles import CatalogProfile, ProfileStore
from .metadata import schemas as SCH
from .metadata import snapshots as SNAP
from .session import configure


class Engine:
    def __init__(self, spark: SparkSession, profile_store_path: str | None = None):
        self.spark = configure(spark)
        self.profiles = ProfileStore(profile_store_path) if profile_store_path else None

    # -- catalog wiring (S1-S3) --------------------------------------------
    def register_catalog(self, profile: CatalogProfile) -> dict[str, str]:
        """Emit (and apply where dynamic) the Spark confs for a catalog
        profile. Static catalog confs need session restart to take effect;
        the returned dict is what a session builder should receive."""
        conf = profile.spark_conf()
        for k, v in conf.items():
            try:
                self.spark.conf.set(k, v)
            except Exception:
                pass  # static conf on a live session — builder-time only
        return conf

    # -- browse/search (§3.3) ----------------------------------------------
    def search(self, tree: DataFrame, q: str, limit: int = 10) -> DataFrame:
        return browse.search(tree, q, limit)

    def filter_tree(self, tree: DataFrame, q: str) -> DataFrame:
        return browse.filter_tree(tree, q)

    # -- snapshot plane (§3.2) ---------------------------------------------
    def timeline(self, snapshots: DataFrame, flt: SNAP.SnapshotFilter | None = None) -> DataFrame:
        return SNAP.timeline(snapshots, flt)

    def operation_counts(self, snapshots: DataFrame) -> DataFrame:
        return SNAP.operation_counts(snapshots)

    def health_metrics(self, snapshots: DataFrame, as_of: str) -> DataFrame:
        return H.health_metrics(snapshots, as_of)

    # -- schema plane -------------------------------------------------------
    def evolution_matrix(self, schemas_long: DataFrame, schema_ids: list[int]) -> DataFrame:
        return SCH.evolution_matrix(schemas_long, schema_ids)

    def partition_fields(self, specs: DataFrame, schema_fields: DataFrame) -> DataFrame:
        return SCH.partition_source_join(specs, schema_fields)

    # -- dashboard assembly (the only collects; inputs already aggregated) --
    def health_dashboard(self, snapshots: DataFrame, as_of: str, table_name: str) -> dict:
        """The §3.2 health report for one table: metrics + band + category
        sub-scores + alerts + recommendations, mirroring the reference's
        TableHealthMetrics composition (analytics.rs:35-61)."""
        import pyspark.sql.functions as F

        # persist the one-row metrics frame: category scores, alerts, and
        # recommendations all derive from it, and without the persist each
        # collect() would re-run the full snapshot aggregation
        m = H.health_metrics(snapshots, as_of).filter(F.col("table_name") == table_name)
        m = m.persist()
        try:
            metrics_rows = m.withColumn("band", H.health_band()).collect()
            if not metrics_rows:
                return {"table_name": table_name, "empty": True}
            metrics = metrics_rows[0].asDict()
            band = metrics.pop("band")  # single source: health.health_band()
            a = H.alerts(m)
            return {
                "table_name": table_name,
                "empty": False,
                "health_score": metrics["health_score"],
                "band": band,
                "metrics": metrics,
                "category_scores": H.category_scores(m).collect()[0].asDict(),
                "alerts": [r.asDict() for r in a.collect()],
                "recommendations": [r.asDict() for r in H.recommendations(a, m).collect()],
            }
        finally:
            m.unpersist()
