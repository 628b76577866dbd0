"""Catalog connection profiles (SURVEY §2.1 S1-S4, S9).

The reference persists catalog configs to ``~/.hielo/config.json`` with a
unique-name constraint (config.rs:32-103) and masks credentials for
display (config.rs:107-124). Here a profile maps 1:1 onto Spark Iceberg
catalog-plugin confs: ``profile.spark_conf()`` emits the
``spark.sql.catalog.<name>.*`` entries for the session builder.

No Spark primitive is involved in storage — plain JSON — but the emitted
conf wiring is exactly how a REST/Glue catalog attaches to a session
(S1: type=rest + uri/warehouse/token; S2: GlueCatalog impl + region).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

SENSITIVE_KEYS = {"auth_token", "token", "secret", "password"}
MASK = "***HIDDEN***"


@dataclass
class CatalogProfile:
    name: str
    catalog_type: str  # 'rest' | 'glue'
    config: dict[str, str] = field(default_factory=dict)

    def spark_conf(self) -> dict[str, str]:
        """Session-builder confs for this catalog (S1/S2)."""
        base = f"spark.sql.catalog.{self.name}"
        conf = {base: "org.apache.iceberg.spark.SparkCatalog"}
        if self.catalog_type == "rest":
            conf[f"{base}.type"] = "rest"
            if "uri" in self.config:
                conf[f"{base}.uri"] = self.config["uri"]
            if "warehouse" in self.config:
                conf[f"{base}.warehouse"] = self.config["warehouse"]
            if "auth_token" in self.config:
                conf[f"{base}.token"] = self.config["auth_token"]
        elif self.catalog_type == "glue":
            conf[f"{base}.catalog-impl"] = "org.apache.iceberg.aws.glue.GlueCatalog"
            if "warehouse" in self.config:
                conf[f"{base}.warehouse"] = self.config["warehouse"]
            # region default mirrors catalog.rs:227-237 (us-east-1 fallback)
            conf[f"{base}.client.region"] = self.config.get("region", "us-east-1")
        else:
            raise ValueError(f"unknown catalog_type {self.catalog_type!r}")
        return conf

    def sanitized(self) -> dict:
        """S9 — credential masking for display (config.rs:107-124)."""
        return {
            "name": self.name,
            "catalog_type": self.catalog_type,
            "config": {
                k: (MASK if k in SENSITIVE_KEYS else v) for k, v in self.config.items()
            },
        }


class ProfileStore:
    """JSON-file profile store with the reference's unique-name constraint
    (duplicate-name guard: config.rs:57-69)."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.profiles: list[CatalogProfile] = []
        if self.path.exists():
            data = json.loads(self.path.read_text())
            self.profiles = [CatalogProfile(**p) for p in data.get("catalogs", [])]

    def _save(self) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.path.write_text(
            json.dumps(
                {"catalogs": [{"name": p.name, "catalog_type": p.catalog_type, "config": p.config} for p in self.profiles]},
                indent=2,
            )
        )

    def is_name_unique(self, name: str) -> bool:
        return all(p.name != name for p in self.profiles)

    def add(self, profile: CatalogProfile) -> None:
        if not self.is_name_unique(profile.name):
            raise ValueError(f"catalog named {profile.name!r} already exists")
        self.profiles.append(profile)
        self._save()

    def update(self, profile: CatalogProfile) -> None:
        """Replace-by-name (catalog.rs:133-136 connection replace)."""
        for i, p in enumerate(self.profiles):
            if p.name == profile.name:
                self.profiles[i] = profile
                self._save()
                return
        raise KeyError(profile.name)

    def delete(self, name: str) -> None:
        before = len(self.profiles)
        self.profiles = [p for p in self.profiles if p.name != name]
        if len(self.profiles) == before:
            raise KeyError(name)
        self._save()

    def get(self, name: str) -> CatalogProfile:
        for p in self.profiles:
            if p.name == name:
                return p
        raise KeyError(name)


def test_connection(spark, catalog_name: str) -> tuple[bool, int, str]:
    """S4 — connect + list namespaces, report count (catalog.rs:463-474)."""
    try:
        n = spark.sql(f"SHOW NAMESPACES IN {catalog_name}").count()
        return True, n, f"Connected: {n} namespaces"
    except Exception as e:  # pragma: no cover - needs a live catalog
        return False, 0, str(e)
