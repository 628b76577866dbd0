"""Table-metadata JSON → schemas_long parsing (v1/v2 layouts, nested
structs, decimal spacing) feeding the J2 evolution operators."""

from __future__ import annotations

import json

from hielo_spark.metadata.metadata_json import (
    parse_metadata_document,
    schemas_from_metadata_json,
)
from hielo_spark.metadata.schemas import evolution_matrix

V2_DOC = {
    "format-version": 2,
    "current-schema-id": 1,
    "schemas": [
        {
            "type": "struct",
            "schema-id": 0,
            "fields": [
                {"id": 1, "name": "id", "required": True, "type": "long"},
                {"id": 2, "name": "price", "required": False, "type": "decimal(10,2)"},
                {
                    "id": 3,
                    "name": "addr",
                    "required": False,
                    "type": {
                        "type": "struct",
                        "fields": [
                            {"id": 4, "name": "street", "required": False, "type": "string", "doc": "street line"}
                        ],
                    },
                },
            ],
        },
        {
            "type": "struct",
            "schema-id": 1,
            "fields": [
                {"id": 1, "name": "id", "required": True, "type": "long"},
                {"id": 2, "name": "price", "required": True, "type": "decimal(18,4)"},
                {"id": 5, "name": "tags", "required": False, "type": {"type": "list", "element-id": 6, "element": "string", "element-required": False}},
            ],
        },
    ],
}

V1_DOC = {
    "format-version": 1,
    "schema": {
        "type": "struct",
        "fields": [{"id": 1, "name": "x", "required": True, "type": "int"}],
    },
}


def test_parse_v2_document():
    rows = list(parse_metadata_document("t", V2_DOC))
    by_key = {(r[1], r[2]): r for r in rows}
    assert by_key[(0, 2)][4] == "decimal(10, 2)"  # reference spacing
    assert by_key[(1, 2)][4] == "decimal(18, 4)"
    assert by_key[(0, 3)][4] == "struct"
    assert by_key[(0, 4)][7] == 3  # nested child carries parent_field_id
    assert by_key[(0, 4)][6] == "street line"  # doc preserved
    assert by_key[(1, 5)][4] == "list"
    assert (1, 4) not in by_key  # struct child dropped in v1→v2 evolution


def test_parse_v1_document():
    rows = list(parse_metadata_document("t", V1_DOC))
    assert rows == [("t", 0, 1, "x", "int", True, None, None)]


def test_distributed_parse_feeds_evolution(spark, tmp_path):
    p = tmp_path / "v2.metadata.json"
    p.write_text(json.dumps(V2_DOC))
    long_df = schemas_from_metadata_json(spark, [("t", str(p))])
    m = {r["field_id"]: r.asDict() for r in evolution_matrix(long_df, [0, 1]).collect()}
    assert m[2]["s0_type"] == "decimal(10, 2)" and m[2]["s1_type"] == "decimal(18, 4)"
    assert m[2]["s0_required"] is False and m[2]["s1_required"] is True
    assert m[5]["s0_type"] is None and m[5]["s1_type"] == "list"
